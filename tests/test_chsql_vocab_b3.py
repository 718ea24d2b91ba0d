"""r11 vocab batch 3: Metrica report bucketing (roundAge/
roundDuration/roundToExp2/roundDown), numeric trunc (a COLLISION --
Spark's trunc() is date truncation), parseDateTime/timeSlots,
argMaxIf/argMinIf, multiSearch, misc mappings.  Value pins per the
CH docs (timeSlots pins are the docs' own examples, including the
299-second custom-size one)."""

from __future__ import annotations

import pytest

from yc_data_transfer_clickhouse_from_yandex_metrica_spark.plans import chsql


@pytest.fixture(scope="module")
def tbl(spark):
    return spark.createDataFrame([(1,)], "k int")


def _one(spark, tbl, sql):
    return chsql.run_sql(spark, sql, {"t": tbl}).collect()[0]


def test_round_age_buckets(spark, tbl):
    got = _one(
        spark, tbl,
        "SELECT roundAge(0) AS a0, roundAge(5) AS a5, roundAge(17) AS a17, "
        "roundAge(18) AS a18, roundAge(24) AS a24, roundAge(25) AS a25, "
        "roundAge(44) AS a44, roundAge(54) AS a54, roundAge(100) AS a100 "
        "FROM t",
    )
    assert tuple(got) == (0, 17, 17, 18, 18, 25, 35, 45, 55)


def test_round_duration_buckets(spark, tbl):
    got = _one(
        spark, tbl,
        "SELECT roundDuration(0) AS d0, roundDuration(40) AS d40, "
        "roundDuration(65) AS d65, roundDuration(200) AS d200, "
        "roundDuration(99999) AS dbig FROM t",
    )
    assert tuple(got) == (0, 30, 60, 180, 36000)


def test_round_to_exp2(spark, tbl):
    got = _one(
        spark, tbl,
        "SELECT roundToExp2(0) AS r0, roundToExp2(1) AS r1, "
        "roundToExp2(3) AS r3, roundToExp2(31) AS r31, "
        "roundToExp2(1024) AS rk FROM t",
    )
    assert tuple(got) == (0, 1, 2, 16, 1024)


def test_round_down_to_provided_buckets(spark, tbl):
    got = _one(
        spark, tbl,
        "SELECT roundDown(2.5, [0.1, 0.5, 1.0]) AS a, "
        "roundDown(0.05, [0.1, 0.5, 1.0]) AS b, "
        "roundDown(0.7, [0.1, 0.5, 1.0]) AS c FROM t",
    )
    # Spark reads the bracket literals as DECIMAL; values are exact
    assert tuple(float(v) for v in got) == (1.0, 0.1, 0.5)


def test_trunc_is_numeric_not_date(spark, tbl):
    got = _one(
        spark, tbl,
        "SELECT trunc(2.7) AS t1, trunc(-2.7) AS t2, "
        "truncate(2.789, 2) AS t3, truncate(-2.789, 2) AS t4 FROM t",
    )
    assert tuple(got) == (2, -2, 2.78, -2.78)


def test_arg_max_min_if(spark):
    df = spark.createDataFrame(
        [("a", 1, True), ("b", 9, False), ("c", 5, True)],
        "u string, ts int, ok boolean",
    )
    got = chsql.run_sql(
        spark,
        "SELECT argMaxIf(u, ts, ok) AS mx, argMinIf(u, ts, ok) AS mn FROM t",
        {"t": df},
    ).collect()[0]
    assert (got["mx"], got["mn"]) == ("c", "a")  # 'b' excluded by cond


def test_parse_date_time_inverse_of_format(spark, tbl):
    got = _one(
        spark, tbl,
        "SELECT date_format(parseDateTime('2024-03-05 10:20:30', "
        "'%Y-%m-%d %H:%i:%S'), 'yyyy-MM-dd HH:mm:ss') AS d, "
        "parseDateTimeOrNull('garbage', '%Y-%m-%d') AS g FROM t",
    )
    assert got["d"] == "2024-03-05 10:20:30"
    assert got["g"] is None


def test_to_yyyymmddhhmmss_and_relative_nums(spark, tbl):
    got = _one(
        spark, tbl,
        "SELECT toYYYYMMDDhhmmss(CAST('2024-03-05 10:20:30' AS TIMESTAMP)) "
        "AS y, toRelativeDayNum(CAST('1970-01-03' AS DATE)) AS d, "
        "toRelativeHourNum(CAST('1970-01-01 03:30:00' AS TIMESTAMP)) AS h, "
        "toRelativeSecondNum(CAST('1970-01-01 00:01:40' AS TIMESTAMP)) AS s "
        "FROM t",
    )
    assert tuple(got) == (20240305102030, 2, 3, 100)


def test_time_slots_docs_examples(spark, tbl):
    # both pins are the CH docs' own examples
    got = _one(
        spark, tbl,
        "SELECT TRANSFORM(timeSlots(CAST('2012-01-01 12:20:00' AS "
        "TIMESTAMP), 600), __t -> date_format(__t, 'HH:mm:ss')) AS a, "
        "TRANSFORM(timeSlots(CAST('1980-12-12 21:01:02' AS TIMESTAMP), "
        "600, 299), __t -> date_format(__t, 'HH:mm:ss')) AS b FROM t",
    )
    assert got["a"] == ["12:00:00", "12:30:00"]
    assert got["b"] == ["20:56:13", "21:01:12", "21:06:11"]


def test_array_batch(spark):
    df = spark.createDataFrame([(1, [3, 1, 2])], "k int, a array<int>")
    got = chsql.run_sql(
        spark,
        "SELECT sort_array(arrayShuffle(a)) AS sh, "
        "arrayJaccardIndex([1, 2], [2, 3]) AS j, "
        "arrayCumSumNonNegative([1, 1, -4, 1]) AS nn FROM t",
        {"t": df},
    ).collect()[0]
    assert got["sh"] == [1, 2, 3]  # multiset preserved
    assert abs(got["j"] - 1.0 / 3.0) < 1e-12
    assert got["nn"] == [1, 2, 0, 1]  # CH docs example


def test_split_and_multisearch(spark, tbl):
    got = _one(
        spark, tbl,
        "SELECT splitByRegexp('\\\\d+', 'aaa1bbb22ccc') AS sp, "
        "multiSearchAllPositions('Hello, World!', "
        "['hello', '!', 'world']) AS ap, "
        "multiSearchFirstPosition('abcdef', ['cd', 'b']) AS fp FROM t",
    )
    assert got["sp"] == ["aaa", "bbb", "ccc"]
    assert got["ap"] == [0, 13, 0]  # CH docs example (case-sensitive)
    assert got["fp"] == 2


def test_misc_mappings(spark, tbl):
    got = _one(
        spark, tbl,
        "SELECT tryBase64Decode('aGk=') AS ok, tryBase64Decode('#bad#') "
        "AS bad, concatAssumeInjective('a', 'b', 'c') AS ci, "
        "widthBucket(10.15, 0, 20, 4) AS wb, identity(5) AS idn, "
        "ignore(k, 'x') AS ig, isIPv4String('192.168.0.1') AS ip1, "
        "isIPv4String('999.1.1.1') AS ip2, isIPv4String('abc') AS ip3 "
        "FROM t",
    )
    assert got["ok"] == "hi" and got["bad"] == ""
    assert got["ci"] == "abc" and got["wb"] == 3
    assert (got["idn"], got["ig"]) == (5, 0)
    assert (got["ip1"], got["ip2"], got["ip3"]) == (1, 0, 0)


def test_geo_distance_matches_great_circle(spark, tbl):
    got = _one(
        spark, tbl,
        "SELECT geoDistance(37.62, 55.75, 30.32, 59.95) AS g, "
        "greatCircleDistance(37.62, 55.75, 30.32, 59.95) AS gc FROM t",
    )
    assert got["g"] == got["gc"]  # same mean-sphere haversine
    assert 600_000 < got["g"] < 700_000  # Moscow–St.Petersburg ~634 km


@pytest.mark.parametrize("sql", [
    "SELECT sleep(1) FROM t",
    "SELECT sleepEachRow(0.1) FROM t",
    "SELECT parseDateTimeBestEffort('x') FROM t",
    "SELECT geohashEncode(1.0, 2.0) FROM t",
    "SELECT pointInPolygon((1, 2), [(0, 0), (1, 0), (1, 1)]) FROM t",
    "SELECT groupArraySample(3)(k) FROM t",
    "SELECT ngramDistance('a', 'b') FROM t",
])
def test_b3_refusals(spark, tbl, sql):
    with pytest.raises(ValueError, match="chsql:"):
        chsql.run_sql(spark, sql, {"t": tbl})


def test_time_slots_size_must_be_literal(spark, tbl):
    with pytest.raises(ValueError, match="integer literal"):
        chsql.run_sql(spark, "SELECT timeSlots(k, 60, k) FROM t", {"t": tbl})


# ---------------------------------------------------------------------------
# r11 polish: stable stats aliases, hex/bin byte-width padding,
# boundingRatio, arrayFold, refusal additions
# ---------------------------------------------------------------------------


def test_stable_aliases_and_overflow_sum(spark):
    df = spark.createDataFrame([(1.0,), (2.0,), (4.0,)], "x double")
    got = chsql.run_sql(
        spark,
        "SELECT stddevPop(x) AS s1, stddevPopStable(x) AS s2, "
        "varSamp(x) AS v1, varSampStable(x) AS v2, "
        "sumWithOverflow(x) AS so FROM t",
        {"t": df},
    ).collect()[0]
    assert got["s1"] == got["s2"] and got["v1"] == got["v2"]
    assert got["so"] == 7.0


def test_bounding_ratio_slope_between_extremes(spark):
    df = spark.createDataFrame(
        [(0.0, 10.0), (5.0, 999.0), (10.0, 30.0)], "x double, y double"
    )
    got = chsql.run_sql(
        spark, "SELECT boundingRatio(x, y) AS b FROM t", {"t": df}
    ).collect()[0]
    assert got["b"] == 2.0  # (30 - 10) / (10 - 0); middle point ignored


def test_hex_bin_pad_to_ch_byte_width(spark, tbl):
    got = _one(
        spark, tbl,
        "SELECT hex(1) AS h1, hex(255) AS h255, hex(256) AS h256, "
        "hex('ab') AS hs, bin(1) AS b1, bin(256) AS b256 FROM t",
    )
    # CH: hex(1)='01', hex(256)='0100', bin(1)='00000001'
    assert (got["h1"], got["h255"], got["h256"]) == ("01", "FF", "0100")
    assert got["hs"] == "6162"  # string hex identical in both engines
    assert got["b1"] == "00000001"
    assert got["b256"] == "0000000100000000"


def test_unhex_unbin_tolerate_ragged_input(spark, tbl):
    got = _one(
        spark, tbl,
        "SELECT unhex('F') AS u1, unhex('4142') AS u2, "
        "unbin('1000001') AS u3 FROM t",
    )
    assert got["u1"] == "\x0f"  # CH pads to '0F'
    assert got["u2"] == "AB"
    assert got["u3"] == "A"  # 0b01000001


def test_digests_still_binary_after_unhex_mapping(spark, tbl):
    import hashlib

    got = _one(spark, tbl, "SELECT hex(MD5('abc')) AS h FROM t")
    assert got["h"] == hashlib.md5(b"abc").hexdigest().upper()


def test_array_fold_and_partial_sort(spark):
    df = spark.createDataFrame([(1, [3, 1, 2])], "k int, a array<int>")
    got = chsql.run_sql(
        spark,
        "SELECT arrayFold((__acc, __x) -> __acc * 10 + __x, a, 0) AS f, "
        "arrayPartialSort(2, a) AS p FROM t",
        {"t": df},
    ).collect()[0]
    assert got["f"] == 312
    assert got["p"][:2] == [1, 2]  # first `limit` elements sorted


@pytest.mark.parametrize("sql", [
    "SELECT exponentialMovingAverage(5)(x, ts) FROM t",
    "SELECT sparkbar(9)(k, k) FROM t",
    "SELECT largestTriangleThreeBuckets(100)(k, k) FROM t",
    "SELECT studentTTest(k, k) FROM t",
    "SELECT welchTTest(k, k) FROM t",
    "SELECT mannWhitneyUTest(k, k) FROM t",
])
def test_b4_refusals(spark, tbl, sql):
    with pytest.raises(ValueError, match="chsql:"):
        chsql.run_sql(spark, sql, {"t": tbl})


def test_generate_uuid_v4(spark, tbl):
    import re as _re

    got = _one(spark, tbl, "SELECT generateUUIDv4() AS u FROM t")
    assert _re.fullmatch(
        r"[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}"
        r"-[0-9a-f]{12}",
        got["u"],
    )


@pytest.mark.parametrize("sql", [
    "SELECT extractAllGroupsHorizontal('a1b2', '([a-z])([0-9])') FROM t",
    "SELECT extractAllGroupsVertical('a1b2', '([a-z])([0-9])') FROM t",
    "SELECT toUUID('00000000-0000-0000-0000-000000000000') FROM t",
    "SELECT serverUUID() FROM t",
])
def test_b6_refusals(spark, tbl, sql):
    with pytest.raises(ValueError, match="chsql:"):
        chsql.run_sql(spark, sql, {"t": tbl})


@pytest.mark.parametrize("sql,frag", [
    ("SELECT h3ToGeo(k) FROM t", "H3/S2"),
    ("SELECT geoToH3(1.0, 2.0, 7) FROM t", "H3/S2"),
    ("SELECT s2CellsIntersect(k, k) FROM t", "H3/S2"),
    ("SELECT bitmapAnd(k, k) FROM t", "roaring-bitmap"),
    ("SELECT groupBitmap(k) FROM t", "roaring-bitmap"),
    ("SELECT encrypt('aes-128-ecb', 's', 'k') FROM t", "aes_encrypt"),
    ("SELECT stochasticLinearRegression(0.1)(k, k) FROM t", "Spark ML"),
])
def test_family_refusals(spark, tbl, sql, frag):
    with pytest.raises(ValueError, match="chsql:"):
        try:
            chsql.run_sql(spark, sql, {"t": tbl})
        except ValueError as e:
            assert frag in str(e)
            raise


def test_spark_native_snake_case_families_still_resolve(spark, tbl):
    # Spark's own aes_* and bitmap_* spellings must pass through
    got = _one(
        spark, tbl,
        "SELECT CAST(aes_decrypt(unbase64("
        "base64(aes_encrypt('hi', '1234567890abcdef'))), "
        "'1234567890abcdef') AS STRING) AS rt, "
        "bitmap_count(X'0102') AS bc FROM t",
    )
    assert got["rt"] == "hi"
    assert got["bc"] == 2
