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
