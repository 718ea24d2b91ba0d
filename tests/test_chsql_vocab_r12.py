"""r12 chsql vocabulary widening: CH spellings that previously died
in Spark as UNRESOLVED_ROUTINE.  Each case pins the CH-semantic value
(hand-computed per the CH docs), not just "it parses": 1-based /
end-exclusive / NULL-skipping / Sunday-vs-Monday details are exactly
where a lazy mapping silently diverges.

Families: aggregate -If combinators, avgWeighted/median, the
statistical spellings (incl. the kurtPop excess-kurtosis +3 shim),
date widening (toStartOfDay/Week, dateAdd/dateSub, fromUnixTimestamp),
array widening (difference/cumsum/intersect/push/pop/first/last,
multiSearchAny, countEqual, the emptyArray* constructors), the
bitwise family, and string widening (lcase/ucase/concatWithSeparator,
base64, splitByString)."""

from __future__ import annotations

import datetime

import pytest

from yc_data_transfer_clickhouse_from_yandex_metrica_spark.plans import chsql


@pytest.fixture(scope="module")
def tbl(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, 2.0, "a"),
            (1, 20.0, 1.0, "b"),
            (2, 5.0, 0.0, "c"),
            (2, None, 3.0, "d"),
        ],
        "k int, v double, w double, s string",
    )


def _one(spark, tbl, sql):
    return tuple(chsql.run_sql(spark, sql, {"t": tbl}).collect()[0])


class TestAggCombinators:
    def test_min_max_if_skip_nonmatching(self, spark, tbl):
        rows = chsql.run_sql(
            spark,
            "SELECT k, minIf(v, w > 1) AS lo, maxIf(v, w > 1) AS hi "
            "FROM t GROUP BY k ORDER BY k",
            {"t": tbl},
        ).collect()
        # k=2: only the NULL-v row matches w>1 -> aggregate of nothing
        assert [tuple(r) for r in rows] == [(1, 10.0, 10.0), (2, None, None)]

    def test_any_if_skips_nulls(self, spark, tbl):
        # k=2 rows matching w >= 0: v in (5.0, NULL); anyIf must pick
        # the non-NULL value (CH aggregates skip NULLs)
        (got,) = _one(
            spark, tbl,
            "SELECT anyIf(v, w >= 0 AND k = 2) AS a FROM t",
        )
        assert got == 5.0

    def test_uniq_exact_if(self, spark, tbl):
        assert _one(
            spark, tbl, "SELECT uniqExactIf(k, w > 0) AS u FROM t"
        ) == (2,)

    def test_avg_weighted(self, spark, tbl):
        (got,) = _one(
            spark, tbl,
            "SELECT avgWeighted(v, w) AS aw FROM t WHERE k = 1",
        )
        assert got == pytest.approx((10.0 * 2 + 20.0 * 1) / 3.0)

    def test_avg_weighted_zero_weight_is_null_not_nan(self, spark, tbl):
        # documented deviation: CH yields NaN, this engine NULL
        (got,) = _one(
            spark, tbl,
            "SELECT avgWeighted(v, 0.0) AS aw FROM t WHERE k = 1",
        )
        assert got is None

    def test_median_and_stats_spellings(self, spark, tbl):
        got = _one(
            spark, tbl,
            "SELECT median(v) AS md, varPop(v) AS vp, varSamp(v) AS vs, "
            "stddevPop(v) AS sp, stddevSamp(v) AS ss, "
            "covarPop(v, w) AS cp, skewPop(v) AS sk, kurtPop(v) AS kp "
            "FROM t WHERE k = 1",
        )
        md, vp, vs, sp, ss, cp, sk, kp = got
        assert md == 10.0  # exact at n=2 (lower of the pair)
        assert vp == pytest.approx(25.0)
        assert vs == pytest.approx(50.0)
        assert sp == pytest.approx(5.0)
        assert ss == pytest.approx(50.0 ** 0.5)
        assert cp == pytest.approx(((10 - 15) * (2 - 1.5) + (20 - 15) * (1 - 1.5)) / 2)
        assert sk == pytest.approx(0.0)
        # CH kurtPop is RAW m4/m2^2 (=1.0 for two equidistant points);
        # Spark kurtosis is excess -- the +3 shim restores it
        assert kp == pytest.approx(1.0)


class TestDateWidening:
    def test_to_start_of_day(self, spark, tbl):
        (got,) = _one(
            spark, tbl,
            "SELECT toStartOfDay(CAST('2024-03-05 13:45:00' AS TIMESTAMP)) "
            "AS d FROM t LIMIT 1",
        )
        assert got == datetime.datetime(2024, 3, 5, 0, 0)

    def test_to_start_of_week_modes(self, spark, tbl):
        # 2024-03-06 is a Wednesday: mode 0 (CH default) -> Sunday
        # 03-03, mode 1 -> Monday 03-04
        got = _one(
            spark, tbl,
            "SELECT toStartOfWeek(DATE '2024-03-06') AS sun, "
            "toStartOfWeek(DATE '2024-03-06', 1) AS mon FROM t LIMIT 1",
        )
        assert got == (datetime.date(2024, 3, 3), datetime.date(2024, 3, 4))

    def test_to_start_of_week_bad_mode_refuses(self, spark, tbl):
        with pytest.raises(ValueError, match="toStartOfWeek mode"):
            chsql.run_sql(
                spark,
                "SELECT toStartOfWeek(DATE '2024-03-06', 9) AS d FROM t",
                {"t": tbl},
            )

    def test_date_add_sub_units(self, spark, tbl):
        got = _one(
            spark, tbl,
            "SELECT dateAdd(day, 3, DATE '2024-03-06') AS a, "
            "dateSub('month', 1, DATE '2024-03-06') AS b, "
            "dateAdd(hour, 2, CAST('2024-03-06 01:00:00' AS TIMESTAMP)) "
            "AS c FROM t LIMIT 1",
        )
        assert got == (
            datetime.datetime(2024, 3, 9, 0, 0),
            datetime.datetime(2024, 2, 6, 0, 0),
            datetime.datetime(2024, 3, 6, 3, 0),
        )

    def test_date_add_bad_unit_refuses(self, spark, tbl):
        with pytest.raises(ValueError, match="dateAdd/dateSub unit"):
            chsql.run_sql(
                spark,
                "SELECT dateAdd(fortnight, 1, DATE '2024-03-06') AS d FROM t",
                {"t": tbl},
            )

    def test_from_unix_timestamp(self, spark, tbl):
        (got,) = _one(
            spark, tbl, "SELECT fromUnixTimestamp(86400) AS d FROM t LIMIT 1"
        )
        assert got == datetime.datetime(1970, 1, 2, 0, 0)


class TestArrayWidening:
    def test_array_difference(self, spark, tbl):
        (got,) = _one(
            spark, tbl,
            "SELECT arrayDifference([1, 4, 9, 3]) AS a FROM t LIMIT 1",
        )
        assert got == [0, 3, 5, -6]

    def test_array_cum_sum(self, spark, tbl):
        (got,) = _one(
            spark, tbl, "SELECT arrayCumSum([1, 2, 3]) AS a FROM t LIMIT 1"
        )
        assert got == [1, 3, 6]

    def test_array_intersect_nary(self, spark, tbl):
        (got,) = _one(
            spark, tbl,
            "SELECT arrayIntersect([1,2,3], [2,3,4], [3,2]) AS a "
            "FROM t LIMIT 1",
        )
        assert sorted(got) == [2, 3]

    def test_push_pop(self, spark, tbl):
        got = _one(
            spark, tbl,
            "SELECT arrayPushBack([1,2], 3) AS pb, "
            "arrayPushFront([1,2], 0) AS pf, "
            "arrayPopBack([1,2,3]) AS ob, arrayPopFront([1,2,3]) AS of, "
            "arrayPopBack(emptyArrayInt64()) AS eb FROM t LIMIT 1",
        )
        assert got == ([1, 2, 3], [0, 1, 2], [1, 2], [2, 3], [])

    def test_multi_search_any(self, spark, tbl):
        got = _one(
            spark, tbl,
            "SELECT multiSearchAny('hello world', ['xy', 'wor']) AS hit, "
            "multiSearchAny('hello world', ['xy']) AS miss FROM t LIMIT 1",
        )
        assert got == (True, False)

    def test_count_equal_null_safe(self, spark, tbl):
        got = _one(
            spark, tbl,
            "SELECT countEqual([1, 2, 2, 3], 2) AS c, "
            "countEqual([1, CAST(NULL AS INT)], CAST(NULL AS INT)) AS n "
            "FROM t LIMIT 1",
        )
        assert got == (2, 1)  # CH counts NULL elements as equal to NULL

    def test_array_first_last(self, spark, tbl):
        got = _one(
            spark, tbl,
            "SELECT arrayFirst(x -> x > 1, [1, 2, 3]) AS f, "
            "arrayLast(x -> x > 1, [1, 2, 3]) AS l, "
            "arrayFirst(x -> x > 9, [1]) AS miss FROM t LIMIT 1",
        )
        # documented deviation: no-match is NULL (CH: type default)
        assert got == (2, 3, None)

    def test_empty_array_constructors_concat(self, spark, tbl):
        got = _one(
            spark, tbl,
            "SELECT arrayPushBack(emptyArrayString(), s) AS a, "
            "emptyArrayFloat64() AS f FROM t WHERE s = 'a'",
        )
        assert got == (["a"], [])


class TestBitwiseAndStrings:
    def test_bitwise(self, spark, tbl):
        got = _one(
            spark, tbl,
            "SELECT bitAnd(12, 10) AS a, bitOr(12, 10) AS o, "
            "bitXor(12, 10) AS x, bitNot(0) AS n, "
            "bitShiftLeft(1, 4) AS l, bitShiftRight(16, 3) AS r "
            "FROM t LIMIT 1",
        )
        assert got == (8, 14, 6, -1, 16, 2)

    def test_string_family(self, spark, tbl):
        got = _one(
            spark, tbl,
            "SELECT lcase('AbC') AS lo, ucase('AbC') AS up, "
            "concatWithSeparator('-', 'a', 'b', 'c') AS cw, "
            "base64Encode('hi') AS e, base64Decode('aGk=') AS d "
            "FROM t LIMIT 1",
        )
        assert got == ("abc", "ABC", "a-b-c", "aGk=", "hi")

    def test_split_by_string_literal_separator(self, spark, tbl):
        # \Q..\E quoting: a regex-metachar separator splits literally
        got = _one(
            spark, tbl,
            "SELECT splitByString('.*', 'a.*b.*c')[2] AS p, "
            "splitByString('::', 'a::b')[1] AS q FROM t LIMIT 1",
        )
        assert got == ("b", "a")


class TestArityRefusals:
    @pytest.mark.parametrize(
        "sql",
        [
            "SELECT minIf(v) AS x FROM t",
            "SELECT avgWeighted(v) AS x FROM t",
            "SELECT arrayCumSum([1], 2) AS x FROM t",
            "SELECT dateAdd(day, 1) AS x FROM t",
            "SELECT emptyArrayString(1) AS x FROM t",
            "SELECT bitAnd(1) AS x FROM t",
        ],
    )
    def test_wrong_arity_refuses(self, spark, tbl, sql):
        with pytest.raises(ValueError, match="chsql"):
            chsql.run_sql(spark, sql, {"t": tbl})


# ---------------------------------------------------------------------------
# vocab batch #2: URL SQL names, dateDiff/age, date/math/array/tuple/IPv4
# ---------------------------------------------------------------------------


_URL_BATTERY = [
    "https://www.shop.example.com:8443/cat/7/item?page=2&src=ad#frag",
    "http://example.com/path",
    "https://example.com",
    "ftp://user@files.example.org/pub?x=1",
    "notaurl",
    "",
    "https://[2001:db8::1]:8443/v6?q=z",
    "http://www.example.co.uk/a/b?x=1&y=2",
]

_URL_PAIRS = [
    ("protocol(u)", "url_protocol"),
    ("domain(u)", "url_domain"),
    ("domainWithoutWWW(u)", "domain_without_www"),
    ("topLevelDomain(u)", "url_top_level_domain"),
    ("path(u)", "url_path"),
    ("pathFull(u)", "path_full"),
    ("queryString(u)", "url_query_string"),
    ("fragment(u)", "url_fragment"),
    ("cutQueryString(u)", "cut_query_string"),
    ("cutFragment(u)", "cut_fragment"),
    ("cutWWW(u)", "cut_www"),
    ("port(u)", "url_port"),
]


class TestUrlSqlNames:
    def test_url_sql_matches_ch_functions(self, spark):
        """The SQL spellings mirror functions/ch.py's url_* wrappers
        (the oracle-proven forms, url_funcs entry) -- pin equality on
        a battery incl. no-port, IPv6-bracket, www, and junk URLs."""
        from yc_data_transfer_clickhouse_from_yandex_metrica_spark.functions import ch

        urls = spark.createDataFrame(
            [(i, u) for i, u in enumerate(_URL_BATTERY)], "i int, u string"
        )
        sql_sel = ", ".join(
            f"{expr} AS c{j}" for j, (expr, _fn) in enumerate(_URL_PAIRS)
        )
        got = chsql.run_sql(
            spark, f"SELECT i, {sql_sel} FROM t ORDER BY i", {"t": urls}
        ).collect()
        want = urls.select(
            "i",
            *[
                getattr(ch, fn)("u").alias(f"c{j}")
                for j, (_expr, fn) in enumerate(_URL_PAIRS)
            ],
        ).orderBy("i").collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in want]

    def test_extract_and_cut_url_parameter(self, spark):
        urls = spark.createDataFrame(
            [(1, "https://e.com/p?a=1&b=2&c=3")], "i int, u string"
        )
        (a, b, cut) = tuple(
            chsql.run_sql(
                spark,
                "SELECT extractURLParameter(u, 'b') AS b, "
                "extractURLParameter(u, 'z') AS z, "
                "cutURLParameter(u, 'b') AS cut FROM t",
                {"t": urls},
            ).collect()[0]
        )
        assert (a, b, cut) == ("2", "", "https://e.com/p?a=1&c=3")

    def test_cut_url_parameter_needs_literal(self, spark, tbl):
        with pytest.raises(ValueError, match="literal"):
            chsql.run_sql(
                spark, "SELECT cutURLParameter(s, s) AS x FROM t", {"t": tbl}
            )


class TestDateDiffAge:
    @pytest.fixture(scope="class")
    def ts(self, spark):
        return spark.createDataFrame(
            [
                (
                    datetime.datetime(2021, 12, 31, 23, 59, 30),
                    datetime.datetime(2022, 1, 1, 0, 0, 10),
                )
            ],
            "s timestamp, e timestamp",
        )

    def test_datediff_counts_boundary_crossings(self, spark, ts):
        row = chsql.run_sql(
            spark,
            "SELECT dateDiff('day', s, e) AS d, dateDiff('month', s, e) AS m,"
            " dateDiff('year', s, e) AS y, dateDiff('minute', s, e) AS mi,"
            " dateDiff('second', s, e) AS sec FROM t",
            {"t": ts},
        ).collect()[0]
        # 40 seconds of wall time, but every boundary is crossed
        assert tuple(row) == (1, 1, 1, 1, 40)

    def test_age_counts_complete_units(self, spark, ts):
        row = chsql.run_sql(
            spark,
            "SELECT age('day', s, e) AS d, age('month', s, e) AS m, "
            "age('minute', s, e) AS mi FROM t",
            {"t": ts},
        ).collect()[0]
        assert tuple(row) == (0, 0, 0)

    def test_bad_unit_refuses(self, spark, ts):
        with pytest.raises(ValueError, match="unit"):
            chsql.run_sql(
                spark, "SELECT dateDiff('fortnight', s, e) AS d FROM t",
                {"t": ts},
            )


class TestVocabBatch2Scalars:
    def test_date_scalars(self, spark):
        d = spark.createDataFrame(
            [(datetime.datetime(2024, 3, 7, 14, 47, 31),)], "d timestamp"
        )
        row = chsql.run_sql(
            spark,
            "SELECT toYYYYMMDD(d) AS ymd, toStartOfHour(d) AS h, "
            "toStartOfMinute(d) AS m, timeSlot(d) AS slot FROM t",
            {"t": d},
        ).collect()[0]
        assert row["ymd"] == 20240307
        assert row["h"] == datetime.datetime(2024, 3, 7, 14, 0, 0)
        assert row["m"] == datetime.datetime(2024, 3, 7, 14, 47, 0)
        assert row["slot"] == datetime.datetime(2024, 3, 7, 14, 30, 0)

    def test_round_bankers_half_even(self, spark, tbl):
        (a, b, c) = _one(
            spark, tbl,
            "SELECT roundBankers(2.5) AS a, roundBankers(3.5) AS b, "
            "roundBankers(2.345, 2) AS c FROM t LIMIT 1",
        )
        assert (a, b) == (2.0, 4.0)
        assert abs(float(c) - 2.34) < 1e-9

    def test_array_product_alpha_tokens_resize(self, spark, tbl):
        row = chsql.run_sql(
            spark,
            "SELECT arrayProduct([2, 3, 4]) AS p, "
            "alphaTokens('ab12cd,ef') AS tk, "
            "arrayResize([1, 2, 3], 5, 0) AS up, "
            "arrayResize([1, 2, 3], 2, 0) AS down FROM t LIMIT 1",
            {"t": tbl},
        ).collect()[0]
        assert row["p"] == 24.0
        assert row["tk"] == ["ab", "cd", "ef"]
        assert row["up"] == [1, 2, 3, 0, 0]
        assert row["down"] == [1, 2]

    def test_array_resize_two_arg_refuses(self, spark, tbl):
        with pytest.raises(ValueError, match="extender"):
            chsql.run_sql(
                spark, "SELECT arrayResize([1], 3) AS r FROM t", {"t": tbl}
            )

    def test_tuple_and_tuple_element(self, spark, tbl):
        (one, two) = _one(
            spark, tbl,
            "SELECT tupleElement(tuple(41, 'x'), 1) AS a, "
            "tupleElement(tuple(41, 'x'), 2) AS b FROM t LIMIT 1",
        )
        assert (one, two) == (41, "x")

    def test_tuple_element_needs_literal_index(self, spark, tbl):
        with pytest.raises(ValueError, match="literal"):
            chsql.run_sql(
                spark,
                "SELECT tupleElement(tuple(1), k) AS a FROM t",
                {"t": tbl},
            )

    def test_ipv4_roundtrip_and_malformed(self, spark):
        ips = spark.createDataFrame(
            [
                (1, "1.2.3.4"), (2, "255.255.255.255"), (3, "0.0.0.0"),
                (4, "999.1.1.1"), (5, "1.2.3"), (6, "junk"),
            ],
            "i int, s string",
        )
        rows = chsql.run_sql(
            spark,
            "SELECT i, IPv4StringToNum(s) AS n, "
            "IPv4NumToString(IPv4StringToNum(s)) AS back FROM t ORDER BY i",
            {"t": ips},
        ).collect()
        by_i = {r["i"]: (r["n"], r["back"]) for r in rows}
        assert by_i[1] == (16909060, "1.2.3.4")
        assert by_i[2] == (4294967295, "255.255.255.255")
        assert by_i[3] == (0, "0.0.0.0")
        # out-of-range / short / junk -> NULL (CH throws; NULL is the
        # documented pipeline-safe deviation)
        assert by_i[4][0] is None and by_i[5][0] is None and by_i[6][0] is None
