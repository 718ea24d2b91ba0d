"""r12 chsql vocabulary batch #3: tolerant casts (to*OrNull/OrZero),
per-unit date arithmetic (addDays..subtractSeconds), N-minute floors,
dateName/monthName/toTime, exp2/exp10/intExp2/intExp10, max2/min2,
cryptographic digests (MD5/SHA*), the bit family (groupBitAnd/Or/Xor,
bitCount, bitTest), regression + mode aggregates
(simpleLinearRegression, anyHeavy, uniqTheta), array/map widening
(arrayWithConstant, arrayElement, hasSubstr, countSubstrings,
mapFromArrays/mapKeys/mapValues/mapContains), finiteness tests and
greatCircleDistance.

Each case pins the CH-semantic VALUE (hand-computed per the CH docs
or an independent stdlib implementation), not just "it parses":
strict OrNull parsing, unsigned range gates, the 1-based/negative
index rule, LSB-0 bitTest, non-overlapping substring counting and
the end-of-month addMonths clamp are exactly where a lazy mapping
silently diverges."""

from __future__ import annotations

import datetime
import hashlib
import math

import pytest

from yc_data_transfer_clickhouse_from_yandex_metrica_spark.plans import chsql


@pytest.fixture(scope="module")
def one(spark):
    """A 1-row scalar playground table."""
    return spark.createDataFrame([(1,)], "dummy int")


def _scalar(spark, one, expr):
    return chsql.run_sql(
        spark, f"SELECT {expr} AS v FROM t", {"t": one}
    ).collect()[0][0]


class TestTolerantCasts:
    @pytest.mark.parametrize(
        "expr, want",
        [
            ("toInt64OrNull('123')", 123),
            ("toInt64OrNull('12.5')", None),      # strict: no truncation
            ("toInt64OrNull('abc')", None),
            ("toInt32OrNull('2147483648')", None),  # range-checked
            ("toInt8OrNull('127')", 127),
            ("toInt8OrNull('128')", None),
            ("toUInt8OrNull('255')", 255),
            ("toUInt8OrNull('256')", None),        # CH range gate
            ("toUInt8OrNull('-1')", None),         # unsigned rejects <0
            ("toUInt32OrNull('4294967295')", 4294967295),
            ("toUInt32OrNull('4294967296')", None),
            ("toUInt64OrNull('-7')", None),
            ("toFloat64OrNull('1e3')", 1000.0),
            ("toFloat64OrNull('nope')", None),
            ("toInt64OrZero('88')", 88),
            ("toInt64OrZero('x')", 0),
            ("toUInt16OrZero('-3')", 0),
            ("toFloat32OrZero('bad')", 0.0),
        ],
    )
    def test_numeric(self, spark, one, expr, want):
        assert _scalar(spark, one, expr) == want

    def test_date_or_null(self, spark, one):
        assert _scalar(
            spark, one, "toDateOrNull('2024-03-05')"
        ) == datetime.date(2024, 3, 5)
        assert _scalar(spark, one, "toDateOrNull('2024-02-30')") is None
        assert _scalar(spark, one, "toDateOrZero('nope')") == datetime.date(
            1970, 1, 1
        )

    def test_datetime_or_zero_epoch_default(self, spark, one):
        got = _scalar(spark, one, "toDateTimeOrZero('not a time')")
        assert got == datetime.datetime(1970, 1, 1, 0, 0, 0)
        got = _scalar(
            spark, one, "toDateTimeOrNull('2024-03-05 11:22:33')"
        )
        assert got == datetime.datetime(2024, 3, 5, 11, 22, 33)

    def test_arity_refusal(self, spark, one):
        with pytest.raises(ValueError, match="argument"):
            chsql.run_sql(
                spark, "SELECT toInt64OrNull('1', '2') AS v FROM t",
                {"t": one},
            )


class TestDateArithmetic:
    def test_add_days_and_months_clamp(self, spark, one):
        # CH addMonths(2024-01-31, 1) clamps to 2024-02-29
        got = _scalar(spark, one, "addMonths(DATE'2024-01-31', 1)")
        assert got == datetime.datetime(2024, 2, 29, 0, 0)
        got = _scalar(spark, one, "addDays(DATE'2024-02-28', 2)")
        assert got == datetime.datetime(2024, 3, 1, 0, 0)

    def test_subtract_family_negates(self, spark, one):
        got = _scalar(
            spark, one,
            "subtractHours(TIMESTAMP'2024-01-01 01:30:00', 2)",
        )
        assert got == datetime.datetime(2023, 12, 31, 23, 30)
        got = _scalar(spark, one, "subtractWeeks(DATE'2024-01-15', 1)")
        assert got == datetime.datetime(2024, 1, 8, 0, 0)

    def test_column_valued_n(self, spark, one):
        got = _scalar(
            spark, one, "addYears(DATE'2020-02-29', dummy)"
        )  # dummy = 1; CH clamps the leap day
        assert got == datetime.datetime(2021, 2, 28, 0, 0)

    def test_minute_floors(self, spark, one):
        ts = "TIMESTAMP'2024-03-05 11:52:33'"
        assert _scalar(
            spark, one, f"toStartOfFiveMinutes({ts})"
        ) == datetime.datetime(2024, 3, 5, 11, 50)
        assert _scalar(
            spark, one, f"toStartOfTenMinutes({ts})"
        ) == datetime.datetime(2024, 3, 5, 11, 50)
        assert _scalar(
            spark, one, f"toStartOfFifteenMinutes({ts})"
        ) == datetime.datetime(2024, 3, 5, 11, 45)

    def test_to_time_pins_epoch_day(self, spark, one):
        got = _scalar(
            spark, one, "toTime(TIMESTAMP'2024-03-05 11:22:33')"
        )
        assert got == datetime.datetime(1970, 1, 2, 11, 22, 33)

    def test_date_name(self, spark, one):
        d = "DATE'2024-03-05'"
        assert _scalar(spark, one, f"dateName('year', {d})") == "2024"
        assert _scalar(spark, one, f"dateName('month', {d})") == "March"
        assert _scalar(spark, one, f"dateName('weekday', {d})") == "Tuesday"
        assert _scalar(spark, one, f"dateName('day', {d})") == "5"
        assert _scalar(spark, one, f"monthName({d})") == "March"
        with pytest.raises(ValueError, match="dateName part"):
            chsql.run_sql(
                spark, f"SELECT dateName('fortnight', {d}) AS v FROM t",
                {"t": one},
            )


class TestMath:
    def test_exp_families(self, spark, one):
        assert _scalar(spark, one, "exp2(10)") == 1024.0
        assert _scalar(spark, one, "exp10(3)") == 1000.0
        assert _scalar(spark, one, "intExp2(62)") == 2**62  # exact
        assert _scalar(spark, one, "intExp10(15)") == 10**15

    def test_max2_min2_are_float64(self, spark, one):
        df = chsql.run_sql(
            spark, "SELECT max2(1, 2.5) AS hi, min2(1, 2.5) AS lo FROM t",
            {"t": one},
        )
        assert df.schema["hi"].dataType.simpleString() == "double"
        assert tuple(df.collect()[0]) == (2.5, 1.0)


class TestDigests:
    def test_md5_sha_match_hashlib(self, spark, one):
        # hex(MD5(s)) is CH's canonical spelling; Spark hex() is
        # uppercase exactly like CH
        got = _scalar(spark, one, "hex(MD5('abc'))")
        assert got == hashlib.md5(b"abc").hexdigest().upper()
        got = _scalar(spark, one, "hex(SHA256('abc'))")
        assert got == hashlib.sha256(b"abc").hexdigest().upper()
        got = _scalar(spark, one, "hex(SHA1('abc'))")
        assert got == hashlib.sha1(b"abc").hexdigest().upper()
        got = _scalar(spark, one, "hex(SHA512('xyz'))")
        assert got == hashlib.sha512(b"xyz").hexdigest().upper()

    def test_digest_is_binary_not_hex_string(self, spark, one):
        df = chsql.run_sql(
            spark, "SELECT MD5('abc') AS d FROM t", {"t": one}
        )
        assert df.schema["d"].dataType.simpleString() == "binary"
        assert bytes(df.collect()[0][0]) == hashlib.md5(b"abc").digest()


class TestBitFamily:
    @pytest.fixture(scope="class")
    def bits(self, spark):
        return spark.createDataFrame(
            [(6,), (3,), (7,)], "x bigint"
        )

    def test_group_bit_aggregates(self, spark, bits):
        r = chsql.run_sql(
            spark,
            "SELECT groupBitAnd(x) AS a, groupBitOr(x) AS o, "
            "groupBitXor(x) AS p FROM t",
            {"t": bits},
        ).collect()[0]
        assert tuple(r) == (6 & 3 & 7, 6 | 3 | 7, 6 ^ 3 ^ 7)

    def test_bit_count_and_test(self, spark, one):
        assert _scalar(spark, one, "bitCount(7)") == 3
        # LSB is bit 0 (CH rule): 5 = 0b101
        assert _scalar(spark, one, "bitTest(5, 0)") == 1
        assert _scalar(spark, one, "bitTest(5, 1)") == 0
        assert _scalar(spark, one, "bitTest(5, 2)") == 1


class TestAggregates:
    def test_any_heavy_is_exact_mode(self, spark):
        df = spark.createDataFrame(
            [(1,), (2,), (2,), (2,), (3,)], "x int"
        )
        (got,) = chsql.run_sql(
            spark, "SELECT anyHeavy(x) AS h FROM t", {"t": df}
        ).collect()[0]
        assert got == 2

    def test_simple_linear_regression(self, spark):
        # y = 2x + 1 exactly
        df = spark.createDataFrame(
            [(1.0, 3.0), (2.0, 5.0), (3.0, 7.0)], "x double, y double"
        )
        (r,) = chsql.run_sql(
            spark,
            "SELECT simpleLinearRegression(x, y) AS f FROM t",
            {"t": df},
        ).collect()[0]
        assert r["k"] == pytest.approx(2.0)
        assert r["b"] == pytest.approx(1.0)

    def test_uniq_theta_small_set_exact(self, spark):
        df = spark.createDataFrame([(i % 5,) for i in range(50)], "x int")
        (got,) = chsql.run_sql(
            spark, "SELECT uniqTheta(x) AS u FROM t", {"t": df}
        ).collect()[0]
        assert got == 5  # sketch is exact at tiny cardinality


class TestArrayMap:
    def test_array_with_constant(self, spark, one):
        assert _scalar(spark, one, "arrayWithConstant(3, 'ab')") == [
            "ab", "ab", "ab"
        ]

    def test_array_element_index_rule(self, spark, one):
        arr = "array(10, 20, 30)"
        assert _scalar(spark, one, f"arrayElement({arr}, 1)") == 10
        assert _scalar(spark, one, f"arrayElement({arr}, -1)") == 30
        assert _scalar(spark, one, f"arrayElement({arr}, 0)") is None
        assert _scalar(spark, one, f"arrayElement({arr}, 9)") is None

    def test_array_element_on_map(self, spark, one):
        # CH arrayElement subscripts Maps too: a literal string key
        # must stay a lookup, not be coerced to an INT index
        m = "mapFromArrays(array('a', 'b'), array(10, 20))"
        assert _scalar(spark, one, f"arrayElement({m}, 'b')") == 20
        assert _scalar(spark, one, f"arrayElement({m}, 'z')") is None

    @pytest.mark.parametrize(
        "a, b, want",
        [
            ("array(1, 2, 3, 4)", "array(2, 3)", True),   # contiguous
            ("array(1, 2, 3, 4)", "array(2, 4)", False),  # gap
            ("array(1, 2, 3)", "array(3, 2)", False),     # order matters
            ("array(1, 2)", "array()", True),             # empty -> 1
            ("array(1, NULL, 3)", "array(NULL, 3)", True),  # null-safe
            ("array(1, 2)", "array(1, 2, 3)", False),     # b longer
        ],
    )
    def test_has_substr(self, spark, one, a, b, want):
        assert _scalar(spark, one, f"hasSubstr({a}, {b})") is want

    def test_count_substrings(self, spark, one):
        assert _scalar(
            spark, one, "countSubstrings('abcabc', 'bc')"
        ) == 2
        # non-overlapping: 'aaa' has ONE 'aa'
        assert _scalar(spark, one, "countSubstrings('aaa', 'aa')") == 1
        assert _scalar(spark, one, "countSubstrings('abc', '')") == 4
        assert _scalar(spark, one, "countSubstrings('abc', 'zz')") == 0

    def test_map_family(self, spark, one):
        m = "mapFromArrays(array('a', 'b'), array(1, 2))"
        assert _scalar(spark, one, f"mapKeys({m})") == ["a", "b"]
        assert _scalar(spark, one, f"mapValues({m})") == [1, 2]
        assert _scalar(spark, one, f"mapContains({m}, 'a')") is True
        assert _scalar(spark, one, f"mapContains({m}, 'z')") is False


class TestFiniteness:
    # NOTE: Spark float division by zero yields NULL where CH yields
    # inf/NaN -- the engine's standing NULL-over-NaN policy (see
    # functions/ch.avg_weighted); finiteness tests therefore build
    # the specials from explicit literals
    INF = "CAST('Infinity' AS DOUBLE)"

    def test_isnan_isinf(self, spark, one):
        assert _scalar(spark, one, "isNaN(sqrt(-1))") is True
        assert _scalar(spark, one, "isNaN(1.5)") is False
        assert _scalar(spark, one, f"isInfinite({self.INF})") is True
        assert _scalar(spark, one, f"isInfinite(-{self.INF})") is True
        assert _scalar(spark, one, "isInfinite(sqrt(-1))") is False
        assert _scalar(spark, one, "isInfinite(2.0)") is False

    def test_if_not_finite(self, spark, one):
        assert _scalar(
            spark, one, f"ifNotFinite({self.INF}, 42.0)"
        ) == 42.0
        assert _scalar(spark, one, "ifNotFinite(sqrt(-1), 42.0)") == 42.0
        assert _scalar(spark, one, "ifNotFinite(7.5, 42.0)") == 7.5


class TestGeo:
    def test_great_circle_matches_haversine(self, spark, one):
        # Moscow (37.62, 55.75) -> St Petersburg (30.31, 59.94)
        def hav(lon1, lat1, lon2, lat2):
            p = math.pi / 180
            a = (
                math.sin((lat2 - lat1) * p / 2) ** 2
                + math.cos(lat1 * p)
                * math.cos(lat2 * p)
                * math.sin((lon2 - lon1) * p / 2) ** 2
            )
            return 2 * 6_371_000.0 * math.asin(math.sqrt(a))

        got = _scalar(
            spark, one,
            "greatCircleDistance(37.62, 55.75, 30.31, 59.94)",
        )
        assert got == pytest.approx(hav(37.62, 55.75, 30.31, 59.94))
        assert 600_000 < got < 700_000  # ~634 km, sanity
        assert _scalar(
            spark, one, "greatCircleDistance(10.0, 20.0, 10.0, 20.0)"
        ) == 0.0


class TestToStartOfInterval:
    @pytest.mark.parametrize(
        "expr, want",
        [
            (
                "toStartOfInterval(TIMESTAMP'2024-03-05 11:52:33', INTERVAL 15 MINUTE)",
                datetime.datetime(2024, 3, 5, 11, 45),
            ),
            (
                "toStartOfInterval(TIMESTAMP'2024-03-05 11:52:33', INTERVAL 6 HOUR)",
                datetime.datetime(2024, 3, 5, 6, 0),
            ),
            (
                "toStartOfInterval(TIMESTAMP'2024-03-05 11:52:40', INTERVAL 30 SECOND)",
                datetime.datetime(2024, 3, 5, 11, 52, 30),
            ),
            # epoch-anchored 10-day grid: 1970-01-01 + k*10
            (
                "toStartOfInterval(DATE'1970-01-15', INTERVAL 10 DAY)",
                datetime.date(1970, 1, 11),
            ),
            (
                "toStartOfInterval(DATE'2024-03-05', INTERVAL 1 WEEK)",
                datetime.date(2024, 3, 4),  # Monday
            ),
            # epoch-anchored 2-month grid: Jan/Mar/May...
            (
                "toStartOfInterval(DATE'2024-04-15', INTERVAL 2 MONTH)",
                datetime.date(2024, 3, 1),
            ),
            (
                "toStartOfInterval(DATE'2024-05-15', INTERVAL 1 QUARTER)",
                datetime.date(2024, 4, 1),
            ),
            (
                "toStartOfInterval(DATE'2024-05-15', INTERVAL 1 YEAR)",
                datetime.date(2024, 1, 1),
            ),
        ],
    )
    def test_grids(self, spark, one, expr, want):
        assert _scalar(spark, one, expr) == want

    def test_refusals(self, spark, one):
        with pytest.raises(ValueError, match="divide the parent"):
            _scalar(
                spark, one,
                "toStartOfInterval(now(), INTERVAL 7 MINUTE)",
            )
        with pytest.raises(ValueError, match="1-week"):
            _scalar(
                spark, one,
                "toStartOfInterval(now(), INTERVAL 2 WEEK)",
            )
        with pytest.raises(ValueError, match="literal INTERVAL"):
            _scalar(spark, one, "toStartOfInterval(now(), dummy)")


class TestDateTime64AndLike:
    def test_now64_and_todatetime64(self, spark, one):
        got = _scalar(spark, one, "now64(3)")
        assert isinstance(got, datetime.datetime)
        got = _scalar(
            spark, one, "toDateTime64('2024-03-05 11:22:33.123456', 6)"
        )
        assert got == datetime.datetime(2024, 3, 5, 11, 22, 33, 123456)
        with pytest.raises(ValueError, match="literal digit"):
            _scalar(spark, one, "toDateTime64('2024-01-01', dummy)")

    def test_like_function_family(self, spark, one):
        assert _scalar(spark, one, "like('abc', 'a%')") is True
        assert _scalar(spark, one, "notLike('abc', 'a%')") is False
        assert _scalar(spark, one, "ilike('ABC', 'a%')") is True
        assert _scalar(spark, one, "notILike('ABC', 'z%')") is True
        assert _scalar(spark, one, "like(NULL, 'a%')") is None


class TestTimingQuantiles:
    @pytest.fixture(scope="class")
    def latencies(self, spark):
        return spark.createDataFrame(
            [(float(v),) for v in range(1, 101)], "ms double"
        )

    def test_quantile_timing_and_array_form(self, spark, latencies):
        r = chsql.run_sql(
            spark,
            "SELECT quantileTiming(0.5)(ms) AS med, "
            "quantilesTiming(0.25, 0.75)(ms) AS qs FROM t",
            {"t": latencies},
        ).collect()[0]
        assert 49.0 <= r.med <= 52.0
        assert len(r.qs) == 2 and r.qs[0] < r.qs[1]

    def test_quantile_deterministic_honors_contract(self, spark, latencies):
        # determinator pins CH's sample RNG; here the sketch is
        # deterministic by construction -- same result both calls
        got = [
            chsql.run_sql(
                spark,
                "SELECT quantileDeterministic(0.5)(ms, 42) AS m FROM t",
                {"t": latencies},
            ).collect()[0][0]
            for _ in range(2)
        ]
        assert got[0] == got[1] and 49.0 <= got[0] <= 52.0
        with pytest.raises(ValueError, match="determinator"):
            chsql.run_sql(
                spark,
                "SELECT quantileDeterministic(0.5)(ms) AS m FROM t",
                {"t": latencies},
            )

    def test_timing_weighted_keeps_pointer_refusal(self, spark, latencies):
        with pytest.raises(ValueError, match="no single-expression"):
            chsql.run_sql(
                spark,
                "SELECT quantileTimingWeighted(0.5)(ms, 2) AS m FROM t",
                {"t": latencies},
            )

    def test_uniq_combined64(self, spark, latencies):
        (got,) = chsql.run_sql(
            spark, "SELECT uniqCombined64(ms) AS u FROM t",
            {"t": latencies},
        ).collect()[0]
        assert 95 <= got <= 105  # 0.005-rsd sketch on 100 distinct


class TestAnsiPassthrough:
    """CH spellings that are ALSO valid Spark SQL must keep working
    through run_sql untouched -- pins the 'plain ANSI passes through'
    docstring claim for the spellings a CH user actually writes."""

    @pytest.fixture(scope="class")
    def t(self, spark):
        return spark.createDataFrame(
            [(1, "a", 2.0), (2, "b", 3.0)], "k int, s string, v double"
        )

    def test_star_except_columns(self, spark, t):
        df = chsql.run_sql(spark, "SELECT * EXCEPT (s) FROM t", {"t": t})
        assert df.columns == ["k", "v"]

    def test_group_by_all(self, spark, t):
        rows = chsql.run_sql(
            spark,
            "SELECT k, sum(v) AS sv FROM t GROUP BY ALL ORDER BY k",
            {"t": t},
        ).collect()
        assert [(r.k, r.sv) for r in rows] == [(1, 2.0), (2, 3.0)]

    def test_set_operators(self, spark, t):
        assert chsql.run_sql(
            spark,
            "SELECT k FROM t EXCEPT SELECT k FROM t WHERE k = 2",
            {"t": t},
        ).collect()[0][0] == 1
        assert chsql.run_sql(
            spark, "SELECT k FROM t INTERSECT SELECT k FROM t", {"t": t}
        ).count() == 2

    def test_is_null_function_forms(self, spark, t):
        r = chsql.run_sql(
            spark,
            "SELECT isNull(s) AS a, isNotNull(s) AS b FROM t WHERE k = 1",
            {"t": t},
        ).collect()[0]
        assert (r.a, r.b) == (False, True)

    def test_any_over_window_keeps_ignorenulls_rewrite(self, spark, t):
        # `any` rewrites to any_value(x, true) and stays window-legal
        rows = chsql.run_sql(
            spark,
            "SELECT k, any(v) OVER (ORDER BY k) AS w FROM t",
            {"t": t},
        ).collect()
        assert [(r.k, r.w) for r in rows] == [(1, 2.0), (2, 2.0)]

    def test_multi_column_count_distinct(self, spark, t):
        assert chsql.run_sql(
            spark, "SELECT count(DISTINCT k, s) AS c FROM t", {"t": t}
        ).collect()[0][0] == 2


class TestOrNullCombinators:
    def test_or_null_aggregates_null_on_empty_set(self, spark):
        df = spark.createDataFrame(
            [(1, 5.0), (1, None), (2, None)], "k int, v double"
        )
        rows = chsql.run_sql(
            spark,
            "SELECT k, sumOrNull(v) AS s, maxOrNull(v) AS m, "
            "avgOrNull(v) AS a, anyOrNull(v) AS any FROM t "
            "GROUP BY k ORDER BY k",
            {"t": df},
        ).collect()
        # k=2 is an all-NULL set -> NULL across the OrNull family
        assert [tuple(r) for r in rows] == [
            (1, 5.0, 5.0, 5.0, 5.0), (2, None, None, None, None)
        ]

    def test_sum_count_tuple(self, spark):
        df = spark.createDataFrame(
            [(5.0,), (3.0,), (None,)], "v double"
        )
        (r,) = chsql.run_sql(
            spark, "SELECT sumCount(v) AS sc FROM t", {"t": df}
        ).collect()[0]
        assert (r["sum"], r["count"]) == (8.0, 2)


def test_has_substr_null_operands_propagate(spark, one):
    # NULL operands propagate NULL (the legacy-sizeOfNull build would
    # otherwise hit a negative slice length at runtime)
    assert chsql.run_sql(
        spark,
        "SELECT hasSubstr(CAST(NULL AS ARRAY<INT>), array(1)) AS v FROM t",
        {"t": one},
    ).collect()[0][0] is None
    assert chsql.run_sql(
        spark,
        "SELECT hasSubstr(array(1), CAST(NULL AS ARRAY<INT>)) AS v FROM t",
        {"t": one},
    ).collect()[0][0] is None
