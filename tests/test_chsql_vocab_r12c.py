"""r12 in-round vocab batch C: CH multi-array lambda forms
(``arrayMap/Filter/Exists/All/Count/First/Last((x, y) -> ..., a,
b)``) compiled onto ``zip_with`` with the CH equal-size contract
(unequal sizes RAISE per row; NULL arrays propagate NULL), plus the
join-strictness text closures found by the same probe: ``ALL
[LEFT|INNER] JOIN`` strips (CH's explicit default multiplicity ==
Spark's join), and ``PASTE JOIN`` refuses by name (Spark would parse
PASTE as the left alias and the bare JOIN as a condition-free inner
join — a silent cross product).
"""

from __future__ import annotations

import pytest

from yc_data_transfer_clickhouse_from_yandex_metrica_spark.plans import chsql


@pytest.fixture()
def arrs(spark):
    return spark.createDataFrame(
        [(1, [1, 2, 3], [10, 20, 30]), (2, [], []), (3, None, [1])],
        "k int, a array<int>, b array<int>",
    )


def _rows(spark, tables, sql):
    return {
        r[0]: tuple(r)[1:]
        for r in chsql.run_sql(spark, sql, tables).collect()
    }


def test_multi_array_lambda_family(spark, arrs, duck):
    """Values cross-checked against DuckDB's native list lambdas over
    the same rows (list_zip + list_transform/list_filter)."""
    q = (
        "SELECT k, arrayMap((x, y) -> x + y, a, b) AS m, "
        "arrayFilter((x, y) -> y > 15, a, b) AS f, "
        "arrayExists((x, y) -> y > 25, a, b) AS e, "
        "arrayAll((x, y) -> y >= 10, a, b) AS al, "
        "arrayCount((x, y) -> x + y > 20, a, b) AS c, "
        "arrayFirst((x, y) -> y > 15, a, b) AS fi, "
        "arrayLast((x, y) -> y < 25, a, b) AS la "
        "FROM t ORDER BY k"
    )
    got = _rows(spark, {"t": arrs}, q)
    assert got[1] == ([11, 22, 33], [2, 3], True, True, 2, 2, 2)
    assert got[2] == ([], [], False, True, 0, None, None)
    assert got[3] == (None, None, None, None, None, None, None)
    want = duck.sql(
        "SELECT list_transform(list_zip(a, b), z -> z[1] + z[2]) AS m, "
        "list_transform(list_filter(list_zip(a, b), z -> z[2] > 15), "
        "  z -> z[1]) AS f "
        "FROM (VALUES ([1, 2, 3]::INT[], [10, 20, 30]::INT[])) v(a, b)"
    ).fetchone()
    assert (got[1][0], got[1][1]) == (want[0], want[1])


def test_multi_array_lambda_unequal_sizes_raise(spark, arrs):
    """CH throws on unequal sizes; bare zip_with would silently
    NULL-pad — the compiled guard raises per row."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.base import PySparkException

    with pytest.raises((PySparkException, Py4JJavaError), match="equal size"):
        chsql.run_sql(
            spark,
            "SELECT arrayMap((x, y) -> x + y, [1, 2], [1]) AS m FROM t",
            {"t": arrs},
        ).collect()


def test_multi_array_guard_keeps_zip_outside_branch(spark, arrs):
    """The size guard's CASE chooses between CHEAP subtrees only (the
    array ref / raise_error); the zip_with must sit OUTSIDE the CASE
    as its argument — never under a data-dependent branch (the
    PLANS.md branch penalty)."""
    df = chsql.run_sql(
        spark,
        "SELECT k, arrayMap((x, y) -> x + y, a, b) AS m FROM t",
        {"t": arrs},
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "zip_with(CASE" in plan  # zip outside, guard as its input
    assert "THEN zip_with" not in plan and "ELSE zip_with" not in plan


def test_all_join_strictness_strips(spark):
    """CH `ALL [LEFT|INNER] JOIN` is the default multiplicity made
    explicit; without the strip Spark parses ALL as the left alias
    and name resolution breaks with an opaque error."""
    l = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, s string")
    r = spark.createDataFrame([(1, 10), (1, 20), (3, 30)], "k int, v int")
    out = chsql.run_sql(
        spark,
        "SELECT l.k AS k, r.v AS v FROM l ALL LEFT JOIN r ON l.k = r.k "
        "ORDER BY k, v",
        {"l": l, "r": r},
    ).collect()
    assert [(x["k"], x["v"]) for x in out] == [
        (1, 10), (1, 20), (2, None), (3, 30)
    ]
    out2 = chsql.run_sql(
        spark,
        "SELECT l.k AS k FROM l GLOBAL ALL INNER JOIN r ON l.k = r.k "
        "ORDER BY k",
        {"l": l, "r": r},
    ).collect()
    assert [x["k"] for x in out2] == [1, 1, 3]
    # the strip must NOT touch UNION ALL or the SELECT ALL quantifier
    out3 = chsql.run_sql(
        spark,
        "SELECT ALL left(s, 1) AS c FROM l UNION ALL SELECT s AS c FROM l "
        "ORDER BY c",
        {"l": l},
    )
    assert out3.count() == 6


def test_paste_join_refuses(spark):
    l = spark.createDataFrame([(1, "a")], "k int, s string")
    r = spark.createDataFrame([(1, 10)], "k int, v int")
    with pytest.raises(ValueError, match="PASTE JOIN.*cross product"):
        chsql.run_sql(spark, "SELECT * FROM l PASTE JOIN r", {"l": l, "r": r})


# ---------------------------------------------------------------------------
# aggregate combinators: groupArrayIf / -Array family / parametrized-If
# ---------------------------------------------------------------------------


def test_group_array_if_combinators(spark):
    t = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "b", None),
         (5, "a", 20)],
        "k int, g string, v int",
    )
    out = {
        r["g"]: (r["ga"], r["gua"])
        for r in chsql.run_sql(
            spark,
            "SELECT g, arraySort(groupArrayIf(v, v > 15)) AS ga, "
            "groupUniqArrayIf(v, v > 15) AS gua "
            "FROM t GROUP BY g ORDER BY g",
            {"t": t},
        ).collect()
    }
    assert out == {"a": ([20, 20], [20]), "b": ([30], [30])}


def test_array_combinator_family(spark, duck):
    """Element-level aggregates without explode: values cross-checked
    against DuckDB unnest over the same rows."""
    t = spark.createDataFrame(
        [(1, [1, 2]), (2, [3]), (3, None), (4, [2, None])],
        "k int, xs array<int>",
    )
    r = chsql.run_sql(
        spark,
        "SELECT minArray(xs) AS mn, maxArray(xs) AS mx, "
        "countArray(xs) AS c, avgArray(xs) AS av, "
        "arraySort(groupArrayArray(xs)) AS gaa, "
        "groupUniqArrayArray(xs) AS guaa, "
        "uniqArray(xs) AS u, uniqExactArray(xs) AS ue FROM t",
        {"t": t},
    ).collect()[0]
    want = duck.sql(
        "SELECT min(x) AS mn, max(x) AS mx, count(x) AS c, "
        "CAST(avg(x) AS DOUBLE) AS av FROM ("
        "  SELECT unnest(xs) AS x FROM (VALUES ([1, 2]), ([3]), "
        "  (NULL), ([2, NULL])) v(xs))"
    ).fetchone()
    assert (r["mn"], r["mx"], r["c"], r["av"]) == want == (1, 3, 4, 2.0)
    assert sorted(r["gaa"], key=repr) == sorted([1, 2, 3, 2, None], key=repr)
    assert r["u"] == r["ue"] == 4  # {1, 2, 3, NULL} -- NULL counts as in CH
    assert sorted(r["guaa"], key=repr) == sorted([1, 2, 3, None], key=repr)


def test_parametrized_if_refuses(spark):
    t = spark.createDataFrame([(1, 10)], "k int, v int")
    with pytest.raises(ValueError, match="-If combinator.*parametrized"):
        chsql.run_sql(
            spark,
            "SELECT quantileExactIf(0.5)(v, v > 5) AS q FROM t",
            {"t": t},
        )


# ---------------------------------------------------------------------------
# frame-offset windows / rotation / arrayReduce
# ---------------------------------------------------------------------------


def test_lag_lead_in_frame(spark):
    """Frameless lagInFrame == standard lag under CH's default frame
    (backward offsets always inside); Spark rejects explicit frames
    on lag/lead, so frame-bounded calls fail LOUDLY, never silently.
    leadInFrame maps to the forward offset of CH's extended-frame
    idiom (documented deviation: CH's frameless form is all-defaults,
    never what a query means)."""
    e = spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 30.0), (1, 3, 20.0), (2, 1, 5.0)],
        "u int, ts int, v double",
    )
    out = chsql.run_sql(
        spark,
        "SELECT u, ts, lagInFrame(v) OVER (PARTITION BY u ORDER BY ts) AS p, "
        "leadInFrame(v, 1, 0.0) OVER (PARTITION BY u ORDER BY ts) AS n "
        "FROM e ORDER BY u, ts",
        {"e": e},
    ).collect()
    assert [(r["p"], r["n"]) for r in out] == [
        (None, 30.0), (10.0, 20.0), (30.0, 0.0), (None, 0.0)
    ]
    from pyspark.errors.exceptions.base import PySparkException
    import pytest as _pt
    with _pt.raises(PySparkException, match="[Ww]indow frame"):
        chsql.run_sql(
            spark,
            "SELECT lagInFrame(v) OVER (PARTITION BY u ORDER BY ts "
            "ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS p FROM e",
            {"e": e},
        ).collect()


def test_row_number_in_all_blocks_refuses(spark):
    e = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(ValueError, match="block-read order"):
        chsql.run_sql(
            spark, "SELECT rowNumberInAllBlocks() AS r FROM e", {"e": e}
        )


def test_array_rotate(spark):
    t = spark.createDataFrame(
        [(1, [1, 2, 3, 4]), (2, []), (3, None)], "k int, a array<int>"
    )
    out = {
        r["k"]: (r["l1"], r["l5"], r["lm1"], r["r1"])
        for r in chsql.run_sql(
            spark,
            "SELECT k, arrayRotateLeft(a, 1) AS l1, "
            "arrayRotateLeft(a, 5) AS l5, "
            "arrayRotateLeft(a, -1) AS lm1, "
            "arrayRotateRight(a, 1) AS r1 FROM t",
            {"t": t},
        ).collect()
    }
    assert out[1] == (
        [2, 3, 4, 1], [2, 3, 4, 1], [4, 1, 2, 3], [4, 1, 2, 3]
    )
    assert out[2] == ([], [], [], [])
    assert out[3] == (None, None, None, None)


def test_array_reduce_literal_names(spark):
    t = spark.createDataFrame(
        [(1, [3, 1, None, 3])], "k int, a array<int>"
    )
    r = chsql.run_sql(
        spark,
        "SELECT arrayReduce('max', a) AS mx, arrayReduce('min', a) AS mn, "
        "arrayReduce('count', a) AS c, arrayReduce('avg', a) AS av, "
        "arrayReduce('uniqExact', a) AS u FROM t",
        {"t": t},
    ).collect()[0]
    assert (r["mx"], r["mn"], r["c"], r["av"]) == (3, 1, 3, 7.0 / 3)
    assert r["u"] == 3  # {3, 1, NULL}
    with pytest.raises(ValueError, match="arraySum"):
        chsql.run_sql(
            spark, "SELECT arrayReduce('sum', a) AS s FROM t", {"t": t}
        )
    with pytest.raises(ValueError, match="LITERAL aggregate name"):
        chsql.run_sql(
            spark, "SELECT arrayReduce(k, a) AS s FROM t", {"t": t}
        )


# ---------------------------------------------------------------------------
# date tail: makeDate / toWeek / toYearWeek
# ---------------------------------------------------------------------------


def test_make_date_forms(spark):
    t = spark.createDataFrame([(1,)], "k int")
    r = chsql.run_sql(
        spark,
        "SELECT makeDate(2023, 5, 7) AS d3, makeDate(2023, 42) AS d2, "
        "makeDateTime(2023, 1, 2, 3, 4, 5) AS ts FROM t",
        {"t": t},
    ).collect()[0]
    import datetime
    assert r["d3"] == datetime.date(2023, 5, 7)
    assert r["d2"] == datetime.date(2023, 2, 11)  # day-of-year 42
    assert r["ts"] == datetime.datetime(2023, 1, 2, 3, 4, 5)


def test_to_week_modes(spark, duck):
    """Mode 0 == MySQL/DuckDB WEEK semantics is hand-pinned on the
    boundary days; mode 3 == ISO weekofyear; other modes refuse."""
    t = spark.createDataFrame(
        [(1, "2023-01-01"), (2, "2024-01-01"), (3, "2024-01-07"),
         (4, "2023-12-31"), (5, "2023-11-05")],
        "k int, d string",
    )
    out = {
        r["k"]: (r["w0"], r["w3"])
        for r in chsql.run_sql(
            spark,
            "SELECT k, toWeek(toDate(d)) AS w0, toWeek(toDate(d), 3) AS w3 "
            "FROM t ORDER BY k",
            {"t": t},
        ).collect()
    }
    # 2023-01-01 is a Sunday -> week 1 starts Jan 1 (mode 0); ISO says
    # it belongs to 2022-W52
    assert out[1] == (1, 52)
    # 2024-01-01 is a Monday -> days before the first Sunday (Jan 7)
    # are week 0; ISO calls it week 1
    assert out[2] == (0, 1)
    assert out[3] == (1, 1)   # the first Sunday itself
    assert out[4] == (53, 52)  # 2023-12-31: Sunday, 53rd Sunday-week
    assert out[5] == (45, 44)
    with pytest.raises(ValueError, match="toWeek mode 5"):
        chsql.run_sql(
            spark, "SELECT toWeek(toDate(d), 5) AS w FROM t", {"t": t}
        )


def test_to_year_week_iso_only(spark):
    t = spark.createDataFrame([(1, "2023-01-01"), (2, "2024-01-01")],
                              "k int, d string")
    out = {
        r["k"]: r["yw"]
        for r in chsql.run_sql(
            spark,
            "SELECT k, toYearWeek(toDate(d), 3) AS yw FROM t ORDER BY k",
            {"t": t},
        ).collect()
    }
    assert out == {1: 202252, 2: 202401}
    with pytest.raises(ValueError, match="mode 3 .ISO. only"):
        chsql.run_sql(
            spark, "SELECT toYearWeek(toDate(d)) AS yw FROM t", {"t": t}
        )


# ---------------------------------------------------------------------------
# IP / string tail: toIPv4, CIDR range, toFixedString, char, tokens, ngrams
# ---------------------------------------------------------------------------


def test_ipv4_tail(spark):
    t = spark.createDataFrame([(1, "192.168.1.10")], "k int, ip string")
    r = chsql.run_sql(
        spark,
        "SELECT toIPv4(ip) AS n, "
        "IPv4CIDRToRange(toIPv4(ip), 16) AS r16, "
        "IPv4CIDRToRange(toIPv4(ip), 0) AS r0, "
        "IPv4CIDRToRange(toIPv4(ip), 32) AS r32, "
        "IPv4NumToString(IPv4CIDRToRange(toIPv4(ip), 16).min) AS lo, "
        "IPv4NumToString(IPv4CIDRToRange(toIPv4(ip), 16).max) AS hi "
        "FROM t",
        {"t": t},
    ).collect()[0]
    assert r["n"] == 3232235786
    assert tuple(r["r16"]) == (3232235520, 3232301055)
    # bits=0 is the whole space: BIGINT shift, no 32-bit wrap
    assert tuple(r["r0"]) == (0, 4294967295)
    assert tuple(r["r32"]) == (3232235786, 3232235786)
    assert (r["lo"], r["hi"]) == ("192.168.0.0", "192.168.255.255")


def test_to_fixed_string(spark):
    from pyspark.errors.exceptions.base import PySparkException

    t = spark.createDataFrame([(1, "ab")], "k int, s string")
    r = chsql.run_sql(
        spark, "SELECT toFixedString(s, 4) AS f FROM t", {"t": t}
    ).collect()[0]
    assert r["f"] == "ab\x00\x00"
    with pytest.raises(PySparkException, match="longer than the fixed"):
        chsql.run_sql(
            spark, "SELECT toFixedString(s, 1) AS f FROM t", {"t": t}
        ).collect()


def test_char_multibyte_tokens_ngrams(spark):
    t = spark.createDataFrame([(1, "Hello, world 42!")], "k int, s string")
    r = chsql.run_sql(
        spark,
        "SELECT char(72, 105) AS c2, char(33) AS c1, "
        "tokens(s) AS tok, ngrams('abcd', 2) AS ng, "
        "ngrams('ab', 3) AS ng_short FROM t",
        {"t": t},
    ).collect()[0]
    assert (r["c2"], r["c1"]) == ("Hi", "!")
    assert r["tok"] == ["Hello", "world", "42"]
    assert r["ng"] == ["ab", "bc", "cd"]
    assert r["ng_short"] == []


def test_bitmask_forms(spark):
    t = spark.createDataFrame([(1,)], "k int")
    r = chsql.run_sql(
        spark,
        "SELECT bitmaskToArray(10) AS a, bitmaskToList(10) AS l, "
        "bitmaskToArray(0) AS z, bitmaskToList(0) AS zl FROM t",
        {"t": t},
    ).collect()[0]
    assert r["a"] == [2, 8]
    assert r["l"] == "2,8"
    assert (r["z"], r["zl"]) == ([], "")


def test_cidr_and_ngrams_literal_guards(spark):
    """Literal arguments CH rejects refuse instead of wrapping: Spark
    shift counts wrap mod 64 (bits > 32 would give a garbage mask)
    and a size-0 ngram would emit empty-string grams."""
    t = spark.createDataFrame([(1, "10.0.0.1")], "k int, ip string")
    with pytest.raises(ValueError, match="outside 0..32"):
        chsql.run_sql(
            spark,
            "SELECT IPv4CIDRToRange(toIPv4(ip), 40) AS r FROM t",
            {"t": t},
        )
    with pytest.raises(ValueError, match="must be >= 1"):
        chsql.run_sql(spark, "SELECT ngrams(ip, 0) AS n FROM t", {"t": t})
