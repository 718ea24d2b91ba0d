"""Round-11 ADVICE items, fixed by the r12 chsql batch — formerly
strict xfails pinning the DESIRED behavior (the r11 deferral ledger);
the batch flipped them to live regression tests.

Why deferred (the window arithmetic, README "Driver verification
window"): every item is an edit to an existing plans/chsql.py def,
and any such edit flags all 11 r10-green chsql registry entries via
the def-granular rotation guard.  In round 11 those entries sit in
the stale TAIL — forcing them front would evict 10 r9-green entries
from the 50-slot window, exactly the two-round-staleness the r10
verdict's task 2 forbids (F <= 3).  In round 12 the same entries
rotate INTO the window naturally (they are then the oldest-green
cohort), so the fixes become rotation-free.  The r12 fix designs are
recorded alongside each test.
"""

from __future__ import annotations

import pytest

from yc_data_transfer_clickhouse_from_yandex_metrica_spark.plans import chsql


@pytest.fixture(scope="module")
def visits(spark):
    return spark.createDataFrame(
        [(1, 2, 3, 1, 1), (4, 5, 6, 1, 1)],
        "col long, CounterUserIDHash long, x long, VisitVersion int, Sign int",
    )


_META = {
    "visits": chsql.TableMeta(
        key=("col",),
        version="VisitVersion",
        sign="Sign",
        sample_by="CounterUserIDHash",
    )
}


def test_qualified_select_column_does_not_trip_mixed_refusal(spark, visits):
    out = chsql.run_sql(
        spark,
        "SELECT x, visits.col FROM visits FINAL",
        {"visits": visits},
        table_meta=_META,
    )
    assert out.count() == 2


def test_any_compiles_null_skipping():
    assert "any_value(x, true)" in chsql._rewrite_calls("SELECT any(x) FROM t")


def test_conflicting_decorations_refused(spark, visits):
    with pytest.raises(ValueError, match="FINAL/SAMPLE|decorat"):
        chsql.run_sql(
            spark,
            "SELECT count(1) AS n FROM visits SAMPLE 1/2 "
            "JOIN visits SAMPLE 1/4 ON 1 = 1",
            {"visits": visits},
            table_meta=_META,
        )


def test_sample_one_reads_all_rows(spark, visits):
    out = chsql.run_sql(
        spark,
        "SELECT count(1) AS n FROM visits SAMPLE 1",
        {"visits": visits},
        table_meta=_META,
    )
    assert out.collect()[0]["n"] == 2


def test_bracket_array_literal_compiles(spark, visits):
    out = chsql.run_sql(
        spark, "SELECT has([1, 2], 2) AS h FROM visits", {"visits": visits}
    )
    assert [r["h"] for r in out.collect()] == [True, True]


def test_hasall_null_element_matches(spark, visits):
    out = chsql.run_sql(
        spark,
        "SELECT hasAll(array(1, CAST(NULL AS BIGINT)), "
        "array(CAST(NULL AS BIGINT))) AS h FROM visits",
        {"visits": visits},
    )
    vals = [r["h"] for r in out.collect()]
    assert vals == [True, True]  # CH: NULL element present -> 1


# ---------------------------------------------------------------------------
# r11 self-found, fixed with the same batch: postfix (call-result)
# indexing and bare-literal classification
# ---------------------------------------------------------------------------


def test_select_adjacent_array_literal(spark, visits):
    """`SELECT [1,2]` — the literal classifier must check the
    IMMEDIATELY preceding char (the keyword before the whitespace is
    not an indexable expression)."""
    out = chsql.run_sql(
        spark, "SELECT [10, 20, 30] AS a FROM visits", {"visits": visits}
    )
    assert out.collect()[0]["a"] == [10, 20, 30]


def test_postfix_indexing_is_one_based(spark, visits):
    """CH element access on CALL results previously reached Spark as
    ZERO-based bracket access — a silent off-by-one."""
    t = spark.createDataFrame([("aXbXc",)], "s string")
    q = (
        "SELECT splitByChar('X', s)[1] AS first, "
        "splitByChar('X', s)[-1] AS last, "
        "splitByChar('X', s)[9] AS oob, "
        "splitByChar('X', s)[0] AS zero FROM t"
    )
    r = chsql.run_sql(spark, q, {"t": t}).collect()[0]
    assert (r["first"], r["last"], r["oob"], r["zero"]) == ("a", "c", "", "")


def test_literal_then_index_chain(spark, visits):
    out = chsql.run_sql(
        spark, "SELECT [[1, 2], [3]][2][1] AS v FROM visits",
        {"visits": visits},
    )
    assert [r["v"] for r in out.collect()] == [3, 3]


def test_range_family(spark, visits):
    """CH range: end-exclusive, empty on empty interval; indexing a
    range result goes through the postfix 1-based path with the
    numeric type default."""
    q = (
        "SELECT range(3) AS r1, range(2, 5) AS r2, range(5, 2) AS r3, "
        "range(0, 10, 3) AS r4, range(3)[2] AS second, "
        "range(3)[99] AS oob FROM visits"
    )
    r = chsql.run_sql(spark, q, {"visits": visits}).collect()[0]
    assert r["r1"] == [0, 1, 2]
    assert r["r2"] == [2, 3, 4]
    assert r["r3"] == []
    assert r["r4"] == [0, 3, 6, 9]
    assert (r["second"], r["oob"]) == (1, 0)


# ---------------------------------------------------------------------------
# r11 deferral, fixed in r12: inline_aliases matched an alias name
# INSIDE a qualified reference (`GROUP BY l.k` with a SELECT alias
# `k` became `l.(l.k)`, an opaque ParseException).  The plain-
# identifier scan now carries a dot/backtick lookaround --
# (?<![\w.`])name(?![\w`]) -- so qualified references and quoted
# names never match.  where_alias entered the r12 window naturally,
# making the edit rotation-free.
# ---------------------------------------------------------------------------


def test_qualified_group_by_with_same_named_alias(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b")], "k int, s string")
    right = spark.createDataFrame([(1, 10), (1, 20)], "k int, v int")
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.plans import chsql

    out = chsql.run_sql(
        spark,
        "SELECT l.k AS k, count(1) AS n FROM l ANY LEFT JOIN r "
        "ON l.k = r.k GROUP BY l.k ORDER BY k",
        {"l": left, "r": right},
    )
    assert [(x["k"], x["n"]) for x in out.collect()] == [(1, 1), (2, 1)]
