"""Round-11 ADVICE items, DEFERRED to round 12 by design — each pinned
here as a strict xfail asserting the DESIRED behavior, so the r12 fix
flips the marker off and nothing regresses silently in between.

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


@pytest.mark.xfail(
    strict=True,
    reason="ADVICE r11 #1 (deferred to r12): the decoration-scan "
    "comma alternative matches qualified SELECT-list references "
    "(', visits.col') as bare table references, raising a spurious "
    "mixed-reference refusal.  Fix: add (?!\\s*\\.) after the name "
    "group in _scan_table_decorations' pattern.",
)
def test_qualified_select_column_does_not_trip_mixed_refusal(spark, visits):
    out = chsql.run_sql(
        spark,
        "SELECT x, visits.col FROM visits FINAL",
        {"visits": visits},
        table_meta=_META,
    )
    assert out.count() == 2


@pytest.mark.xfail(
    strict=True,
    reason="ADVICE r11 #2 (deferred to r12): any/anyLast must compile "
    "to any_value(x, true) — CH aggregates skip NULLs (any returns "
    "the first NON-NULL value), Spark's any_value without ignoreNulls "
    "may return NULL even when non-NULL values exist.  Fix: emit the "
    "two-arg ignoreNulls form in _CALL_REWRITES.",
)
def test_any_compiles_null_skipping():
    assert "any_value(x, true)" in chsql._rewrite_calls("SELECT any(x) FROM t")


@pytest.mark.xfail(
    strict=True,
    reason="ADVICE r11 #3 (deferred to r12): two decorated references "
    "to one table with CONFLICTING decorations silently let the last "
    "flags win for both.  Fix: track flags per match in "
    "_scan_table_decorations and refuse on disagreement (the same "
    "silent-wrong class the decorated+bare mix already refuses).",
)
def test_conflicting_decorations_refused(spark, visits):
    with pytest.raises(ValueError, match="FINAL/SAMPLE|decorat"):
        chsql.run_sql(
            spark,
            "SELECT count(1) AS n FROM visits SAMPLE 1/2 "
            "JOIN visits SAMPLE 1/4 ON 1 = 1",
            {"visits": visits},
            table_meta=_META,
        )


@pytest.mark.xfail(
    strict=True,
    reason="ADVICE r11 #4 (deferred to r12): SAMPLE 1 is valid CH "
    "(reads all rows) but frac >= 1 refuses it with the misleading "
    "approximate-row-count message.  Fix: treat fraction == 1 as a "
    "no-op (no filter) in _parse_sample_fraction / the decoration "
    "apply; keep the refusal for integers > 1.",
)
def test_sample_one_reads_all_rows(spark, visits):
    out = chsql.run_sql(
        spark,
        "SELECT count(1) AS n FROM visits SAMPLE 1",
        {"visits": visits},
        table_meta=_META,
    )
    assert out.collect()[0]["n"] == 2


@pytest.mark.xfail(
    strict=True,
    reason="self-found r11, queued with the r12 chsql batch: CH array "
    "LITERALS `[1, 2]` must compile to array(1, 2) — today the "
    "bracket reaches Spark SQL verbatim and dies with "
    "PARSE_SYNTAX_ERROR (only identifier-preceded brackets are "
    "handled, as 1-based indexing).  Fix: masked scan converting "
    "brackets NOT preceded by an identifier/]/) into array(...), "
    "innermost-first so nesting works.",
)
def test_bracket_array_literal_compiles(spark, visits):
    out = chsql.run_sql(
        spark, "SELECT has([1, 2], 2) AS h FROM visits", {"visits": visits}
    )
    assert [r["h"] for r in out.collect()] == [True, True]


@pytest.mark.xfail(
    strict=True,
    reason="ADVICE r11 #5 (deferred to r12): hasAll compiles to "
    "forall(arr2, x -> array_contains(arr1, x)), which yields NULL "
    "for NULL elements, while CH hasAll treats NULL as a matchable "
    "value and always returns 0/1.  Fix: null-safe membership "
    "(exists(arr1, y -> y <=> __x)).",
)
def test_hasall_null_element_matches(spark, visits):
    out = chsql.run_sql(
        spark,
        "SELECT hasAll(array(1, CAST(NULL AS BIGINT)), "
        "array(CAST(NULL AS BIGINT))) AS h FROM visits",
        {"visits": visits},
    )
    vals = [r["h"] for r in out.collect()]
    assert vals == [True, True]  # CH: NULL element present -> 1
