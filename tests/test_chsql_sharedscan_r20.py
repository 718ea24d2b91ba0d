"""r20 shared-scan compile for multi-frame structural statements.

The residual-join path (and the fast path with 2+ structural items)
used to re-embed FROM/WHERE into every aggregate frame, so one
statement scanned its source once PER FRAME.  ``_rewrite_summap`` now
lifts the source into ONE materialized base (localCheckpoint) that
every frame re-reads — guide §2.1/§6 read amplification.  These tests
pin: (a) shared-vs-legacy output equality on every frame combination,
(b) the compiled text actually reads the base view once per frame and
the base projects only referenced columns, (c) qualified references
and CH scalar WITH aliases survive the lift, (d) the single-frame
paths stay inline (no materialization where there is nothing to
share).
"""

from __future__ import annotations

import pytest

from yc_data_transfer_clickhouse_from_yandex_metrica_spark.plans import chsql


@pytest.fixture(scope="module")
def goals(spark):
    return spark.createDataFrame(
        [
            (10, ["buy", "view"], [5, 1], 3),
            (10, ["view", "cart"], [2, 4], 1),
            (20, ["buy"], [7], 2),
            (20, None, None, 5),
            (30, [], [], 1),
            (30, None, None, 2),
            (None, ["view"], [9], 4),
        ],
        "counter INT, gids ARRAY<STRING>, grev ARRAY<INT>, hits INT",
    )


def _rows(df):
    return sorted((tuple(r) for r in df.collect()), key=repr)


def _ab(spark, sql, tables, monkeypatch):
    """Rows from the shared-scan compile vs the legacy inline compile."""
    monkeypatch.setattr(chsql, "_SHARED_SCAN", True)
    new = _rows(chsql.run_sql(spark, sql, tables))
    monkeypatch.setattr(chsql, "_SHARED_SCAN", False)
    old = _rows(chsql.run_sql(spark, sql, tables))
    return new, old


MIXED = (
    "SELECT counter, count(1) AS n, sum(hits) AS sh, "
    "sumMap(gids, grev) AS m, topK(2)(hits) AS th "
    "FROM visits WHERE hits > 0 GROUP BY counter"
)


def test_shared_equals_legacy_mixed(spark, goals, monkeypatch):
    new, old = _ab(spark, MIXED, {"visits": goals}, monkeypatch)
    assert new == old and len(new) == 4


def test_shared_equals_legacy_having(spark, goals, monkeypatch):
    sql = (
        "SELECT counter, sum(hits) AS sh, sumMap(gids, grev) AS m "
        "FROM visits GROUP BY counter HAVING sh > 3 ORDER BY counter"
    )
    new, old = _ab(spark, sql, {"visits": goals}, monkeypatch)
    assert new == old and len(new) == 3


def test_shared_equals_legacy_global(spark, goals, monkeypatch):
    sql = "SELECT count(1) AS n, sumMap(gids, grev) AS m FROM visits"
    new, old = _ab(spark, sql, {"visits": goals}, monkeypatch)
    assert new == old and len(new) == 1


def test_shared_equals_legacy_two_struct_fast(spark, goals, monkeypatch):
    sql = (
        "SELECT counter, sumMap(gids, grev) AS s, maxMap(gids, grev) AS x "
        "FROM visits GROUP BY counter"
    )
    new, old = _ab(spark, sql, {"visits": goals}, monkeypatch)
    assert new == old and len(new) == 4


def test_shared_with_scalar_alias_and_alias_refs(spark, goals, monkeypatch):
    """CH scalar WITH substitutes into the lifted base WHERE; table
    alias qualification keeps resolving against the re-aliased base."""
    sql = (
        "WITH 0 AS floor_hits "
        "SELECT v.counter, count(1) AS n, sumMap(v.gids, v.grev) AS m "
        "FROM visits v WHERE v.hits > floor_hits GROUP BY v.counter"
    )
    new, old = _ab(spark, sql, {"visits": goals}, monkeypatch)
    assert new == old and len(new) == 4


def test_compiled_text_reads_one_base_per_frame(goals):
    shared: list[tuple[str, str]] = []
    out = chsql._rewrite_summap(
        MIXED.replace("visits", "__chsql_t0"),
        {"__chsql_t0": list(goals.columns)},
        shared,
    )
    assert len(shared) == 1
    view, base = shared[0]
    # the WHERE rides the base (filter evaluated once, at the single
    # scan); every column of the source is referenced here, so the
    # projection stays *
    assert base == (
        "SELECT * FROM __chsql_t0 WHERE CAST((hits > 0) AS BOOLEAN)"
    )
    # one base read per frame: residual + sumMap chain + topK chain,
    # each re-aliased as the source name so qualified refs resolve
    assert out.count(f"FROM {view} __chsql_t0") == 3
    assert "FROM __chsql_t0" not in out  # no frame re-scans the source


def test_base_projection_prunes_unreferenced_columns(goals):
    shared: list[tuple[str, str]] = []
    chsql._rewrite_summap(
        "SELECT counter, count(1) AS n, sumMap(gids, grev) AS m "
        "FROM __chsql_t0 GROUP BY counter",
        {"__chsql_t0": list(goals.columns)},
        shared,
    )
    (_view, base), = shared
    assert base.startswith("SELECT `counter`, `gids`, `grev` ")
    assert "hits" not in base


def test_single_frame_paths_stay_inline(goals):
    # fast path, one structural item: nothing to share
    shared: list[tuple[str, str]] = []
    out = chsql._rewrite_summap(
        "SELECT counter, sumMap(gids, grev) AS m "
        "FROM __chsql_t0 GROUP BY counter",
        {"__chsql_t0": list(goals.columns)},
        shared,
    )
    assert shared == [] and "FROM __chsql_t0" in out


def test_complex_from_stays_inline(goals):
    # a joined FROM is not a single plain relation: legacy inline form
    shared: list[tuple[str, str]] = []
    out = chsql._rewrite_summap(
        "SELECT count(1) AS n, sumMap(gids, grev) AS m "
        "FROM __chsql_t0 a JOIN __chsql_t1 b ON a.counter = b.counter",
        {"__chsql_t0": list(goals.columns)},
        shared,
    )
    assert shared == [] and out.count("FROM __chsql_t0 a JOIN") == 2


def test_refusals_survive_the_lift(spark, goals):
    # SAMPLE inside the lifted FROM/WHERE must keep the loud refusal
    with pytest.raises(Exception, match="SAMPLE"):
        chsql.run_sql(
            spark,
            "SELECT count(1) AS n, sumMap(gids, grev) AS m "
            "FROM visits WHERE counter IN "
            "(SELECT counter FROM visits SAMPLE 0.5)",
            {"visits": goals},
        )


def test_union_branches_get_independent_bases(spark, goals, monkeypatch):
    sql = (
        "SELECT counter, count(1) AS n, sumMap(gids, grev) AS m "
        "FROM visits WHERE hits > 1 GROUP BY counter "
        "UNION ALL "
        "SELECT counter, count(1) AS n, sumMap(gids, grev) AS m "
        "FROM visits WHERE hits <= 1 GROUP BY counter"
    )
    new, old = _ab(spark, sql, {"visits": goals}, monkeypatch)
    assert new == old and len(new) == 6
