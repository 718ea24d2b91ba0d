"""``FROM t FINAL`` and ``SAMPLE k`` compilation (round 10; r8 verdict
tasks 5-6).

With declared ``TableMeta`` the dialect compiles the read-time
clauses CH serves from DDL: FINAL onto operators/collapse.collapsed()
(the VersionedCollapsingMergeTree read collapse,
/root/reference/ddl/visits.sql:229-233) and SAMPLE onto a contiguous
modulo-range filter of the declared SAMPLE BY key
(/root/reference/ddl/hits.sql:119).  Without metadata both clauses
keep their refusals -- including the Spark parse trap where FINAL
would silently become a table alias.
"""

from __future__ import annotations

import pytest

from yc_data_transfer_clickhouse_from_yandex_metrica_spark.plans import chsql


@pytest.fixture(scope="module")
def ledger(spark):
    # visit 1: updated once (live v2); visit 2: deleted; visit 3: live
    return spark.createDataFrame(
        [
            (1, 1, 1, 10),
            (1, 1, -1, 10),
            (1, 2, 1, 30),
            (2, 1, 1, 5),
            (2, 1, -1, 5),
            (3, 1, 1, 7),
        ],
        "VisitID BIGINT, VisitVersion INT, Sign INT, dur BIGINT",
    )


META = {
    "visits": chsql.TableMeta(
        key=("VisitID",), version="VisitVersion", sign="Sign",
        sample_by="VisitID",
    )
}


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_final_collapses_to_live_latest(spark, ledger):
    df = chsql.run_sql(
        spark,
        "SELECT VisitID, dur FROM visits FINAL ORDER BY VisitID",
        {"visits": ledger},
        table_meta=META,
    )
    # deleted visit 2 gone; visit 1 at its v2 state
    assert _rows(df) == [(1, 30), (3, 7)]


def test_final_matches_sign_algebra(spark, ledger):
    live = chsql.run_sql(
        spark,
        "SELECT count(1) AS n FROM visits FINAL",
        {"visits": ledger},
        table_meta=META,
    ).collect()[0][0]
    sign = chsql.run_sql(
        spark,
        "SELECT sum(Sign) AS n FROM visits",
        {"visits": ledger},
        table_meta=META,
    ).collect()[0][0]
    assert live == sign == 2


def test_sample_fraction_filters_key_range(spark, ledger):
    df = chsql.run_sql(
        spark,
        "SELECT VisitID FROM visits SAMPLE 0.000002 ORDER BY VisitID",
        {"visits": ledger},
        table_meta=META,
    )
    # pmod(VisitID, 1e6) < 2: keeps only VisitID 1 (3 ledger rows)
    assert [r[0] for r in df.collect()] == [1, 1, 1]


def test_sample_is_monotone(spark, ledger):
    def ids(frac):
        df = chsql.run_sql(
            spark,
            f"SELECT VisitID FROM visits SAMPLE {frac}",
            {"visits": ledger},
            table_meta=META,
        )
        return {r[0] for r in df.collect()}

    small, big = ids("0.000002"), ids("0.000004")
    assert small <= big


def test_final_and_sample_compose(spark, ledger):
    df = chsql.run_sql(
        spark,
        "SELECT count(1) AS n FROM visits FINAL SAMPLE 1/2",
        {"visits": ledger},
        table_meta=META,
    )
    # sample keeps every VisitID (pmod < 5e5 covers 1..3), collapse -> 2
    assert df.collect()[0][0] == 2


def test_final_without_meta_still_refuses(spark, ledger):
    with pytest.raises(ValueError, match="FINAL collapses rows"):
        chsql.run_sql(spark, "SELECT 1 FROM visits FINAL", {"visits": ledger})


def test_sample_without_key_refuses(spark, ledger):
    meta = {"visits": chsql.TableMeta(key=("VisitID",), version="VisitVersion", sign="Sign")}
    with pytest.raises(ValueError, match="SAMPLE"):
        chsql.run_sql(
            spark, "SELECT 1 FROM visits SAMPLE 0.1", {"visits": ledger},
            table_meta=meta,
        )


def test_mixed_bare_and_decorated_reference_refuses(spark, ledger):
    for sql in [
        "SELECT a.VisitID FROM visits a, visits FINAL",
        "SELECT x.VisitID FROM visits x JOIN visits FINAL ON 1=1",
    ]:
        with pytest.raises(ValueError, match="with and without"):
            chsql.run_sql(spark, sql, {"visits": ledger}, table_meta=META)


def test_subquery_final_refuses_not_alias(spark, ledger):
    with pytest.raises(ValueError, match="FINAL"):
        chsql.run_sql(
            spark,
            "SELECT 1 FROM (SELECT * FROM visits) FINAL",
            {"visits": ledger},
            table_meta=META,
        )


def test_integer_sample_refuses(spark, ledger):
    with pytest.raises(ValueError, match="row-count"):
        chsql.run_sql(
            spark, "SELECT 1 FROM visits SAMPLE 10000", {"visits": ledger},
            table_meta=META,
        )


def test_sample_offset_refuses(spark, ledger):
    with pytest.raises(ValueError, match="OFFSET"):
        chsql.run_sql(
            spark,
            "SELECT 1 FROM visits SAMPLE 0.1 OFFSET 0.5",
            {"visits": ledger},
            table_meta=META,
        )


def test_sample_filter_reaches_parquet_scan(spark):
    """The compiled SAMPLE predicate must be a scan-level DataFilter
    (pushdown-able at 100 TB), not a post-scan Filter only."""
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.queries import (
        driver as d,
    )

    df = d.q_chsql_sample(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = [l for l in plan.splitlines() if "FileScan" in l]
    assert scan and "pmod(l_orderkey" in scan[0], scan
    assert plan.count("Exchange") <= 1  # the groupBy only
