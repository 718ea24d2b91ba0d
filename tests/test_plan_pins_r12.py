"""Physical-plan pins for the r12 statement compiles (QUALIFY,
DISTINCT ON, LIMIT WITH TIES).

PLANS.md's round-12 section records these shapes from hand .explain
probes; this file turns them into regression tests so a later Spark
upgrade or compile change that silently loses the WindowGroupLimit
pushdown (the property that makes the shapes safe at 100 TB) fails
CI instead of only drifting the bench:

- LIMIT n WITH TIES: a PARTIAL WindowGroupLimit must sit BEFORE the
  SinglePartition exchange, so each map task ships at most n rows
  plus local ties to the single reduce partition.
- QUALIFY rank<=k: exactly ONE hash exchange (on the PARTITION BY
  key) with Partial+Final group limits around it, and the compiled
  hidden `__qual` helper column pruned from the physical plan.
- DISTINCT ON (k): the LIMIT BY plan verbatim — WindowGroupLimit(1)
  around one hash exchange on k.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from yc_data_transfer_clickhouse_from_yandex_metrica_spark.plans import chsql


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _tbl(spark):
    # 8 input partitions so map-side vs reduce-side is observable
    return (
        spark.range(10_000)
        .repartition(8)
        .select(
            (F.col("id") % 13).alias("k"),
            F.col("id").alias("v"),
        )
    )


def test_with_ties_partial_limit_before_single_partition_exchange(spark):
    out = chsql.run_sql(
        spark,
        "SELECT k, v FROM t ORDER BY k LIMIT 5 WITH TIES",
        {"t": _tbl(spark)},
    )
    plan = _plan(out)
    # anchor to the operator line: a bare index('Partial') could match
    # unrelated plan text (e.g. a future format that capitalizes
    # partial aggregates) and silently change what the position check
    # measures
    partial = re.search(r"WindowGroupLimit.*Partial", plan)
    single = re.search(r"Exchange SinglePartition", plan)
    assert partial is not None, plan
    assert single is not None, plan
    # plan strings print top-down (reduce above map): the Partial
    # group limit must appear BELOW the global exchange, i.e. on the
    # map side of it
    assert partial.start() > single.start(), plan
    # and the result is still tie-complete: k=0 covers ids 0,13,26,...
    rows = out.collect()
    assert len(rows) > 5 and {r["k"] for r in rows} == {0}


def test_qualify_one_exchange_partial_final_and_helper_pruned(spark):
    out = chsql.run_sql(
        spark,
        "SELECT k, v FROM t QUALIFY "
        "row_number() OVER (PARTITION BY k ORDER BY v) <= 2",
        {"t": _tbl(spark)},
    )
    plan = _plan(out)
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
    limits = re.findall(r"WindowGroupLimit.*", plan)
    assert any("Partial" in ln for ln in limits), plan
    assert any("Final" in ln for ln in limits), plan
    # the compiled hidden boolean select item must not survive
    assert "__qual" not in plan, plan
    rows = out.collect()
    assert len(rows) == 26  # 13 keys x 2


def test_distinct_on_reuses_limit_by_group_limit_shape(spark):
    out = chsql.run_sql(
        spark,
        "SELECT DISTINCT ON (k) k, v FROM t ORDER BY k, v",
        {"t": _tbl(spark)},
    )
    plan = _plan(out)
    assert "WindowGroupLimit" in plan, plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
    rows = out.collect()
    # smallest v per key: v == k for this table (ids 0..12 hit first)
    assert sorted((r["k"], r["v"]) for r in rows) == [(i, i) for i in range(13)]
