"""Physical-plan pins for documented single-exchange / join-free
claims (r14).

Operator docstrings promise specific 100 TB-critical plan shapes that
until now were only hand-verified:

- ``rangejoin.asof_join``: JOIN-FREE formulation — union the tagged
  streams, one window per key; the plan must contain exactly one hash
  exchange on the key and ZERO join operators (the right side may be
  as large as the left precisely because nothing is broadcast and
  nothing is nested-loop).
- ``funnel.window_funnel`` (both modes) and ``funnel.sequence_match``:
  all k(k-1)/2 conditional-min windows ride ONE hash(user) exchange,
  and the final per-user aggregate reuses that partitioning — a
  second hash exchange appearing means a window frame stopped
  aligning with the groupBy key.
- ``funnel.sequence_count_pairs``: same single-exchange contract.

A Spark upgrade or refactor that silently breaks these re-shuffles
the full event table per extra stage at 100 TB — these pins turn
that into a CI failure.

Relation to the older pins in tests/test_operators.py
(test_window_funnel_single_exchange, test_sequence_ops_single_
exchange): those assert the PRE-execution plan of a 1-row,
1-partition input; these run a 2,000-row, 8-partition input to
completion and pin the FINAL adaptive plan — AQE is legally allowed
to re-plan at runtime, so only an executed-plan check proves the
shape that actually runs.  asof_join had no plan pin at all before
r14.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import funnel, rangejoin

_JOIN_OPS = re.compile(
    r"SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin|"
    r"BroadcastNestedLoopJoin|CartesianProduct"
)


def _plan(df) -> str:
    # AdaptiveSparkPlan's toString prints the Final Plan followed by
    # the Initial Plan — keep only the final section or every
    # exchange would be counted twice
    s = df._jdf.queryExecution().executedPlan().toString()
    return s.split("== Initial Plan ==")[0]


def _hash_exchanges(plan: str) -> int:
    return len(re.findall(r"Exchange hashpartitioning", plan))


def _events(spark):
    return (
        spark.range(2_000)
        .repartition(8)
        .select(
            (F.col("id") % 50).alias("user_id"),
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias(
                "ts"
            ),
            (F.col("id") % 3 + 1).alias("step"),
        )
    )


def test_asof_join_is_join_free_single_exchange(spark):
    left = spark.range(1_000).select(
        (F.col("id") % 20).alias("k"), F.col("id").alias("lt")
    )
    right = spark.range(500).select(
        (F.col("id") % 20).alias("k"),
        (F.col("id") * 2).alias("rt"),
        F.col("id").alias("v"),
    )
    out = rangejoin.asof_join(left, right, "k", "lt", "rt", ["v"])
    out.collect()
    plan = _plan(out)
    assert not _JOIN_OPS.search(plan), plan
    assert _hash_exchanges(plan) == 1, plan


def _steps():
    return [
        F.col("step") == 1,
        F.col("step") == 2,
        F.col("step") == 3,
    ]


def test_window_funnel_single_exchange(spark):
    for mode in (None, "strict_order"):
        out = funnel.window_funnel(
            _events(spark), "user_id", "ts", _steps(), 600, mode=mode
        )
        out.collect()
        plan = _plan(out)
        assert _hash_exchanges(plan) == 1, (mode, plan)
        assert not _JOIN_OPS.search(plan), (mode, plan)


def test_sequence_match_and_count_single_exchange(spark):
    m = funnel.sequence_match(
        _events(spark), "user_id", "ts", _steps(), max_gaps=[300, None]
    )
    m.collect()
    plan = _plan(m)
    assert _hash_exchanges(plan) == 1, plan

    c = funnel.sequence_count_pairs(
        _events(spark),
        "user_id",
        "ts",
        F.col("step") == 1,
        F.col("step") == 2,
    )
    c.collect()
    plan = _plan(c)
    assert _hash_exchanges(plan) == 1, plan
