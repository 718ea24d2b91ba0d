"""Funnel / cohort analytics over event streams (Metrica vocabulary).

The reference's data model IS Yandex Metrica traffic
(/root/reference/ddl/visits.sql, README.md:46-58); the analytics its
users run over that model in ClickHouse lean on ``windowFunnel`` and
``retention``.  Neither appears in the reference's own README queries,
so these are engine extensions -- with semantics defined precisely
below rather than by CH-version folklore.

``window_funnel``: earliest-chain semantics.  The anchor is the
user's EARLIEST step-1 event; each subsequent step binds to the
earliest qualifying event STRICTLY after the previous step's time and
within ``window_seconds`` of the anchor; depth = number of bound
steps.  (ClickHouse's windowFunnel greedily re-anchors mid-scan, so
on pathological event layouts it can report deeper chains for a
LATER anchor; the earliest-chain rule is deterministic, oracle-
expressible, and matches how funnels are read in practice.)

Plan shape: one exchange.  Every step is a conditional-min aggregate
window over the SAME ``partitionBy(user)`` spec -- Spark stacks k
Window operators over a single shuffle, then the final per-user
group-by reuses that partitioning (verified: no second exchange).
Never a per-user event array, so a bot user with 10^8 events cannot
OOM an executor -- the formulation CH itself uses (in-memory event
vector per user) would.

``retention``: per user, r1 = any event satisfied cond1;
ri = r1 AND any event satisfied condi (ClickHouse retention
semantics).  One flat max-aggregate per condition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def window_funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    steps: list[Column],
    window_seconds: int,
    mode: str | None = None,
) -> DataFrame:
    """(user, depth): deepest funnel step completed within the window.

    ``steps`` are boolean per-event conditions in funnel order; depth 0
    means the user never performed step 1.

    ``mode=None`` (default): earliest-chain as documented above --
    events not matching the next step are ignored.

    ``mode="strict_order"``: ClickHouse's strict_order -- the chain
    breaks when ANY other event interleaves (CH docs' A->B->D->C
    example stops at D, depth 2, even though D matches no condition).
    Step i binds only if the EARLIEST event after step i-1 satisfies
    condition i (tie rule: if several events share that earliest
    timestamp, any of them satisfying the condition binds --
    deterministic, where CH depends on block order).  Still the same
    single hash(user) exchange: the extra "next event" and "condition
    holds at that instant" lookups are two more aggregate windows over
    the SAME partitioning.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    if mode not in (None, "strict_order"):
        raise ValueError(f"unsupported mode {mode!r}")
    w = Window.partitionBy(user_col)
    out = df.select(
        user_col,
        F.col(ts_col).alias("__ts"),
        *[cond.alias(f"__c{i}") for i, cond in enumerate(steps, start=1)],
    )
    out = out.withColumn(
        "__t1", F.min(F.when(F.col("__c1"), F.col("__ts"))).over(w)
    )
    # timestamp_add is type-safe for TIMESTAMP and TIMESTAMP_NTZ alike
    # (unix_micros rejects NTZ), and timezone-free.
    horizon = F.timestamp_add(
        "SECOND", F.lit(int(window_seconds)), F.col("__t1")
    )
    for i in range(2, len(steps) + 1):
        if mode == "strict_order":
            nxt = F.min(
                F.when(F.col("__ts") > F.col(f"__t{i-1}"), F.col("__ts"))
            ).over(w)
            out = out.withColumn(f"__nf{i}", nxt)
            ok = F.max(
                F.when(
                    F.col(f"__c{i}")
                    & (F.col("__ts") == F.col(f"__nf{i}")),
                    F.lit(1),
                )
            ).over(w)
            out = out.withColumn(f"__ok{i}", ok)
            out = out.withColumn(
                f"__t{i}",
                F.when(
                    (F.col(f"__ok{i}") == 1)
                    & (F.col(f"__nf{i}") <= horizon),
                    F.col(f"__nf{i}"),
                ),
            )
            continue
        qualify = (
            F.col(f"__c{i}")
            & (F.col("__ts") > F.col(f"__t{i-1}"))
            & (F.col("__ts") <= horizon)
        )
        out = out.withColumn(
            f"__t{i}", F.min(F.when(qualify, F.col("__ts"))).over(w)
        )
    depth: Column = F.lit(0)
    for i in range(1, len(steps) + 1):
        depth = F.when(F.col(f"__t{i}").isNotNull(), F.lit(i)).otherwise(depth)
    return (
        out.withColumn("__depth", depth)
        .groupBy(user_col)
        .agg(F.max("__depth").alias("depth"))
    )


def retention(
    df: DataFrame, user_col: str, conds: list[Column]
) -> DataFrame:
    """(user, r1..rk): r1 = cond1 ever held; ri = r1 AND condi ever held."""
    if not conds:
        raise ValueError("conds must be non-empty")
    flags = df.groupBy(user_col).agg(
        *[
            F.max(F.when(c, F.lit(1)).otherwise(F.lit(0))).alias(f"__b{i}")
            for i, c in enumerate(conds, start=1)
        ]
    )
    return flags.select(
        user_col,
        F.col("__b1").alias("r1"),
        *[
            (F.col("__b1") * F.col(f"__b{i}")).alias(f"r{i}")
            for i in range(2, len(conds) + 1)
        ],
    )
