"""Funnel / cohort analytics over event streams (Metrica vocabulary).

The reference's data model IS Yandex Metrica traffic
(/root/reference/ddl/visits.sql, README.md:46-58); the analytics its
users run over that model in ClickHouse lean on ``windowFunnel`` and
``retention``.  Neither appears in the reference's own README queries,
so these are engine extensions -- with semantics defined precisely
below rather than by CH-version folklore.

``window_funnel``: multi-anchor max-chain semantics, matching
ClickHouse windowFunnel: EVERY event satisfying step 1 is a candidate
anchor, and the result is the deepest chain over all anchors (CH docs'
A,X,A,B,C strict_order example returns 3 -- the chain from the SECOND
A).  Each subsequent step binds to the earliest qualifying event
STRICTLY after the previous step's time and within ``window_seconds``
of its anchor.  The strictly-increasing-timestamp binding corresponds
to CH's ``strict_increase`` option; CH's default additionally allows
equal-timestamp events to advance the chain, a tie rule that depends
on CH block order and is deliberately not reproduced (see
COVERAGE.md).

Per-anchor greedy earliest binding maximizes depth (exchange
argument: an earlier bind leaves a superset of candidate suffixes),
so the deepest chain is found by a backward dynamic program over
"earliest completion time of steps s..d strictly after this event":

    e[s,d](row) = cond_s(row) ? (s == d ? ts : n[s+1,d](row)) : null
    n[s,d](row) = min(e[s,d]) over later-ts rows of the same user

An anchor reaches depth d iff n[2,d] <= anchor_ts + window (earliest
completion is monotone in d, so depth = 1 + count of satisfied d).
Each n[s,d] is one conditional-min RANGE-frame window -- k(k-1)/2
window columns for k steps, ALL over the same hash(user) exchange and
one sort; the final per-user max reuses that partitioning (verified:
single exchange).  Never a per-user event array, so a bot user with
10^8 events cannot OOM an executor -- the formulation CH itself uses
(in-memory event vector per user) would.

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
    """(user, depth): deepest funnel chain completed within the window,
    over ALL candidate anchors (ClickHouse windowFunnel semantics).

    ``steps`` are boolean per-event conditions in funnel order; depth 0
    means the user never performed step 1.

    ``mode=None`` (default): every step-1 event anchors a candidate
    chain; events not matching the next step are ignored; each step
    binds strictly after the previous one (CH ``strict_increase``
    binding -- see module docstring) and within the anchor's window;
    result = deepest chain of any anchor.

    ``mode="strict_order"``: ClickHouse's strict_order -- a chain
    breaks when ANY other event interleaves (CH docs' A->B->D->C
    example stops at D, depth 2, even though D matches no condition),
    but every step-1 event still anchors its own candidate chain
    (A,X,A,B,C returns 3 via the second A).  Tie rule: events sharing
    one timestamp count as one instant; the chain advances if ANY
    event at the next instant matches (deterministic, where CH
    depends on block order).

    Both modes: one hash(user) exchange end-to-end; timestamps are
    compared as epoch microseconds (TIMESTAMP_NTZ inputs are cast via
    the session timezone, which ``session.tune`` pins to UTC).
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    if mode not in (None, "strict_order"):
        raise ValueError(f"unsupported mode {mode!r}")
    k = len(steps)
    win_us = int(window_seconds) * 1_000_000
    # unix_micros rejects TIMESTAMP_NTZ; the cast is wall-clock-
    # preserving under the pinned UTC session timezone.
    base = df.select(
        user_col,
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__u"),
        *[cond.alias(f"__c{i}") for i, cond in enumerate(steps, start=1)],
    )
    if mode == "strict_order":
        return _strict_order_funnel(base, user_col, k, win_us)
    return _max_chain_funnel(base, user_col, k, win_us)


def _max_chain_funnel(
    base: DataFrame, user_col: str, k: int, win_us: int
) -> DataFrame:
    """Backward DP (module docstring): __n{s}_{d} = earliest epoch-us
    completion of steps s..d strictly after this row, for this user."""
    w_after = (
        Window.partitionBy(user_col)
        .orderBy("__u")
        .rangeBetween(1, Window.unboundedFollowing)
    )
    out = base
    for d in range(2, k + 1):
        for s in range(d, 1, -1):
            done = F.col("__u") if s == d else F.col(f"__n{s + 1}_{d}")
            out = out.withColumn(
                f"__n{s}_{d}",
                F.min(F.when(F.col(f"__c{s}"), done)).over(w_after),
            )
    horizon = F.col("__u") + F.lit(win_us)
    depth: Column = F.lit(1)
    for d in range(2, k + 1):
        # earliest completion is monotone in d: the satisfied set is a
        # prefix, so counting comparisons == max satisfied d.
        depth = depth + F.when(F.col(f"__n2_{d}") <= horizon, 1).otherwise(0)
    depth = F.when(F.col("__c1"), depth).otherwise(F.lit(0))
    return (
        out.withColumn("__depth", depth)
        .groupBy(user_col)
        .agg(F.max("__depth").alias("depth"))
    )


def _strict_order_funnel(
    base: DataFrame, user_col: str, k: int, win_us: int
) -> DataFrame:
    """Collapse events to distinct instants (RANGE(0,0) peer windows --
    no extra exchange), then a backward run-length DP over LEADs:
    __d{s} = length of the consecutive chain starting at this instant
    expecting condition s.  The window cap needs no per-step check: a
    strict chain occupies CONSECUTIVE instants, so depth is bounded by
    1 + count of following instants within the window (RANGE frame)."""
    w_order = Window.partitionBy(user_col).orderBy("__u")
    w_peers = w_order.rangeBetween(0, 0)
    out = base
    for s in range(1, k + 1):
        out = out.withColumn(
            f"__f{s}",
            F.max(F.when(F.col(f"__c{s}"), F.lit(1))).over(w_peers) == 1,
        )
    prev_u = F.lag("__u").over(w_order)
    out = (
        out.withColumn("__first", prev_u.isNull() | (prev_u != F.col("__u")))
        .filter(F.col("__first"))  # one row per (user, instant)
    )
    out = out.withColumn(
        f"__d{k}", F.when(F.col(f"__f{k}"), F.lit(1)).otherwise(F.lit(0))
    )
    for s in range(k - 1, 0, -1):
        out = out.withColumn(
            f"__d{s}",
            F.when(
                F.col(f"__f{s}"),
                F.lit(1) + F.lead(f"__d{s + 1}", 1, 0).over(w_order),
            ).otherwise(F.lit(0)),
        )
    in_window = F.count(F.lit(1)).over(
        Window.partitionBy(user_col).orderBy("__u").rangeBetween(1, win_us)
    )
    depth = F.when(
        F.col("__f1"), F.least(F.col("__d1"), in_window + F.lit(1))
    ).otherwise(F.lit(0))
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
