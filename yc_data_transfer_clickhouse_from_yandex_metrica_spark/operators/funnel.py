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


def sequence_match(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    steps: list[Column],
    max_gaps: list[int | None] | None = None,
) -> DataFrame:
    """ClickHouse ``sequenceMatch('(?1).*(?2)...')``: (user, matched)
    where matched = 1 iff an event subsequence e1 < e2 < ... < ek (in
    timestamp order, strictly increasing) satisfies the step
    conditions in order.  ``max_gaps[i]`` optionally caps the seconds
    between step i+1 and step i+2 -- the pattern's common
    ``(?1)(?t<=N)(?2)`` time-constraint form.

    EXACT for any gap combination, not greedy: a backward dynamic
    program computes e_s(row) = the earliest completion time of steps
    s..k STARTING at this row, where each transition looks ahead
    through a bounded RANGE frame ((1, gap_us] -- or unbounded without
    a constraint) over the same hash(user) exchange.  A user matches
    iff any row has a finite full-chain completion.  Same single
    exchange and no per-user arrays, like window_funnel.
    """
    k = len(steps)
    if k == 0:
        raise ValueError("steps must be non-empty")
    gaps = list(max_gaps) if max_gaps is not None else [None] * (k - 1)
    if len(gaps) != k - 1:
        raise ValueError(f"max_gaps must have {k - 1} entries, got {len(gaps)}")
    out = df.select(
        user_col,
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__u"),
        *[cond.alias(f"__c{i}") for i, cond in enumerate(steps, start=1)],
    )
    out = out.withColumn(f"__e{k}", F.when(F.col(f"__c{k}"), F.col("__u")))
    for s in range(k - 1, 0, -1):
        gap = gaps[s - 1]
        hi = int(gap) * 1_000_000 if gap is not None else Window.unboundedFollowing
        frame = (
            Window.partitionBy(user_col).orderBy("__u").rangeBetween(1, hi)
        )
        out = out.withColumn(
            f"__e{s}",
            F.when(F.col(f"__c{s}"), F.min(F.col(f"__e{s + 1}")).over(frame)),
        )
    return out.groupBy(user_col).agg(
        F.max(
            F.when(F.col("__e1").isNotNull(), F.lit(1)).otherwise(F.lit(0))
        ).alias("matched")
    )


def sequence_count_pairs(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    first: Column,
    second: Column,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """ClickHouse ``sequenceCount('(?1).*(?2)')``: (user, n_matches)
    counting NON-OVERLAPPING first->second chains greedily in
    timestamp order (the CH state machine: waiting-for-1 advances on
    cond1, waiting-for-2 completes on cond2 and resets).

    The scan-order state machine collapses to run-length algebra:
    restrict to rows matching either condition (``second`` is taken
    as ``second AND NOT first`` so the conditions are disjoint, which
    is the CH behavior whenever the pattern's conditions are mutually
    exclusive -- e.g. event-type equalities), drop consecutive
    duplicates (extra firsts while waiting for a second, and extra
    seconds while waiting for a first, are no-ops), drop a leading
    second, and the remainder alternates 1,2,1,2,...: the count is
    floor(len / 2).  All steps are LAG/COUNT windows over ONE
    hash(user) exchange -- never a per-user event array.  Ties at one
    timestamp break arbitrarily unless ``tiebreak_col`` provides a
    deterministic secondary order (CH itself depends on block order
    there, so a stable id column is the reproducible choice).
    """
    a = first
    b = second & ~first
    tb = [F.col(tiebreak_col).alias("__tb")] if tiebreak_col else []
    base = df.select(
        user_col,
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__u"),
        *tb,
        F.when(a, F.lit(1)).when(b, F.lit(2)).alias("__lab"),
    )
    order_cols = ["__u", "__tb"] if tiebreak_col else ["__u"]
    w = Window.partitionBy(user_col).orderBy(*order_cols)
    # running last non-null label strictly before this row: unlabeled
    # rows are transparent, so no pre-filter (and no second frame of
    # distinct users to join back) is needed -- every user keeps >= 1
    # row into the single groupBy below.
    prev = F.last("__lab", ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    keep = F.col("__lab").isNotNull() & (
        prev.isNull() | (prev != F.col("__lab"))
    )
    counted = (
        base.withColumn("__keep", keep)
        .groupBy(user_col)
        .agg(
            F.sum(F.when(F.col("__keep"), 1).otherwise(0)).alias("__m"),
            F.min_by(
                F.when(F.col("__keep"), F.col("__lab")),
                F.when(F.col("__keep"), F.struct(*order_cols)),
            ).alias("__lab0"),
        )
    )
    # after compaction labels alternate; drop at most one leading 2
    n = F.floor(
        (F.col("__m") - F.when(F.col("__lab0") == 2, 1).otherwise(0)) / 2
    ).cast("long")
    return counted.select(user_col, n.alias("n_matches"))
