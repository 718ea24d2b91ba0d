"""Ordered-series analytics: ClickHouse's ORDER BY ... WITH FILL,
neighbor()/runningDifference(), and LIMIT n BY key -- the constructs a
Metrica dashboard port reaches for right after the reference's own
chart queries (dense date axes, deltas between consecutive visits,
"first n rows per group").

Reference context: the reference's DataLens charts plot per-day series
straight from ClickHouse (/root/reference/README.md:300-320); a day
with zero visits silently vanishes from such a chart unless the query
gap-fills -- ClickHouse answers that with ``ORDER BY d WITH FILL``.
``runningDifference``/``neighbor`` and ``LIMIT BY`` are the other two
ClickHouse-dialect constructs in that orbit, re-expressed here on
Spark primitives.

Scale notes (100 TB posture):

- ``fill_series``: the spine is built from the aggregated frame's own
  min/max (one cheap column-pruned agg -- map-side combined, bytes of
  driver traffic), exploded from a single row, then re-exploded across
  partitions.  The join is spine x aggregate-output -- both are
  |distinct axis values| rows, orders of magnitude below the fact
  table, so the broadcast is safe no matter how big the fact was.
- ``running_difference``: one shuffle on the partition key; the lag
  window is whole-stage-codegen'd, no Python.
- ``limit_by``: row_number over (key, order) -- one shuffle; Spark
  plans a WindowGroupLimit pushdown (rank-limit filter before the full
  sort materializes) in recent releases.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def fill_series(
    agg: DataFrame,
    axis_col: str,
    step: str = "1 day",
    fill: dict[str, object] | None = None,
    bounds: tuple[object, object] | None = None,
    interpolate: Sequence[str] = (),
) -> DataFrame:
    """ClickHouse ``ORDER BY <axis> WITH FILL [STEP <step>]`` over an
    ALREADY-AGGREGATED frame: make the axis dense from min to max (or
    explicit ``bounds``), inserting rows with ``fill`` defaults (CH
    fills with type defaults -- pass e.g. ``{"n": 0}``).

    ``axis_col`` must be a date column for interval steps ("1 day",
    "1 week") or an integral column for numeric steps ("1").  The
    spine is one exploded ``sequence`` -- bounded by the axis SPAN,
    not the pre-aggregation row count, so it is safe at any fact-table
    scale (guard: CH itself materializes the same number of filled
    rows).

    ``interpolate`` lists columns that carry the LAST SEEN value
    forward through filled gaps instead of a static default -- the
    ClickHouse ``WITH FILL ... INTERPOLATE (col)`` clause.  The
    carry-forward window is a single partition ordered by the axis,
    which is safe for the same reason the spine is: the frame is
    |axis values| rows (post-aggregation), never fact-table-sized.
    Rows before the first real value stay null (CH parity).

    When ``bounds`` is None the min/max comes from ``agg`` itself;
    naively that would evaluate the aggregate's lineage twice (two
    scans of the fact table it was derived from), so the frame --
    post-aggregation, i.e. |axis values| rows -- is eagerly
    localCheckpoint'ed first and BOTH the bounds probe and the join
    read the materialized blocks: one fact scan total.  Pass explicit
    ``bounds`` to skip even that.
    """
    fill = fill or {}
    if bounds is not None:
        lo, hi = F.lit(bounds[0]), F.lit(bounds[1])
        bounds_df = agg.sparkSession.range(1).select(
            lo.alias("__lo"), hi.alias("__hi")
        )
    else:
        agg = agg.localCheckpoint(eager=True)
        bounds_df = agg.agg(
            F.min(axis_col).alias("__lo"), F.max(axis_col).alias("__hi")
        )
    if step.strip().isdigit():
        seq = F.sequence(
            F.col("__lo"), F.col("__hi"), F.lit(int(step.strip()))
        )
    else:
        seq = F.sequence(
            F.col("__lo"), F.col("__hi"), F.expr(f"interval {step}")
        )
    spine = bounds_df.select(F.explode(seq).alias(axis_col))
    # spine and agg are both |axis| rows; broadcast the aggregate side
    # so the dense axis never shuffles (agg output is post-reduction,
    # i.e. tiny relative to the fact table it came from)
    out = spine.join(F.broadcast(agg), on=axis_col, how="left")
    out = out.select(
        axis_col,
        *[
            F.coalesce(F.col(c), F.lit(fill[c])).alias(c)
            if c in fill
            else F.col(c)
            for c in agg.columns
            if c != axis_col
        ],
    )
    if interpolate:
        w = Window.orderBy(axis_col).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        out = out.select(
            axis_col,
            *[
                F.last(F.col(c), ignorenulls=True).over(w).alias(c)
                if c in interpolate
                else F.col(c)
                for c in out.columns
                if c != axis_col
            ],
        )
    return out


def spanned_fill_series(
    agg: DataFrame,
    axis_col: str,
    step: str = "1 day",
    fill: dict[str, object] | None = None,
    interpolate: Sequence[str] = (),
    frm: object | None = None,
    to: object | None = None,
) -> DataFrame:
    """ClickHouse ``WITH FILL FROM <frm> TO <to>``: fill the grid
    ``frm, frm+step, ...`` STRICTLY BELOW ``to`` while KEEPING every
    original row -- including rows outside [frm, to), which CH never
    drops (plain ``fill_series(bounds=...)`` clips to the spine and
    is therefore NOT the FROM/TO contract).  ``frm``/``to`` default
    to the frame's own min / just-past-max, each side independently
    overridable.

    The spine is (grid points) UNION (original axis values),
    deduplicated -- still |span/step| + |axis values| rows, safe at
    any fact scale for the same reason fill_series is (the frame is
    post-aggregation).  One localCheckpoint keeps the aggregate's
    fact-scan single; the join broadcasts the aggregate side.

    ``to`` is supported for integral and DATE axes (the strict upper
    bound needs the axis's unit step to convert to an inclusive
    sequence stop); pass ``to=None`` for timestamps."""
    fill = fill or {}
    agg = agg.localCheckpoint(eager=True)
    # the grid is PHASE-ANCHORED at frm (CH: frm, frm+step, ...);
    # with no frm it anchors at the frame's min, the CH default
    lo = F.lit(frm) if frm is not None else F.min(axis_col)
    if to is not None:
        # sequence() stops are inclusive; convert the strict < to
        # bound via the axis's unit (hence the integral/DATE scope)
        axis_dt = dict(agg.dtypes)[axis_col]
        if axis_dt == "date":
            hi = F.date_sub(F.lit(to), 1)
        elif axis_dt in ("tinyint", "smallint", "int", "bigint"):
            hi = F.lit(to) - F.lit(1)
        else:
            raise ValueError(
                f"WITH FILL TO needs an integral or DATE axis; "
                f"{axis_col!r} is {axis_dt}"
            )
    else:
        hi = F.max(axis_col)
    bounds_df = agg.agg(lo.alias("__lo"), hi.alias("__hi"))
    if step.strip().isdigit():
        seq = F.sequence(
            F.col("__lo"), F.col("__hi"), F.lit(int(step.strip()))
        )
    else:
        seq = F.sequence(
            F.col("__lo"), F.col("__hi"), F.expr(f"interval {step}")
        )
    # an inverted span (frm beyond the data with no to, or to <= frm)
    # fills nothing -- sequence() would otherwise DESCEND
    seq = F.when(F.col("__lo") <= F.col("__hi"), seq).otherwise(
        F.array().cast(f"array<{dict(agg.dtypes)[axis_col]}>")
    )
    grid = bounds_df.select(F.explode(seq).alias(axis_col))
    spine = grid.union(agg.select(axis_col)).distinct()
    out = spine.join(F.broadcast(agg), on=axis_col, how="left")
    out = out.select(
        axis_col,
        *[
            F.coalesce(F.col(c), F.lit(fill[c])).alias(c)
            if c in fill
            else F.col(c)
            for c in agg.columns
            if c != axis_col
        ],
    )
    if interpolate:
        w = Window.orderBy(axis_col).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        out = out.select(
            axis_col,
            *[
                F.last(F.col(c), ignorenulls=True).over(w).alias(c)
                if c in interpolate
                else F.col(c)
                for c in out.columns
                if c != axis_col
            ],
        )
    return out


def _order_cols(order_col: str | Sequence[str]) -> list[str]:
    return [order_col] if isinstance(order_col, str) else list(order_col)


def running_difference(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str | Sequence[str],
    value_col: str,
    out_col: str = "diff",
) -> DataFrame:
    """ClickHouse ``runningDifference(value)`` scoped per key: value
    minus the previous row's value in (key, order) order; NULL for each
    key's first row (CH yields 0 for the first row of the WHOLE scan
    and makes no per-key promise -- block-dependent; the per-key
    window form is the deterministic semantic people actually want,
    and what neighbor(value, -1) arithmetic gives).  Pass a
    tie-breaking ``order_col`` list when the order key can repeat.
    """
    w = Window.partitionBy(*key_cols).orderBy(*_order_cols(order_col))
    return df.withColumn(
        out_col, F.col(value_col) - F.lag(value_col, 1).over(w)
    )


def neighbor(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str | Sequence[str],
    value_col: str,
    offset: int,
    default=None,
    out_col: str = "neighbor",
) -> DataFrame:
    """ClickHouse ``neighbor(value, offset[, default])`` per key:
    lead for positive offsets, lag for negative, with CH's explicit
    default instead of NULL when the neighbor falls outside the key."""
    w = Window.partitionBy(*key_cols).orderBy(*_order_cols(order_col))
    fn = F.lead(value_col, offset) if offset >= 0 else F.lag(
        value_col, -offset
    )
    c: Column = fn.over(w)
    if default is not None:
        c = F.coalesce(c, F.lit(default))
    return df.withColumn(out_col, c)


def limit_by(
    df: DataFrame,
    key_cols: Sequence[str],
    n: int,
    order_by: Sequence[Column | str],
    offset: int = 0,
) -> DataFrame:
    """ClickHouse ``LIMIT [offset,] n BY key``: the first ``n`` rows
    (after ``offset``) of each key group in ``order_by`` order.  Pass a
    deterministic ``order_by`` (CH inherits the query's ORDER BY;
    Spark needs it explicit).  One shuffle on the key."""
    w = Window.partitionBy(*key_cols).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(
            (F.col("__rn") > offset) & (F.col("__rn") <= offset + n)
        )
        .drop("__rn")
    )


def moving_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str | Sequence[str],
    value_col: str,
    window: int,
    agg: str = "avg",
    out_col: str = "mov",
) -> DataFrame:
    """ClickHouse ``groupArrayMovingAvg/Sum(window)`` re-expressed as
    a sliding row-frame window: for each row, agg over the last
    ``window`` rows (current included) within the key, in order.  CH
    returns the whole per-group array -- which is the group
    materialized on one server; the per-row frame form is the same
    numbers without ever holding a group in memory.  One shuffle on
    the key; the frame is codegen'd."""
    if agg not in ("avg", "sum", "min", "max"):
        raise ValueError(f"unsupported agg {agg!r}")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*_order_cols(order_col))
        .rowsBetween(-(window - 1), Window.currentRow)
    )
    fn = getattr(F, agg)
    return df.withColumn(out_col, fn(value_col).over(w))


def delta_sum(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str | Sequence[str],
    value_col: str,
    out_col: str = "delta_sum",
) -> DataFrame:
    """ClickHouse ``deltaSum``: the sum of POSITIVE deltas between
    consecutive values, per key in order (CH computes it in block
    order and patches block boundaries; the per-key ordered-window
    form is the deterministic semantic).  One shuffle: lag window and
    the final per-key sum share the hash(key) partitioning."""
    w = Window.partitionBy(*key_cols).orderBy(*_order_cols(order_col))
    d = F.col(value_col) - F.lag(value_col, 1).over(w)
    return (
        df.withColumn("__d", F.greatest(d, F.lit(0)))
        .groupBy(*key_cols)
        .agg(F.sum("__d").alias(out_col))
    )


def interval_length_sum(
    df: DataFrame,
    key_cols: Sequence[str],
    start_col: str,
    end_col: str,
    out_col: str = "covered",
) -> DataFrame:
    """ClickHouse ``intervalLengthSum``: per key, the total length of
    the UNION of [start, end] intervals -- overlaps counted once (the
    "time spent" aggregate: union of session/visibility windows).

    Sweep formulation, one shuffle: order intervals by (start, end)
    per key; the running max of *previous* ends marks what is already
    covered, so each row contributes
    ``greatest(0, end - greatest(start, prev_max_end))``; a sibling
    per-key sum reuses the same partitioning.  Numeric or timestamp
    columns both work (timestamps contribute seconds).
    """
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(start_col, end_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    s, e = F.col(start_col), F.col(end_col)
    is_ts = dict(df.dtypes)[start_col] in ("timestamp", "timestamp_ntz")
    if is_ts:
        # sweep in EXACT integer microseconds and divide ONCE at the
        # end: per-term double seconds accumulate rounding error that
        # flips truncation at integer boundaries (observed off-by-one
        # vs the oracle); the long sum is exact in any engine.
        # timestamp_diff stays type-safe for TIMESTAMP and NTZ alike.
        prev_end = F.max(e).over(w)
        us = lambda a, b: F.timestamp_diff("MICROSECOND", a, b)  # noqa: E731
        contrib = F.when(
            prev_end.isNull() | (prev_end < s), us(s, e)
        ).otherwise(F.greatest(us(prev_end, e), F.lit(0)))
    else:
        prev_end = F.max(e).over(w)
        eff_start = F.greatest(s, F.coalesce(prev_end, s))
        contrib = F.greatest(e - eff_start, F.lit(0))
    agg = (
        df.withColumn("__c", contrib)
        .groupBy(*key_cols)
        .agg(F.sum("__c").alias("__sum"))
    )
    if is_ts:
        # seconds as double from the exact micros sum
        return agg.select(
            *key_cols,
            (F.col("__sum") / F.lit(1_000_000.0)).alias(out_col),
        )
    return agg.select(*key_cols, F.col("__sum").alias(out_col))


def max_intersections(
    df: DataFrame,
    key_cols: Sequence[str],
    start_col: str,
    end_col: str,
    out_col: str = "max_open",
) -> DataFrame:
    """ClickHouse ``maxIntersections``: per key, the maximum number of
    intervals open at once (peak concurrency).  Intervals are treated
    half-open [start, end): an interval ending exactly when another
    starts does NOT overlap it -- a documented deterministic choice
    (CH's own tie behavior is block-order-dependent).

    Classic sweep: union +1 events at starts and -1 events at ends,
    order by (point, delta) so ends sort before starts at the same
    instant, running-sum the deltas, take the per-key max.  One union
    of two column-pruned projections, one hash(key) exchange for the
    window, and the final max reuses that partitioning.
    """
    starts = df.select(
        *key_cols, F.col(start_col).alias("__pt"), F.lit(1).alias("__d")
    )
    ends = df.select(
        *key_cols, F.col(end_col).alias("__pt"), F.lit(-1).alias("__d")
    )
    events = starts.unionByName(ends)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("__pt", "__d")  # -1 (end) before +1 (start) at ties
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        events.withColumn("__open", F.sum("__d").over(w))
        .groupBy(*key_cols)
        .agg(F.max("__open").alias(out_col))
    )
