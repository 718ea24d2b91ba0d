"""Bucketed interval (range) join -- the non-broadcast SCD-2 path.

The reference's validity-interval join (fact date within dim
FromDT..ToDT, /root/reference/README.md:292-296) is a broadcast
non-equi join while the dim is small.  When the dim outgrows broadcast
(SURVEY.md section 4 flags this as the one scale risk), a plain
non-equi join degenerates to a nested-loop; the scale-safe shape is:

1. clamp each dim interval to the fact's observed date range (SCD-2
   tails like ``..2099-12-31`` otherwise explode),
2. explode the clamped interval into coarse calendar buckets
   (default weekly -- the reference's own partition granularity),
3. equi-join fact (bucket, keys) x dim (bucket, keys) -- a plain
   shuffled hash join Catalyst handles like any other -- then
4. refine with the exact between-predicate.

Dim inflation = interval-weeks per row, bounded by the fact span; the
join itself is pure equi so AQE/skew handling and co-location all
apply.  The clamp bounds come from the caller or from parquet footer
statistics (``parquet_min_max``) -- metadata only, so the fact is
scanned exactly once, by the join itself.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_B = "__bucket"


def parquet_min_max(path: str, column: str) -> tuple:
    """(min, max) of ``column`` from parquet FOOTER statistics alone:
    O(#files) metadata reads, zero data pages touched.  The 100TB way
    to learn a table's date span -- the same numbers a catalog or
    partition listing would hand a warehouse engine.  Returns
    (None, None) when no file carries stats for the column.

    Footer min/max cover every row, so the result is a valid clamp
    bound for ANY filtered subset of the table (bounds only need to
    contain the fact's points; wider is still exact)."""
    import pyarrow.parquet as pq

    files = (
        sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
        if os.path.isdir(path)
        else [path]
    )
    lo = hi = None
    for fp in files:
        md = pq.ParquetFile(fp).metadata
        arrow_names = md.schema.to_arrow_schema().names
        if column not in arrow_names:
            continue
        ci = arrow_names.index(column)
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(ci).statistics
            if st is None or not st.has_min_max:
                continue
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
    return lo, hi


def interval_join(
    fact: DataFrame,
    dim: DataFrame,
    point_col: str,
    from_col: str,
    to_col: str,
    equi: list[tuple[str, str]] | None = None,
    granularity: str = "week",
    how: str = "inner",
    bounds: tuple | None = None,
) -> DataFrame:
    """Join fact rows to dim rows whose [from_col, to_col] interval
    contains ``fact.point_col``, without broadcasting the dim.

    ``equi`` lists extra (fact_col, dim_col) equality pairs that ride
    the bucket equi-join.  Output columns = fact columns + dim columns
    (helper columns dropped); same semantics as the broadcast
    formulation, plan shape = equi join + filter.

    ``bounds=(lo, hi)`` clamps the dim intervals without touching the
    fact: pass partition-listing or footer-statistics values (see
    ``parquet_min_max``) so the fact is scanned once, by the join
    itself.  Bounds must COVER the fact's points (wider is fine --
    the exact between-refine keeps the result identical).  When
    omitted, the bounds are computed with an eager min/max aggregate
    -- an extra full pass over the fact, acceptable only off the
    100TB path.
    """
    if bounds is None:
        row = fact.agg(
            F.min(point_col).alias("lo"), F.max(point_col).alias("hi")
        ).first()
        bounds = (row["lo"], row["hi"])
    lo, hi = bounds
    if lo is None:  # empty fact: emit no rows, keep schema
        empty_cond = F.lit(False)
        return fact.join(dim, empty_cond, how)

    clamped = (
        dim.withColumn("__fc", F.greatest(F.col(from_col), F.lit(lo)))
        .withColumn("__tc", F.least(F.col(to_col), F.lit(hi)))
        .where(F.col("__fc") <= F.col("__tc"))
    )
    d = clamped.withColumn(
        _B,
        F.explode(
            F.sequence(
                F.date_trunc(granularity, F.col("__fc")).cast("date"),
                F.date_trunc(granularity, F.col("__tc")).cast("date"),
                F.expr(f"interval 1 {granularity}"),
            )
        ),
    ).drop("__fc", "__tc")
    f = fact.withColumn(_B, F.date_trunc(granularity, F.col(point_col)).cast("date"))

    cond: Column = f[_B] == d[_B]
    for fc, dc in equi or []:
        cond = cond & (f[fc] == d[dc])
    cond = cond & (f[point_col] >= d[from_col]) & (f[point_col] <= d[to_col])
    return f.join(d, cond, how).drop(_B)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    how: str = "left",
    inequality: str = ">=",
) -> DataFrame:
    """As-of join: attach to each left row the NEAREST right row of
    the same key satisfying ``left_time <inequality> right_time``.
    The default ``>=`` is the DuckDB/kdb/CH contract (latest right at
    or before left; ties at equal time match); ``>`` excludes the
    tie; ``<=`` / ``<`` flip the direction (EARLIEST right at-or-after
    / strictly after left) — the full CH ASOF comparator set (r12,
    closing the r11 refusal).

    Join-free formulation: union the two streams tagged by side, one
    window per key ordered by (time, side) carrying ``last(value,
    ignorenulls)`` forward, keep the left rows.  The time order is
    ascending for ``>=``/``>`` and descending for ``<=``/``<``; at
    equal time the right row sorts before the left exactly when the
    comparator includes equality.  ONE shuffle on the key, no join,
    no broadcast -- the right side can be as large as the left.  At
    100TB pre-partition both inputs by key (bucketed tables) and even
    that shuffle disappears.  Rows with equal (key, right_time)
    resolve by the last in window order; keep (key, right_time)
    unique for determinism.

    NULL-time semantics (r12, ADVICE r11 #2): ClickHouse REJECTS
    Nullable ASOF columns outright; this operator instead gives NULL
    times the only consistent meaning — they never match.  Right rows
    with NULL ``right_time`` are dropped before the union (under the
    default ascending order Spark sorts NULLS FIRST, so they would
    otherwise be carried forward into every left row with no earlier
    real match).  Left rows with NULL ``left_time`` are kept but sort
    BEFORE every real right row (``asc_nulls_first`` /
    ``desc_nulls_first``), so they see no carried value: NULL-padded
    under ``how='left'``, dropped under ``'inner'``.
    """
    if inequality not in (">=", ">", "<=", "<"):
        raise ValueError(
            f"asof_join: inequality {inequality!r} not one of >= > <= <"
        )
    rv = F.struct(*[F.col(c) for c in value_cols]).alias("__rv")
    # NULL right times can never satisfy any comparator -- drop them
    # here, not in the window order: NULLS FIRST under asc would carry
    # their values into every otherwise-unmatched left row
    r = right.where(F.col(right_time).isNotNull()).select(
        F.col(key).alias(key),
        F.col(right_time).alias("__t"),
        rv,
        F.lit(1).alias("__is_right"),
    )
    l_cols = left.columns
    lt = left.select(
        *l_cols,
        F.col(left_time).alias("__t"),
        F.lit(None).cast(r.schema["__rv"].dataType).alias("__rv"),
        F.lit(0).alias("__is_right"),
    )
    r_full = r.select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            if c != key
            else F.col(key)
            for c in l_cols
        ],
        "__t",
        "__rv",
        "__is_right",
    )
    from pyspark.sql import Window

    ascending = inequality in (">=", ">")
    ties_match = inequality in (">=", "<=")
    # NULLS FIRST in BOTH directions: a NULL left time must sort
    # before every (non-NULL) right row so last() carries nothing
    # into it (desc's default NULLS LAST would hand it the final
    # carried value -- a silent match on a NULL time)
    t_ord = (
        F.col("__t").asc_nulls_first()
        if ascending
        else F.col("__t").desc_nulls_first()
    )
    side_ord = (
        F.col("__is_right").desc() if ties_match else F.col("__is_right").asc()
    )
    w = (
        Window.partitionBy(key)
        .orderBy(t_ord, side_ord)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = lt.unionByName(r_full).withColumn(
        "__last", F.last("__rv", ignorenulls=True).over(w)
    )
    out = merged.where(F.col("__is_right") == 0)
    if how == "inner":
        out = out.where(F.col("__last").isNotNull())
    return out.select(
        *l_cols, *[F.col(f"__last.{c}").alias(c) for c in value_cols]
    )
