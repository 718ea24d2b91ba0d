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
apply.  Two driver-side scalars (min/max fact date) are the only
collected values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_B = "__bucket"


def interval_join(
    fact: DataFrame,
    dim: DataFrame,
    point_col: str,
    from_col: str,
    to_col: str,
    equi: list[tuple[str, str]] | None = None,
    granularity: str = "week",
    how: str = "inner",
) -> DataFrame:
    """Join fact rows to dim rows whose [from_col, to_col] interval
    contains ``fact.point_col``, without broadcasting the dim.

    ``equi`` lists extra (fact_col, dim_col) equality pairs that ride
    the bucket equi-join.  Output columns = fact columns + dim columns
    (helper columns dropped); same semantics as the broadcast
    formulation, plan shape = equi join + filter.
    """
    bounds = fact.agg(
        F.min(point_col).alias("lo"), F.max(point_col).alias("hi")
    ).first()
    lo, hi = bounds["lo"], bounds["hi"]
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
