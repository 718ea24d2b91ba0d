"""Exact order statistics (ClickHouse quantileExact family) at scale.

ClickHouse exposes ``quantileExact`` / ``quantileExactLow`` /
``quantileExactHigh`` as aggregate functions that gather the group's
values and select by rank.  A faithful Spark translation would be
``array_sort(collect_list(v))[idx]`` -- which materializes every
group's values into one executor array and dies on a 100TB hot group.

Two formulations here, selected by ``method``:

- ``"window"`` (default): rank every row with a ``row_number`` window
  over (keys, value), count the group with a sibling window over the
  SAME partitioning (one shuffle, the sort is reused), then a flat
  hash-aggregate picks the value whose 0-based rank hits the quantile
  index.  Cheapest plan -- but a window partition IS a group, so
  parallelism is bounded by the number of groups: 3 groups on a
  1000-core cluster leave 997 cores idle (measured: 16x data -> ~10x
  wall on a 3-group input).  Right when groups are plentiful.

- ``"range"``: group-PARALLEL exact selection.  Range-partition rows
  by (keys, value) so each group spans MANY partitions in sorted
  order; per-(partition, group) segment counts (a tiny map-side
  aggregate) yield each segment's global rank offset via a cumulative
  window; each row's global in-group rank is then offset + local
  row_number, and the quantile is the row whose rank hits the target
  index.  Two balanced shuffles of the data, never bounded by group
  count.  Output is identical to "window" for ANY valid range split:
  equal values are interchangeable at equal rank, so boundary
  placement between duplicates cannot change the selected value.

  Measured trade (PLANS.md round-3 probe, 9.6M rows / 3 groups,
  local[32]): "window" 7.9 s, "range" 19.5 s -- the sampling pass and
  second shuffle cost more than the serial 3-task sort saves on one
  node.  The crossover is a real cluster with hot groups: at 100TB /
  3 groups, "window" sorts ~33TB per task (does not finish); "range"
  is data/cores.  Default stays "window"; switch when groups are few
  and huge.

Index convention (0-based rank r in a group of n):
- ``variant="low"``  -> r = floor(q * (n - 1))   (quantileExactLow;
  python ``statistics.median_low`` at q=0.5)
- ``variant="high"`` -> r = ceil(q * (n - 1))    (quantileExactHigh)

Null values are ignored (ClickHouse aggregate behavior).

Selection is pure integer arithmetic, so DuckDB reproduces results
bit-for-bit for the oracle -- no cross-engine interpolation semantics
to chase.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _check_args(qs: dict[str, float], variant: str, method: str) -> None:
    if variant not in ("low", "high"):
        raise ValueError(f"variant must be 'low' or 'high', got {variant!r}")
    if method not in ("window", "range"):
        raise ValueError(f"method must be 'window' or 'range', got {method!r}")
    for name, q in qs.items():
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile level {name}={q} outside [0, 1]")


def _rank_hit_aggs(
    qs: dict[str, float], variant: str, rank_col: str, n_col: str
) -> list[Column]:
    """One conditional-max per quantile: value where 0-based rank ==
    floor/ceil(q*(n-1))."""
    rank_fn = F.floor if variant == "low" else F.ceil
    return [
        F.max(
            F.when(
                F.col(rank_col)
                == rank_fn(
                    F.lit(float(q)) * (F.col(n_col) - 1).cast("double")
                ).cast("long"),
                F.col("__v"),
            )
        ).alias(name)
        for name, q in qs.items()
    ]


def quantile_exact(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    qs: dict[str, float],
    variant: str = "low",
    method: str = "window",
    partitions: int | None = None,
) -> DataFrame:
    """Per-group exact quantiles: one output row per key combination,
    one column per entry in ``qs`` (name -> level in [0, 1]).

    ``method="range"`` (group-parallel selection; see module doc) takes
    an optional ``partitions`` override for the range split width.
    """
    _check_args(qs, variant, method)
    base = df.select(*keys, F.col(value_col).alias("__v")).where(
        F.col("__v").isNotNull()
    )
    if method == "window":
        order = Window.partitionBy(*keys).orderBy("__v")
        group = Window.partitionBy(*keys)
        ranked = base.select(
            "*",
            (F.row_number().over(order) - 1).alias("__r"),
            F.count(F.lit(1)).over(group).alias("__n"),
        )
        return ranked.groupBy(*keys).agg(*_rank_hit_aggs(qs, variant, "__r", "__n"))

    # method == "range"
    nparts = partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    parted = base.repartitionByRange(
        nparts, *[F.col(k) for k in keys], F.col("__v")
    ).withColumn("__pid", F.spark_partition_id())
    # per-(range-partition, group) segment sizes: tiny (nparts x groups)
    seg = parted.groupBy("__pid", *keys).count()
    grp = Window.partitionBy(*keys)
    cum = Window.partitionBy(*keys).orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    seg = seg.select(
        "__pid",
        *keys,
        F.coalesce(F.sum("count").over(cum), F.lit(0)).alias("__off"),
        F.sum("count").over(grp).alias("__n"),
    )
    # global in-group rank = segment offset + local rank; the local
    # window partitions on (__pid, keys) -- thousands of balanced
    # chunks, not one partition per group
    local = Window.partitionBy("__pid", *keys).orderBy("__v")
    ranked = (
        parted.join(seg, ["__pid", *keys])
        .select(
            *keys,
            "__v",
            "__n",
            (F.col("__off") + F.row_number().over(local) - 1).alias("__r"),
        )
    )
    rank_fn = F.floor if variant == "low" else F.ceil
    hit = None
    for q in qs.values():
        cond = F.col("__r") == rank_fn(
            F.lit(float(q)) * (F.col("__n") - 1).cast("double")
        ).cast("long")
        hit = cond if hit is None else (hit | cond)
    return (
        ranked.where(hit)
        .groupBy(*keys)
        .agg(*_rank_hit_aggs(qs, variant, "__r", "__n"))
    )


def quantile_exact_weighted(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    weight_col: str,
    qs: dict[str, float],
    variant: str = "low",
) -> DataFrame:
    """ClickHouse ``quantileExactWeighted``: exact quantiles of the
    multiset where each row's value appears ``weight_col`` times --
    without ever expanding it.

    Per (group, value): summed weight w and the cumulative weight
    before it; the value COVERS expanded 0-based ranks
    [cum_before, cum_before + w - 1], so the quantile is the value
    whose range contains floor/ceil(q*(n-1)) with n = total weight.
    Consistent with :func:`quantile_exact` when weights are the
    per-value duplicate counts -- which also makes this the compressed
    path for low-cardinality value domains (durations, counts,
    prices): the window sorts distinct values, not rows.

    One hash aggregate on (keys, value) with map-side combine, then a
    window over the compressed distribution.  Zero/negative weights are
    excluded (CH ignores them).
    """
    _check_args(qs, variant, "window")
    w = F.col(weight_col).cast("long")
    dist = (
        df.select(*keys, F.col(value_col).alias("__v"), w.alias("__w"))
        .where(F.col("__v").isNotNull() & (F.col("__w") > 0))
        .groupBy(*keys, "__v")
        .agg(F.sum("__w").alias("__w"))
    )
    order = Window.partitionBy(*keys).orderBy("__v")
    grp = Window.partitionBy(*keys)
    cum = (
        dist.select(
            *keys,
            "__v",
            "__w",
            F.coalesce(
                F.sum("__w").over(order.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ).alias("__cb"),
            F.sum("__w").over(grp).alias("__n"),
        )
    )
    rank_fn = F.floor if variant == "low" else F.ceil
    aggs = []
    for name, q in qs.items():
        r = rank_fn(F.lit(float(q)) * (F.col("__n") - 1).cast("double")).cast("long")
        aggs.append(
            F.max(
                F.when(
                    (r >= F.col("__cb")) & (r < F.col("__cb") + F.col("__w")),
                    F.col("__v"),
                )
            ).alias(name)
        )
    return cum.groupBy(*keys).agg(*aggs)


def heavy_hitters(
    df: DataFrame,
    cols: list[str],
    k: int,
    weight_col: str | None = None,
) -> DataFrame:
    """ClickHouse ``topK(k)(x)`` made exact: the k most frequent
    values of ``cols`` (optionally frequency = sum(weight_col)), with
    the deterministic tie-break (count desc, value asc) CH's
    SpaceSaving sketch cannot promise.

    Plan: one hash aggregate (map-side partial combine does the heavy
    lifting -- post-shuffle volume is |distinct values|, not |rows|),
    then a global TakeOrderedAndProject of k rows.  No full sort, no
    sketch error.  CH accepts approximation because its aggregate runs
    inside one server; on Spark the exact form IS the cheap form.
    """
    freq = F.sum(F.col(weight_col)) if weight_col else F.count(F.lit(1))
    out = df.groupBy(*cols).agg(freq.alias("freq"))
    return out.orderBy(
        F.col("freq").desc(), *[F.col(c).asc() for c in cols]
    ).limit(k)


def histogram(
    df: DataFrame,
    value_col: str,
    nbins: int,
    keys: list[str] | None = None,
    bounds: tuple[float, float] | None = None,
) -> DataFrame:
    """Equi-width histogram of ``value_col`` (ClickHouse exposes
    ``histogram(n)(x)`` with adaptive bins; the equi-width form is the
    deterministic, oracle-expressible variant): bin i covers
    [lo + i*w, lo + (i+1)*w) with the max value folded into the last
    bin.  NULLs are ignored.  Degenerate/out-of-range rules: when
    hi <= lo (all values equal, or inverted explicit bounds) every
    value lands in a single bin 0 of zero width -- never a NaN bin id;
    with explicit ``bounds``, values below lo clamp into bin 0 and
    values above hi clamp into bin nbins-1 (symmetric edge fold).

    Bounds default to the column's global min/max -- one cheap
    column-pruned pre-aggregate (map-side combined, bytes to the
    driver is a 1-row broadcast, NOT a driver collect of data rows).
    The histogram itself is a single hash aggregate on the bin id:
    two scans total, both pruned to ``value_col``, each fully
    parallel; pass explicit ``bounds`` to drop to one scan.
    """
    keys = keys or []
    v = F.col(value_col).cast("double")
    if bounds is not None:
        lo, hi = F.lit(float(bounds[0])), F.lit(float(bounds[1]))
        src = df.select(*keys, v.alias("__v")).withColumn(
            "__lo", lo
        ).withColumn("__hi", hi)
    else:
        b = df.agg(
            F.min(v).cast("double").alias("__lo"),
            F.max(v).cast("double").alias("__hi"),
        )
        src = df.select(*keys, v.alias("__v")).crossJoin(F.broadcast(b))
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(nbins))
    raw_bin = F.floor((F.col("__v") - F.col("__lo")) / width).cast("long")
    bin_id = F.when(F.col("__hi") <= F.col("__lo"), F.lit(0)).otherwise(
        F.greatest(F.lit(0), F.least(raw_bin, F.lit(nbins - 1)))
    )
    return (
        src.where(F.col("__v").isNotNull())
        .select(
            *keys,
            bin_id.alias("bin"),
            (F.col("__lo") + bin_id * width).alias("lo"),
            (F.col("__lo") + (bin_id + 1) * width).alias("hi"),
        )
        .groupBy(*keys, "bin", "lo", "hi")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def entropy(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    out_col: str = "entropy",
) -> DataFrame:
    """ClickHouse ``entropy(x)``: Shannon entropy (bits) of the value
    distribution per group.  Two-level aggregate: counts per
    (group, value) with map-side combine compress the input to
    |distinct values| rows; the probability window and final sum run
    over that compressed frame -- the raw rows are never re-shuffled.
    """
    counts = df.groupBy(*keys, value_col).agg(
        F.count(F.lit(1)).alias("__n")
    )
    w = Window.partitionBy(*keys)
    p = F.col("__n") / F.sum("__n").over(w)
    return (
        counts.withColumn("__p", p)
        .groupBy(*keys)
        .agg((-F.sum(F.col("__p") * F.log2(F.col("__p")))).alias(out_col))
    )
