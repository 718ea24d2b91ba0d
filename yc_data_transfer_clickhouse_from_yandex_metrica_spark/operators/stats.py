"""Exact order statistics (ClickHouse quantileExact family) at scale.

ClickHouse exposes ``quantileExact`` / ``quantileExactLow`` /
``quantileExactHigh`` as aggregate functions that gather the group's
values and select by rank.  A faithful Spark translation would be
``array_sort(collect_list(v))[idx]`` -- which materializes every
group's values into one executor array and dies on a 100TB hot group.

The scalable formulation here never builds an array: rank every row
with a ``row_number`` window over (keys, value), count the group with
a sibling window over the SAME partitioning (one shuffle total, the
sort is reused), then a flat hash-aggregate picks the value whose
0-based rank hits the quantile index.  Selection is pure integer
arithmetic, so DuckDB reproduces it bit-for-bit for the oracle --
no cross-engine interpolation semantics to chase.

Index convention (0-based rank r in a group of n):
- ``variant="low"``  -> r = floor(q * (n - 1))   (quantileExactLow;
  python ``statistics.median_low`` at q=0.5)
- ``variant="high"`` -> r = ceil(q * (n - 1))    (quantileExactHigh)

Skew note: exact quantiles are inherently per-group global sorts; a
single hot key serializes its partition in ANY exact formulation
(ClickHouse's included -- it gathers the group on one node).  For
skewed 100TB groups prefer ``F.percentile_approx`` (t-digest sketch,
map-side combinable) and document the error bound instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def quantile_exact(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    qs: dict[str, float],
    variant: str = "low",
) -> DataFrame:
    """Per-group exact quantiles: one output row per key combination,
    one column per entry in ``qs`` (name -> level in [0, 1]).

    Duplicated values are interchangeable at equal rank, so the
    row_number tie-break among equal values never changes the result.
    """
    if variant not in ("low", "high"):
        raise ValueError(f"variant must be 'low' or 'high', got {variant!r}")
    for name, q in qs.items():
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile level {name}={q} outside [0, 1]")
    order = Window.partitionBy(*keys).orderBy("__v")
    group = Window.partitionBy(*keys)
    ranked = df.select(*keys, F.col(value_col).alias("__v")).select(
        "*",
        (F.row_number().over(order) - 1).alias("__r"),
        F.count(F.lit(1)).over(group).alias("__n"),
    )
    rank_fn = F.floor if variant == "low" else F.ceil
    aggs = [
        F.max(
            F.when(
                F.col("__r")
                == rank_fn(F.lit(float(q)) * (F.col("__n") - 1).cast("double")).cast(
                    "long"
                ),
                F.col("__v"),
            )
        ).alias(name)
        for name, q in qs.items()
    ]
    return ranked.groupBy(*keys).agg(*aggs)
