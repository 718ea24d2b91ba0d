"""ClickHouse map-aggregate combinators (``sumMap`` family).

``sumMap(keys, values)`` consumes rows carrying PARALLEL ARRAYS
(ClickHouse's Nested columns arrive exactly like that -- e.g. the
Metrica visits model's ``Goals.ID`` / ``Goals.Revenue`` pairs,
/root/reference/ddl/visits.sql Goals nested group) and returns, per
group, the sorted distinct keys with element-wise aggregated values.

Spark-first formulation: posexplode-zip the pairs, one hash aggregate
on (group, key) -- map-side partial combine collapses hot keys before
the shuffle -- then reassemble the per-group sorted arrays with a
second small aggregate.  The wide row (arrays) exists only before the
first explode and after the final collect_list of ALREADY-REDUCED
(key, value) pairs: |distinct keys per group| elements, the same size
CH's sumMap state holds, never the raw pair stream.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_AGGS = {"sum": F.sum, "min": F.min, "max": F.max}


def agg_map(
    df: DataFrame,
    group_cols: Sequence[str],
    keys_col: str,
    vals_col: str,
    how: str = "sum",
    out_keys: str = "map_keys",
    out_vals: str = "map_vals",
) -> DataFrame:
    """``sumMap``/``minMap``/``maxMap``: per group, element-wise
    aggregate of the (keys[], values[]) pairs across rows; output is
    (sorted keys array, matching aggregated values array).

    Edge semantics (matching ClickHouse where it defines them):

    - a row with ``size(keys) != size(vals)`` RAISES, as CH's sumMap
      does on unequal Nested sizes (``arrays_zip`` alone would
      silently null-pad the shorter side into a phantom null-key
      group); null arrays count as size 0, so (null, []) passes.
    - a group whose rows carry only empty/null arrays still appears
      in the output, with ``([], [])`` -- never silently dropped.
    """
    if how not in _AGGS:
        raise ValueError(f"how must be one of {sorted(_AGGS)}, got {how!r}")
    nk = F.coalesce(F.size(keys_col), F.lit(0))
    nv = F.coalesce(F.size(vals_col), F.lit(0))
    # assert_true yields NULL on success; the filter both forces its
    # evaluation (it cannot be pruned) and keeps every valid row.
    guard = F.assert_true(
        nk == nv,
        F.concat(
            F.lit(f"agg_map: size({keys_col}) != size({vals_col}): "),
            nk.cast("string"),
            F.lit(" vs "),
            nv.cast("string"),
        ),
    )
    checked = df.select(*group_cols, keys_col, vals_col, guard.alias("__chk")).filter(
        F.col("__chk").isNull()
    )
    pairs = checked.select(
        *group_cols,
        F.explode(
            F.arrays_zip(
                F.col(keys_col).alias("k"), F.col(vals_col).alias("v")
            )
        ).alias("p"),
    ).select(*group_cols, F.col("p.k").alias("k"), F.col("p.v").alias("v"))
    reduced = pairs.groupBy(*group_cols, "k").agg(
        _AGGS[how]("v").alias("v")
    )
    packed = reduced.groupBy(*group_cols).agg(
        F.array_sort(F.collect_list(F.struct("k", "v"))).alias("__kv")
    )
    # groups whose pairs all exploded away (empty/null arrays) must
    # still appear as ([], []); the distinct-groups agg shares the
    # hash(group) partitioning with `packed`, so this is a cheap
    # left join, not a second scan-wide shuffle of the pair stream.
    all_groups = checked.select(*group_cols).distinct()
    key_type = df.schema[keys_col].dataType
    val_type = df.schema[vals_col].dataType
    return (
        all_groups.join(packed, on=list(group_cols), how="left")
        .select(
            *group_cols,
            F.coalesce(
                F.transform("__kv", lambda s: s["k"]),
                F.array().cast(key_type),
            ).alias(out_keys),
            F.coalesce(
                F.transform("__kv", lambda s: s["v"]),
                F.array().cast(val_type),
            ).alias(out_vals),
        )
    )


def sum_map(
    df: DataFrame,
    group_cols: Sequence[str],
    keys_col: str,
    vals_col: str,
    **kw,
) -> DataFrame:
    """ClickHouse ``sumMap`` (see ``agg_map``)."""
    return agg_map(df, group_cols, keys_col, vals_col, how="sum", **kw)
