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
      group); null arrays count as size 0, so (null, []) passes —
      the size is computed null-first (``when(isNull, 0)``) because
      legacy ``size(null)`` is -1, not null, so a bare coalesce
      would never fire.
    - a group whose rows carry only empty/null arrays still appears
      in the output, with ``([], [])`` -- never silently dropped.
      This holds for NULL group keys too: restoration is join-free
      (``explode_outer`` filler rows ride the one real aggregation),
      so there is no equality join for a null key to fall out of.
    """
    if how not in _AGGS:
        raise ValueError(f"how must be one of {sorted(_AGGS)}, got {how!r}")

    def _sz(c: str):
        return F.when(F.col(c).isNull(), F.lit(0)).otherwise(F.size(c))

    nk = _sz(keys_col)
    nv = _sz(vals_col)
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
    # explode_outer keeps a filler row (p = NULL) for empty/null
    # arrays, so all-empty groups survive the aggregation itself —
    # no distinct-groups side plan, no restore join (a plain equality
    # join would also drop NULL group keys; eqNullSafe would block
    # hash-join null-skew tricks).  The __filler flag rides the
    # grouping key so a filler row can never merge with a genuine
    # null-key pair.
    pairs = checked.select(
        *group_cols,
        F.explode_outer(
            F.arrays_zip(
                F.col(keys_col).alias("k"), F.col(vals_col).alias("v")
            )
        ).alias("p"),
    ).select(
        *group_cols,
        F.col("p.k").alias("k"),
        F.col("p.v").alias("v"),
        F.col("p").isNull().alias("__filler"),
    )
    reduced = pairs.groupBy(*group_cols, "k", "__filler").agg(
        _AGGS[how]("v").alias("v")
    )
    key_type = df.schema[keys_col].dataType
    val_type = df.schema[vals_col].dataType
    # collect_list drops NULL elements, so filler rows contribute
    # nothing and an all-filler group packs to an empty array.
    packed = reduced.groupBy(*group_cols).agg(
        F.array_sort(
            F.collect_list(
                F.when(~F.col("__filler"), F.struct("k", "v"))
            )
        ).alias("__kv")
    )
    return packed.select(
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


def sum_map(
    df: DataFrame,
    group_cols: Sequence[str],
    keys_col: str,
    vals_col: str,
    **kw,
) -> DataFrame:
    """ClickHouse ``sumMap`` (see ``agg_map``)."""
    return agg_map(df, group_cols, keys_col, vals_col, how="sum", **kw)
