"""Skew mitigation: salting for hot keys (100TB posture).

Web-analytics fact tables are power-law-skewed by design: one hot
``CounterID`` (a big site) can hold a double-digit percent of all rows
(the reference's per-counter model, /root/reference/README.md:46), so
a shuffle hash-partitioned on the natural key puts that key's entire
volume on ONE reducer.  AQE's skew-join splitting
(``spark.sql.adaptive.skewJoin.enabled``, on in session.tune) handles
sort-merge joins at runtime; these helpers cover the two cases AQE
does not:

- ``salted_agg``    : skewed GROUP BY -- two-phase aggregate with an
                      explicit salt so the hot key's partial
                      aggregates spread over ``nsalt`` reducers, then
                      a tiny second aggregate merges the partials.
                      (Spark's partial aggregation already does this
                      when the map-side hash table fits; the salt
                      makes it robust for high-cardinality-payload
                      aggregates like collect_list/countDistinct
                      where map-side combine degenerates.)
- ``salted_join``   : skewed many-to-one equi-join WITHOUT broadcast
                      (dim too big): replicate each dim row ``nsalt``
                      times with a salt column, salt the fact side
                      with ``pmod(xxhash64(key), nsalt)``, join on
                      (key, salt).  Hot fact keys spread over nsalt
                      reducers; dim inflates by exactly nsalt.

Both are deterministic (hash-based salt, no rand()) so retried tasks
produce identical partitions -- required for exactly-once sinks.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def _salt_col(keys: Sequence[str], nsalt: int) -> Column:
    return F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(nsalt))


def with_salt(df: DataFrame, keys: Sequence[str], nsalt: int = 16) -> DataFrame:
    """Append a deterministic salt in [0, nsalt) that is INDEPENDENT of
    the keys -- it must differ across rows of the same hot key to
    spread them.  Derived from xxhash64 over the non-key columns when
    any exist (deterministic under retry), else from the source
    partition id (stable for deterministic scans)."""
    non_key = [c for c in df.columns if c not in keys]
    if non_key:
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in non_key]), F.lit(nsalt))
    else:
        salt = F.pmod(F.spark_partition_id().cast("long"), F.lit(nsalt))
    return df.withColumn(_SALT, salt)


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    nsalt: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregate for ALGEBRAIC aggregates.

    ``aggs`` maps output name -> phase-1 aggregate expression; phase 2
    re-aggregates with the matching merge function inferred from the
    expression's head (sum->sum, count->sum, min->min, max->max).
    For non-algebraic aggregates (countDistinct, collect_*) decompose
    manually (distinct-then-count etc.) -- they cannot be salted
    blindly.
    """
    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    phase1 = with_salt(df, keys, nsalt).groupBy(*keys, _SALT).agg(
        *[c.alias(n) for n, c in aggs.items()]
    )
    import re

    merged = []
    for n, c in aggs.items():
        head, distinct = "", False
        try:  # classic-mode column tree: exact function name + DISTINCT flag
            node = c._jc.node()
            head = node.functionName().lower()
            distinct = bool(node.isDistinct())
        except Exception:
            # fallback: parse the repr "Column<'sum(v)'>" (loses the
            # DISTINCT flag in Spark 4, hence the primary path above)
            body = str(c).split("'", 1)[1]
            m = re.match(r"(\w+)\(", body)
            head = m.group(1).lower() if m else ""
            distinct = "DISTINCT" in body
        # DISTINCT aggregates are NOT mergeable: the same value can
        # appear under several salts, so summing per-salt partials
        # overcounts -- reject them explicitly
        if head not in merge_fn or distinct:
            raise ValueError(
                "salted_agg only supports algebraic aggregates "
                f"(sum/count/min/max, no DISTINCT), got {head!r}"
                + (" DISTINCT" if distinct else "")
            )
        merged.append(merge_fn[head](F.col(n)).alias(n))
    return phase1.groupBy(*keys).agg(*merged)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    keys: Sequence[str],
    nsalt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skewed many-to-one equi-join without broadcast.

    The fact side gets a deterministic salt; the dim side is
    replicated once per salt value (explode over a literal sequence --
    dim grows nsalt-fold, still far below the fact).  The join key
    becomes (keys..., salt), so a hot key's rows land on nsalt
    reducers instead of one.
    """
    keys = list(keys)
    f = with_salt(fact, keys, nsalt)
    d = dim.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(nsalt - 1)).cast("array<long>"))
    )
    out = f.join(d, on=keys + [_SALT], how=how)
    return out.drop(_SALT)
