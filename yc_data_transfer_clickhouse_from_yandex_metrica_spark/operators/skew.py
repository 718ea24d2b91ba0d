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

Both are deterministic (ordinal-based salt, no rand()) for
deterministic scans, so retried tasks produce identical partitions --
required for exactly-once sinks.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def with_salt(df: DataFrame, keys: Sequence[str], nsalt: int = 16) -> DataFrame:
    """Append a salt in [0, nsalt) that is INDEPENDENT of the keys --
    it must differ across rows of the same hot key to spread them,
    INCLUDING payload-identical duplicate rows (the duplicate-heavy
    corpus is exactly where skew bites, so a payload hash is the wrong
    source).  Round-robin over the per-partition row ordinal
    (``monotonically_increasing_id`` = partition id << 33 | row index)
    spreads every partition's rows exactly evenly and stays
    deterministic for a deterministic scan order, same as any
    ordinal-derived value under retry."""
    _ = keys  # salt is key-independent by construction
    return df.withColumn(
        _SALT, F.pmod(F.monotonically_increasing_id(), F.lit(nsalt))
    )


# phase-2 merge function per phase-1 head: sum-of-sums, sum-of-counts,
# min-of-mins, max-of-maxes.  DISTINCT aggregates are deliberately
# inexpressible: the same value can appear under several salts, so
# merging per-salt distinct partials overcounts.
_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, Column | str]],
    nsalt: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregate for ALGEBRAIC aggregates.

    ``aggs`` maps output name -> ``(head, column)`` with head one of
    ``sum/count/min/max``: phase 1 applies ``head`` per (keys, salt),
    phase 2 re-aggregates the partials with the matching merge
    function.  The spec is declarative -- no Column-tree introspection,
    so it works identically on classic and Spark Connect sessions.
    For non-algebraic aggregates (count_distinct, collect_*) decompose
    manually (distinct-then-count etc.) -- they cannot be salted
    blindly.
    """
    for n, (head, _c) in aggs.items():
        if head not in _MERGE:
            raise ValueError(
                "salted_agg only supports algebraic aggregates "
                f"(sum/count/min/max, no DISTINCT), got {head!r} for {n!r}"
            )
    phase1 = with_salt(df, keys, nsalt).groupBy(*keys, _SALT).agg(
        *[getattr(F, head)(c).alias(n) for n, (head, c) in aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[_MERGE[head](F.col(n)).alias(n) for n, (head, _c) in aggs.items()]
    )


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
