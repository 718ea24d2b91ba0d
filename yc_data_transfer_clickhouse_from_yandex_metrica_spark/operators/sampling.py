"""Deterministic hash sampling (SURVEY.md section 1.3, ``SAMPLE BY``).

The reference declares ``SAMPLE BY CounterUserIDHash``
(/root/reference/ddl/hits.sql:119, ddl/visits.sql:239): ClickHouse
serves ``SAMPLE 1/k`` by reading a contiguous range of the sample
column's hash space, so the same user always lands in the same sample
(consistent across tables sharing the key).

Spark analog: a pushed-down filter on the sample column.  Two modes:

- ``sample_mod``: ``pmod(col, k) == bucket`` -- reproducible in ANSI
  SQL (DuckDB oracle) when the column is already a hash/id.
- ``sample_hash``: ``pmod(xxhash64(col), k) == bucket`` -- for
  arbitrary columns; engine-deterministic (xxhash64 is stable across
  Spark versions/partitionings) but not portable to other engines.

Both are plain filters: Catalyst pushes them to the parquet scan, and
consistent-by-key sampling is preserved (same key -> same verdict).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sample_mod(df: DataFrame, col: str, k: int, bucket: int = 0) -> DataFrame:
    """Keep rows where ``col mod k == bucket`` (1/k deterministic sample)."""
    return df.where(F.pmod(F.col(col), F.lit(k)) == F.lit(bucket))


def sample_hash(df: DataFrame, col: str, k: int, bucket: int = 0, seed: int = 0) -> DataFrame:
    """1/k sample by stable hash of an arbitrary column."""
    return df.where(
        F.pmod(F.xxhash64(F.col(col), F.lit(seed)), F.lit(k)) == F.lit(bucket)
    )


def sample_expr(col: str, k: int, bucket: int = 0) -> Column:
    """The pushdown-able predicate itself (for composing into scans)."""
    return F.pmod(F.col(col), F.lit(k)) == F.lit(bucket)


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates: dict,
    denominator: int = 10_000,
) -> DataFrame:
    """Deterministic per-stratum sampling -- the data-mixing primitive
    (e.g. keep 100% of high-quality docs, 10% of medium, 1% of low).

    ``rates`` maps stratum value -> keep fraction; strata absent from
    the map are dropped.  Membership is decided by
    ``pmod(xxhash64(key), denominator) < rate * denominator``: the
    SAME key gets a consistent verdict across tables and runs (the
    ClickHouse SAMPLE-BY property), sampling composes monotonically
    (raising a rate only ADDS rows -- the kept set at 1% is a subset
    of the kept set at 10%), and the filter is a pure scan predicate:
    no shuffle, no rand(), safe under task retries.
    """
    bucket = F.pmod(F.xxhash64(F.col(key_col)), F.lit(denominator))
    verdict = F.lit(False)
    for stratum, rate in rates.items():
        thresh = int(round(rate * denominator))
        verdict = verdict | (
            (F.col(stratum_col) == F.lit(stratum)) & (bucket < F.lit(thresh))
        )
    return df.where(verdict)
