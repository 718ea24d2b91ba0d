"""Warehouse layout module (SURVEY.md section 1.3 / M3).

Re-expresses the reference's MergeTree physical declarations as
Parquet-lake layout:

- ``PARTITION BY toMonday(date)``  (ddl/hits.sql:114, ddl/visits.sql:234)
    -> Hive-style weekly partition dirs => Catalyst partition pruning
       for the date-range predicates every reference query carries.
- ``ORDER BY (CounterID, Date, CounterUserIDHash, ...)``
    (ddl/hits.sql:115-118) -> ``sortWithinPartitions`` on write =>
       parquet row-group min/max skipping approximates the primary key.
- ``SAMPLE BY CounterUserIDHash`` (ddl/hits.sql:119) -> recorded in
       table metadata; served by operators.sampling predicates.
- cleanup policy Drop/Truncate/Disabled
    (terraform/data-transfer-endpoint.tf:15) -> write mode mapping.

At 100TB: weekly partitions x maxRecordsPerFile keep files bounded;
writes stay fully parallel (no coalesce); the sort is within partition
only (no global sort barrier).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import ch

WEEK_COL = "_week"
_META = "_table_meta.json"


@dataclass
class TableLayout:
    """Declarative physical layout, the MergeTree-declaration analog."""

    date_col: str
    sort_by: list[str] = field(default_factory=list)
    sample_by: str | None = None
    max_records_per_file: int = 5_000_000


def write_table(
    df: DataFrame,
    path: str,
    layout: TableLayout,
    mode: str = "append",
    cleanup: str = "disabled",  # disabled|truncate|drop -- tf:15 mapping
) -> None:
    if cleanup in ("truncate", "drop") and os.path.exists(path):
        import shutil

        shutil.rmtree(path)
    out = df.withColumn(WEEK_COL, ch.to_monday(F.col(layout.date_col)))
    if layout.sort_by:
        # repartitionByRange on (week, sort keys), NOT repartition(week):
        # hash-partitioning by week value caps write parallelism at the
        # number of weeks and funnels a hot week through ONE task (at
        # 100TB every week is hot).  Range partitioning splits each week
        # across ~shuffle.partitions/n_weeks tasks along the sort keys,
        # and rows arrive already range-clustered so the within-partition
        # sort is cheap and file row-group min/max stay tight.
        out = out.repartitionByRange(
            F.col(WEEK_COL), *[F.col(c) for c in layout.sort_by]
        ).sortWithinPartitions(WEEK_COL, *layout.sort_by)
    (
        out.write.mode(mode)
        .option("maxRecordsPerFile", layout.max_records_per_file)
        .partitionBy(WEEK_COL)
        .parquet(path)
    )
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, _META), "w") as f:
        json.dump(
            {
                "date_col": layout.date_col,
                "sort_by": layout.sort_by,
                "sample_by": layout.sample_by,
            },
            f,
        )


def write_bucketed(
    df: DataFrame,
    spark: SparkSession,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed catalog table -- the co-located-join layout.

    Two tables bucketed the SAME way on their join key (e.g.
    ``CounterID``, the reference's leading ORDER BY / implicit
    distribution key, ddl/hits.sql:115) join with NO exchange on
    either side: at 100TB that deletes the dominant shuffle of
    fact-to-fact joins (hits x visits by counter/user).  Bucket
    pruning also serves point predicates on the bucket column.
    Requires saveAsTable (bucket metadata lives in the catalog);
    plan-asserted in tests via absence of Exchange under the join.
    """
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """Read back; the weekly partition column stays available for
    explicit pruning, and date predicates on it prune directories."""
    return spark.read.parquet(path)


def table_meta(path: str) -> dict:
    with open(os.path.join(path, _META)) as f:
        return json.load(f)


def prune_weeks(df: DataFrame, date_from, date_to) -> DataFrame:
    """Date-range filter expressed on BOTH the partition column and the
    raw date column: the first prunes directories, the second prunes
    row groups within boundary weeks."""
    return df.where(
        (F.col(WEEK_COL) >= ch.to_monday(F.lit(date_from)))
        & (F.col(WEEK_COL) <= ch.to_monday(F.lit(date_to)))
    )


def value_hash(df: DataFrame) -> int:
    """Order-insensitive content hash: sum of per-row xxhash64 over all
    columns (null-safe).  Used by reconcile() to extend the reference's
    count check (README.md:159-168) to full-value equality."""
    cols = [F.coalesce(F.col(c).cast("string"), F.lit("\0")) for c in sorted(df.columns)]
    row = df.select(F.xxhash64(*cols).alias("h"))
    return row.agg(F.sum("h")).collect()[0][0] or 0


def reconcile(src: DataFrame, sink: DataFrame) -> dict:
    res = {
        "src_count": src.count(),
        "sink_count": sink.count(),
        "src_hash": value_hash(src),
        "sink_hash": value_hash(sink),
    }
    res["equal"] = (
        res["src_count"] == res["sink_count"] and res["src_hash"] == res["sink_hash"]
    )
    return res
