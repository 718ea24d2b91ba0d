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


_DRIVER = "com.clickhouse.jdbc.ClickHouseDriver"


@dataclass
class JdbcConn:
    """Any JDBC endpoint: url + driver class + credentials.  The
    option-builders and read/write paths are driver-agnostic; tests
    exercise them LIVE against Spark's embedded Derby (the only JDBC
    engine shipped in this container), and ClickHouseConn specializes
    the url/driver for the reference warehouse."""

    jdbc_url: str
    driver: str
    user: str = ""
    password: str = ""

    @property
    def url(self) -> str:
        return self.jdbc_url


@dataclass
class ClickHouseConn:
    host: str
    port: int = 8123
    database: str = "default"
    user: str = "default"
    password: str = ""
    driver: str = _DRIVER

    @property
    def url(self) -> str:
        return f"jdbc:clickhouse://{self.host}:{self.port}/{self.database}"


def reader_options(
    conn: ClickHouseConn | JdbcConn,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> dict[str, str]:
    """The exact option map handed to ``spark.read.format("jdbc")``.
    Pure (no session, no server) so tests can golden-assert the URL,
    driver class, and parallel-range settings a live ClickHouse would
    receive."""
    opts = {
        "url": conn.url,
        "dbtable": table,
        "user": conn.user,
        "password": conn.password,
        "driver": conn.driver,
    }
    if partition_column is not None:
        opts.update(
            {
                "partitionColumn": partition_column,
                "numPartitions": str(num_partitions),
                "lowerBound": str(lower_bound if lower_bound is not None else 0),
                "upperBound": str(upper_bound if upper_bound is not None else 1 << 31),
            }
        )
    return opts


def writer_options(conn: ClickHouseConn | JdbcConn, table: str) -> dict[str, str]:
    """Option map for the JDBC sink (batched inserts)."""
    return {
        "url": conn.url,
        "dbtable": table,
        "user": conn.user,
        "password": conn.password,
        "driver": conn.driver,
        "batchsize": str(100_000),
    }


def read_table(
    spark: SparkSession,
    conn: ClickHouseConn | JdbcConn,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> DataFrame:
    """Parallel JDBC read.  partition_column should be a dense numeric
    key (CounterID / CounterUserIDHash) so each executor pulls an
    independent range -- a single-connection read does not scale."""
    return (
        spark.read.format("jdbc")
        .options(
            **reader_options(
                conn, table, partition_column, num_partitions,
                lower_bound, upper_bound,
            )
        )
        .load()
    )


def write_table(
    df: DataFrame, conn: ClickHouseConn | JdbcConn, table: str, mode: str = "append"
) -> None:
    (
        df.write.format("jdbc")
        .options(**writer_options(conn, table))
        .mode(mode)
        .save()
    )
