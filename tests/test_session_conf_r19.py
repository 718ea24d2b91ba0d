"""r19 optimization: the codegen compile-cache must outsize the registry.

``spark.sql.codegen.cache.maxEntries`` is a STATIC conf (only settable
at session build).  The Spark default of 100 entries is smaller than
ONE pass over this engine's registry (~1,350 distinct whole-stage
codegen units across the 105 entries), so any workload that cycles the
registry — the bench, the driver's correctness sweep, a production
dashboard mix — evicts the entire cache every pass and re-pays janino
compile plus fresh-class JIT warmup for every query every time.
Measured (alternated sessions, two full registry cycles each): warm
cycle 134.4/144.8 s at the default vs 115.0/116.3 s at 5000, with
~1,873 vs ~36 compiles per cycle.

This pins the conf at the session factory so the regression cannot
sneak back via a builder refactor.
"""

from __future__ import annotations

from yc_data_transfer_clickhouse_from_yandex_metrica_spark.session import tune


def test_codegen_cache_outsizes_registry(spark):
    # the shared test session is built by get_spark, so the static
    # conf must be visible on it
    assert int(spark.conf.get("spark.sql.codegen.cache.maxEntries")) >= 5000


def test_tune_preserves_codegen_cache(spark):
    # tune() is re-applied by every query builder (_prep); it must not
    # try to downgrade the static conf (static confs are not
    # runtime-settable -- a set attempt would raise inside tune's
    # guarded loop and silently no-op, but assert the end state anyway).
    # Restore the session fixture's shuffle partitioning afterwards:
    # tune() without shuffle_partitions resets it to the
    # SPARK_GRAFT_CPUS default, a side effect later tests must not
    # inherit (r19 ADVICE).
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        tune(spark)
        assert (
            int(spark.conf.get("spark.sql.codegen.cache.maxEntries")) >= 5000
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
