#!/usr/bin/env python
"""Engine benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE compact JSON line on stdout:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {"<name>": median_sec, ...}, "runs": N, "sf": <sf>}
Per-run arrays ({"queries_runs": ...}) go to STDERR: the round
driver keeps only a bounded tail of stdout, and r6's full line was
truncated past parseability -- medians are the comparable numbers,
the raw runs are diagnostics.

The FULL result (medians + per-run arrays) is also written to
``BENCH_LOCAL_r{N}.json`` at the repo root (N = newest BENCH_r*.json
round + 1, i.e. the round this run belongs to), committed at the next
round start alongside the driver artifacts: every pre-r7 BENCH_r*.json
lost most per-query data to stdout-tail truncation, so round-over-
round comparison needs a self-contained on-disk artifact (round-7
verdict #5).  Override the path with $SPARK_GRAFT_BENCH_OUT; set it
empty to skip the file.

Execution is forced through the noop sink so timings measure engine
compute (scan -> shuffle -> agg/join), not driver-side row
serialization.  Per-query time includes plan + execute.

Each query runs $SPARK_GRAFT_BENCH_RUNS times (default 3) in
interleaved passes (pass 1 runs every query once, then pass 2, ...)
and reports the per-query MEDIAN: single-run timings on this machine
swing up to 3x on identical code (measured round 1/2 -- the r2-vs-r1
comparison was 100% noise), so only medians are comparable
round-over-round.  `value` is the total of medians.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
RUNS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))

# headline set: the reference-parity chart queries, the join/agg
# benchmarks, and the training-data operators (dedup / similarity /
# text).  The STREAMING trio below IS benched -- availableNow drain
# wall-time is the engine number for ingest -- but listed separately
# because each run re-feeds and re-drains a stream end-to-end; the IO
# list is benched too but its numbers measure tmpfs write+read
# roundtrips as much as engine compute.  Every registry entry has a
# bench row (pinned by test_bench_covers_registry).
HEADLINE = [
    "visits_by_day",
    "traffic_sources",
    "metrica_traffic_chart",
    "metrica_visits_chart",
    "chsql_visits_chart",
    "chsql_traffic_chart",
    "where_alias",
    "union_reconcile",
    "sample_by",
    "last_significant_source",
    "sum_array_orders",
    "scd2_enrich",
    "top_customers_offset",
    "latest_event_per_user",
    "weekly_orders",
    "pricing_summary",
    "regional_revenue",
    "cdc_collapse",
    "ch_aggregates",
    "quantiles_exact",
    "quantiles_weighted",
    "funnel_depths",
    "funnel_strict",
    "sequence_match_gaps",
    "sequence_count",
    "retention_cohort",
    "orders_daily_fill",
    "fill_interpolate",
    "weighted_aggs",
    "running_diff_events",
    "orders_limit_by",
    "heavy_hitters_custkey",
    "price_histogram",
    "weekly_moving_avg",
    "array_funcs",
    "orders_semi_join",
    "customers_anti_join",
    "orders_rollup",
    "orders_cube",
    "geo_distance",
    "salted_hot_agg",
    "salted_join_revenue",
    "date_dims",
    "string_funcs",
    "url_funcs",
    "json_funcs",
    "chsql_word_count",
    "chsql_array_join",
    "chsql_daily_fill",
    "chsql_fill_interpolate",
    "chsql_limit_by",
    "chsql_final",
    "chsql_sample",
    "chsql_asof",
    "chsql_any_join",
    "chsql_model_final",
    "chsql_summap",
    "chsql_qualify",
    "chsql_distinct_on",
    "tfidf_top_terms",
    "bigram_lm_score",
    "shard_assign",
    "domain_quota",
    "dedup_keep_best",
    "sum_map_priority",
    "event_transitions",
    "delta_sum_events",
    "interval_coverage",
    "stats_moments",
    "type_entropy",
    "peak_concurrency",
    "cohort_matrix",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "paragraph_dedup",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_clusters",
    "contamination",
    "dedup_embedding",
    "ann_brute_topk",
    "ann_ivf_topk",
    "ann_ivf_exhaustive",
    "ann_ivf_served",
    "text_stats",
    "repetition_stats",
    "pii_scrub",
    "doc_fingerprint",
    "multimodal_meta",
    "multimodal_audio",
    "multimodal_video",
    "multimodal_frames",
    "scd2_range_join",
    "asof_enrich",
    "sessionize_hits",
    "pack_sequences",
    "curation_pipeline",
]

# streaming drain benchmarks: each build() feeds a fresh file stream
# and drains it with trigger(availableNow) before returning the
# result frame, so build+noop wall time IS the ingest drain time
# (feed synthesis included -- constant, small vs the drain at sf0.1).
STREAMING = [
    "streaming_roundtrip",
    "streaming_windowed",
    "streaming_dedup",
    "streaming_neardup",
]

# tmpfs-bound roundtrips: timed for completeness (registry coverage),
# but the number includes file write+read, not just engine compute.
IO = [
    "csv_export_roundtrip",
    "partition_probe",
    "chsql_s3_export",
    "chsql_federated_enrich",
]


def main() -> None:
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.queries.driver import QUERIES
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.session import get_spark

    spark = get_spark(
        app_name="ym-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS) if CPUS.isdigit() else 32,
    )
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen + Python-worker warmup (uncounted): tiny generic jobs
    # so the first measured query isn't charged for JIT, executor
    # spin-up, or Arrow worker fork.  Does not touch the benchmark
    # tables or pre-compile any query plan.
    spark.range(1_000_000).selectExpr("sum(id % 7)").write.mode(
        "overwrite"
    ).format("noop").save()

    def _identity(it):
        yield from it

    spark.range(1000).repartition(int(CPUS) if CPUS.isdigit() else 32).mapInPandas(
        _identity, schema="id long"
    ).write.mode("overwrite").format("noop").save()

    def release_storage() -> None:
        """Unpersist every cached/checkpointed RDD so one query's
        leftover storage (e.g. connected-components checkpoints,
        released asynchronously by the ContextCleaner) cannot bleed
        into the next query's timing."""
        try:
            jsc = spark.sparkContext._jsc.sc()
            it = jsc.getPersistentRDDs().values().iterator()
            while it.hasNext():
                it.next().unpersist(False)
        except Exception:
            pass  # cleanup is best-effort; timings just get noisier

    import statistics

    bench_set = HEADLINE + STREAMING + IO
    runs: dict[str, list[float]] = {name: [] for name in bench_set}
    for _pass in range(RUNS):
        for name in bench_set:
            spec = QUERIES[name]
            t0 = time.perf_counter()
            df = spec.build(spark, SF_DIR)
            df.write.mode("overwrite").format("noop").save()
            runs[name].append(round(time.perf_counter() - t0, 3))
            release_storage()

    timings = {name: round(statistics.median(r), 3) for name, r in runs.items()}
    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    result = {
        "metric": "headline_queries_total_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "runs": RUNS,
        "sf": sf_val,
    }
    out_path = os.environ.get("SPARK_GRAFT_BENCH_OUT")
    if out_path is None:
        import glob
        import re as _re

        here = os.path.dirname(os.path.abspath(__file__))
        rounds = [
            int(m.group(1))
            for p in glob.glob(os.path.join(here, "BENCH_r*.json"))
            if (m := _re.search(r"BENCH_r(\d+)\.json$", p))
        ]
        nxt = (max(rounds) + 1) if rounds else 1
        out_path = os.path.join(here, f"BENCH_LOCAL_r{nxt:02d}.json")
    if out_path:
        with open(out_path, "w") as fh:
            json.dump({**result, "queries_runs": runs}, fh, indent=1, sort_keys=True)
    print(json.dumps({"queries_runs": runs}), file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
