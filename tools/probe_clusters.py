#!/usr/bin/env python
"""Scale-curve probe for connected_components / dedup_clusters /
keep_best (r15 verdict task 5) — the last expensive family without a
16x probe like probe_neardup_stream's.

Measures, WITHOUT instrumenting the operator (external wall clocks +
a storage-poller thread reading getRDDStorageInfo):

1. pair-density curve: planted 8-chain clusters over the sf0.1
   documents ids at 1x / 4x / 16x pair counts, FIXED cluster shape so
   the propagation-cycle count is constant — per-iteration cost must
   track the pair count (wall ~linear in pairs), and peak checkpoint
   storage must track |edges| + |labels|, not corpus bytes;
2. early-exit: diameter-2 stars vs diameter-7 chains at the SAME pair
   count — the star run must cost about the max_iter=2 run, far below
   a hypothetical 20-cycle run (the loop exits on the first
   zero-change cycle, it never pads to max_iter);
3. corpus-independence: dedup_clusters/keep_best with FIXED pairs over
   the 500-doc sf0.01 corpus vs the 5000-doc sf0.1 corpus — only the
   final assignment join may grow, never the iteration cost.

Usage: python tools/probe_clusters.py
Prints one human-readable table; the measured numbers land in
PLANS.md (round 15 entry).
"""

from __future__ import annotations

import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import os

from pyspark.sql import functions as F

from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import corpus, dedup
from yc_data_transfer_clickhouse_from_yandex_metrica_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF_SMALL = SF.replace("sf0.1", "sf0.01")


class StoragePoller:
    """Samples total live RDD storage (the localCheckpoint blocks)
    every 100 ms while a run is in flight; peak bytes approximate the
    high-water checkpoint footprint the driver docstring bounds."""

    def __init__(self, spark):
        self._jsc = spark.sparkContext._jsc.sc()
        self.peak = 0
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._run, daemon=True)

    def _run(self):
        while not self._stop.is_set():
            total = 0
            for info in self._jsc.getRDDStorageInfo():
                total += info.memSize() + info.diskSize()
            self.peak = max(self.peak, total)
            time.sleep(0.1)

    def __enter__(self):
        self._t.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._t.join(timeout=2)


def chains(spark, n_pairs: int, chain_len: int = 8, id0: int = 0):
    """n_pairs edges as consecutive chains of chain_len nodes
    (chain_len-1 edges each): diameter chain_len-1, constant across
    densities."""
    epc = chain_len - 1
    return (
        spark.range(n_pairs)
        .select(
            (
                id0
                + (F.col("id") / epc).cast("long") * chain_len
                + F.col("id") % epc
            ).alias("id_a"),
        )
        .withColumn("id_b", F.col("id_a") + 1)
        .repartition(16)
    )


def stars(spark, n_pairs: int, fan: int = 7, id0: int = 0):
    """n_pairs edges as (fan+1)-node stars: diameter 2, same pair
    count as the chains at fan = chain_len - 1."""
    return (
        spark.range(n_pairs)
        .select(
            (id0 + (F.col("id") / fan).cast("long") * (fan + 1)).alias("id_a"),
            (
                id0
                + (F.col("id") / fan).cast("long") * (fan + 1)
                + F.col("id") % fan
                + 1
            ).alias("id_b"),
        )
        .repartition(16)
    )


def timed(fn):
    t0 = time.monotonic()
    out = fn()
    return out, time.monotonic() - t0


def main() -> None:
    spark = get_spark()
    docs_big = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id")
    docs_small = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id"
    )
    n_big = docs_big.count()
    n_small = docs_small.count()
    base_pairs = 7_000  # 1x: 1000 8-chains

    print(f"corpus sf0.1={n_big} docs, sf0.01={n_small} docs")
    print("\n-- 1. pair-density curve (8-chains, constant diameter 7) --")
    print(f"{'density':>8} {'pairs':>8} {'wall_s':>8} {'peak_ckpt_MB':>13} {'components':>11}")
    for mult in (1, 4, 16):
        pairs = chains(spark, base_pairs * mult).localCheckpoint()
        with StoragePoller(spark) as poll:
            lab, wall = timed(
                lambda: dedup.connected_components(pairs).collect()
            )
        comps = len({r["comp"] for r in lab})
        print(
            f"{mult:>7}x {base_pairs * mult:>8} {wall:>8.2f}"
            f" {poll.peak / 1e6:>13.1f} {comps:>11}"
        )

    print("\n-- 2. early-exit (same 16x pair count) --")
    for label, pair_fn, max_iter in (
        ("chain d=7, max_iter=20", chains, 20),
        ("star  d=2, max_iter=20", stars, 20),
        ("star  d=2, max_iter=2 ", stars, 2),
    ):
        pairs = pair_fn(spark, base_pairs * 16).localCheckpoint()
        lab, wall = timed(
            lambda: dedup.connected_components(
                pairs, max_iter=max_iter
            ).collect()
        )
        print(f"{label}: wall {wall:.2f}s  components {len({r['comp'] for r in lab})}")

    print("\n-- 3. corpus-independence (fixed 1x pairs, keep_best) --")
    if SF_SMALL == SF or not os.path.isdir(SF_SMALL):
        # replace() found nothing to rewrite (custom SF dir): comparing
        # a corpus against itself would FABRICATE an independence
        # result — refuse instead
        print(f"skipped: no sibling sf0.01 corpus next to {SF!r}")
        return
    # the SAME pair set for both corpora: chains over the id range the
    # smaller corpus covers, so only the assignment-join input grows
    fixed = (
        chains(spark, n_small - n_small // 8)
        .where((F.col("id_a") < n_small) & (F.col("id_b") < n_small))
        .localCheckpoint()
    )
    for name, docs, n in (("sf0.01", docs_small, n_small), ("sf0.1", docs_big, n_big)):
        pairs = fixed
        np = pairs.count()
        out, wall = timed(
            lambda: corpus.keep_best(
                docs, pairs, F.col("doc_id").cast("double"), "doc_id"
            ).collect()
        )
        kept = sum(1 for r in out if r["keep"])
        print(
            f"{name}: docs {n:>5} pairs {np:>5} wall {wall:.2f}s"
            f" rows {len(out)} kept {kept}"
        )


if __name__ == "__main__":
    main()
