#!/usr/bin/env python
"""Scale probe for streaming/cdc.start_neardup_stream (r13 verdict
task 4): drive 16 equal micro-batches of sf0.1 documents through the
ingest near-dup stream and record, per batch,

- drain wall seconds (flat-cost claim: per-batch cost must not grow
  with the accumulated store beyond the store-scan term),
- signature-store on-disk bytes (== the bytes the NEXT batch's store
  read scans: the store is re-read whole each micro-batch) vs the
  landed corpus bytes (signatures-only claim: the ratio must stay at
  the 8*num_hashes-bytes-per-doc level, orders of magnitude below
  the corpus),
- docs retained in the store and dups flagged.

Each batch carries ~10% texts copied from batch 0 under fresh ids, so
store-vs-batch candidates exist in every drain (the store join does
real work; a probe without cross-batch dups would never exercise it).

Usage: python tools/probe_neardup_stream.py [n_batches]
"""

from __future__ import annotations

import shutil
import subprocess
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import os

from pyspark.sql import functions as F

from yc_data_transfer_clickhouse_from_yandex_metrica_spark.session import get_spark
from yc_data_transfer_clickhouse_from_yandex_metrica_spark.streaming import cdc

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def du(path: str) -> int:
    p = Path(path)
    if not p.exists():
        return 0
    out = subprocess.run(
        ["du", "-sb", path], capture_output=True, text=True, check=True
    )
    return int(out.stdout.split()[0])


def main(n_batches: int) -> int:
    spark = get_spark()
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .orderBy("doc_id")
    )
    n = docs.count()
    per = n // n_batches
    print(f"{n} docs -> {n_batches} batches of {per}")

    base = tempfile.mkdtemp(prefix="ym_neardup_probe_")
    feed, dest = f"{base}/feed", f"{base}/warehouse"
    chk, state = f"{base}/checkpoint", f"{base}/state"
    sig_dir = f"{state}/sigs"

    # batch b = docs [b*per, (b+1)*per) under shifted ids; for b >= 1
    # the first 10% of texts are REPLACED by batch-0 texts so the
    # store join has real matches every drain
    from pyspark.sql.window import Window

    ranked = docs.withColumn(
        "rn", F.row_number().over(Window.orderBy("doc_id")) - 1
    )
    b0_texts = ranked.where(F.col("rn") < per).select(
        F.col("rn").alias("slot"), F.col("text").alias("t0")
    )

    rows = []
    schema = None
    for b in range(n_batches):
        batch = (
            ranked.where(
                (F.col("rn") >= b * per) & (F.col("rn") < (b + 1) * per)
            )
            .select(
                (F.lit(b * 1_000_000) + F.col("rn") - b * per).alias(
                    "doc_id"
                ),
                "text",
                (F.col("rn") - b * per).alias("slot"),
            )
        )
        if b > 0:
            batch = (
                batch.join(b0_texts, "slot", "left")
                .select(
                    "doc_id",
                    F.when(
                        F.col("slot") < int(per * 0.1), F.col("t0")
                    ).otherwise(F.col("text")).alias("text"),
                )
            )
        else:
            batch = batch.select("doc_id", "text")
        if schema is None:
            schema = batch.schema
        store_bytes_before = du(sig_dir)
        batch.repartition(1).write.mode("append").parquet(feed)
        t0 = time.time()
        q = cdc.start_neardup_stream(
            spark, feed, schema, dest, chk, state,
            k=3, num_hashes=64, bands=32, threshold=0.4,
        )
        if not q.awaitTermination(600):
            # a still-running drain would let the loop read partial
            # state and start a second query on the same checkpoint
            q.stop()
            raise RuntimeError(f"batch {b} drain exceeded 600s; aborting probe")
        wall = time.time() - t0
        store_bytes = du(sig_dir)
        corpus_bytes = du(dest)
        store_docs = spark.read.parquet(sig_dir).count()
        landed = spark.read.parquet(dest)
        dups = landed.where(F.col("is_dup")).count()
        rows.append(
            (b, wall, store_bytes_before, store_bytes, corpus_bytes,
             store_docs, dups)
        )
        print(
            f"batch {b:2d}: wall {wall:5.1f}s  store-scan "
            f"{store_bytes_before:>9d}B  store-after {store_bytes:>9d}B "
            f"({store_bytes / max(store_docs, 1):.0f} B/doc, "
            f"{store_docs} docs)  corpus {corpus_bytes:>10d}B  "
            f"ratio {store_bytes / max(corpus_bytes, 1):.4f}  "
            f"dups-total {dups}"
        )

    first_half = [w for _, w, *_ in rows[1 : n_batches // 2]]
    second_half = [w for _, w, *_ in rows[n_batches // 2 :]]
    import statistics

    if first_half and second_half:  # needs >= 4 batches for the split
        m1, m2 = statistics.median(first_half), statistics.median(second_half)
        print(
            f"\nper-batch wall: first-half median {m1:.1f}s, "
            f"second-half median {m2:.1f}s (flat-cost ratio {m2 / m1:.2f})"
        )
    else:
        print("\n(too few batches for the flat-cost split; see per-batch lines)")
    last = rows[-1]
    print(
        f"final store/corpus byte ratio: {last[3] / max(last[4], 1):.4f} "
        f"({last[3] / max(last[5], 1):.0f} B/doc retained)"
    )
    shutil.rmtree(base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 16))
