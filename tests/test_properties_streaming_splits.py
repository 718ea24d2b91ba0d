"""Micro-batch-boundary invariance for the streaming entries (r15
verdict task 4).

The partition-invariance sweep proves the BATCH entries are layout-
independent; this file proves the streaming analog: the SAME input
rows, chunked into 1 / 2 / 7 micro-batches, must land the SAME final
table.  A violation means cross-batch state (file-source offsets,
dedup hash state, windowed aggregation state, the near-dup signature
store) leaks batch-boundary artifacts into results — precisely the
bug class that cannot happen at 100 TB, where batch boundaries are an
accident of ingest timing.

Batch boundaries are pinned two ways, matching how each stream runs:

- single query + ``maxFilesPerTrigger=1`` over pre-written one-file
  chunks (dedup, windowed) — one micro-batch per file inside one
  availableNow drain;
- sequential drain-per-chunk against a SHARED checkpoint (append
  roundtrip, neardup, collapse merge, applyInPandasWithState
  latest-version tracker) — each restart picks up only the new file,
  the registry entries' own boundary-pinning pattern.

Documented semantic bands the assertions respect:

- streaming dedup keeps an ARBITRARY copy per distinct content
  (within-batch ``dropDuplicates`` tie): compared on the distinct
  content set + total count, like the registry oracle;
- the windowed test uses a generous watermark so no chunk order can
  make rows late — late-drop semantics are ST5's own tests, not a
  split artifact;
- near-dup triage is compared exactly ((doc_id, is_dup, dup_of))
  on ascending-id chunks of star-shaped clusters: arrival order =
  id order and no flagged-chain matches, so the documented
  earliest-wins greedy rule is split-deterministic.  Chain cases DO
  legally diverge across splits (docstring: at-ingest triage, not
  clustering) and are deliberately not asserted.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from yc_data_transfer_clickhouse_from_yandex_metrica_spark.streaming import cdc

SPLITS = (1, 2, 7)


def _chunks(df, n: int, order_col: str):
    """n ascending contiguous chunks by order_col (arrival order =
    key order, deterministic)."""
    rows = df.orderBy(order_col).collect()
    size = (len(rows) + n - 1) // n
    spark = df.sparkSession
    return [
        spark.createDataFrame(rows[i : i + size], df.schema)
        for i in range(0, len(rows), size)
    ]


def _events(spark):
    return spark.range(600).select(
        (F.col("id") % 40).alias("user_id"),
        F.timestamp_seconds(
            F.lit(1_650_000_000) + F.col("id") * 3600
        ).alias("ts"),
        F.element_at(
            F.array(F.lit("view"), F.lit("click"), F.lit("purchase")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("event_type"),
        F.col("id").alias("event_id"),
    )


def test_append_roundtrip_split_invariant(spark):
    src = _events(spark)
    want = sorted(
        (r["event_id"], r["user_id"], str(r["ts"]), r["event_type"])
        for r in src.collect()
    )
    results = {}
    for n in SPLITS:
        base = tempfile.mkdtemp(prefix=f"ym_split_app{n}_")
        try:
            feed, dest, chk = f"{base}/feed", f"{base}/dest", f"{base}/chk"
            os.makedirs(feed)
            for chunk in _chunks(src, n, "event_id"):
                chunk.coalesce(1).write.mode("append").parquet(feed)
                q = cdc.start_append_stream(
                    spark, feed, src.schema, dest, chk, date_col="ts"
                )
                assert q.awaitTermination(120), "drain did not terminate"
            got = sorted(
                (r["event_id"], r["user_id"], str(r["ts"]), r["event_type"])
                for r in spark.read.parquet(dest).collect()
            )
            results[n] = got
        finally:
            shutil.rmtree(base, ignore_errors=True)
    for n in SPLITS:
        assert results[n] == want, f"splits={n} diverged from source"


def test_dedup_split_invariant(spark):
    # 80 rows over 20 distinct texts (4 copies each), copies strewn
    # across the id range so every chunking splits duplicate groups
    docs = spark.range(80).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("content-"), F.col("id") % 20).alias("text"),
    )
    results = {}
    for n in SPLITS:
        base = tempfile.mkdtemp(prefix=f"ym_split_dd{n}_")
        try:
            feed, dest, chk = f"{base}/feed", f"{base}/dest", f"{base}/chk"
            os.makedirs(feed)
            for chunk in _chunks(docs, n, "doc_id"):
                chunk.coalesce(1).write.mode("append").parquet(feed)
            q = cdc.start_dedup_stream(
                spark, feed, docs.schema, dest, chk,
                content_cols=["text"], max_files_per_trigger=1,
            )
            assert q.awaitTermination(120), "drain did not terminate"
            out = spark.read.parquet(dest)
            results[n] = (
                out.count(),
                sorted(r["text"] for r in out.select("text").distinct().collect()),
            )
        finally:
            shutil.rmtree(base, ignore_errors=True)
    want_texts = sorted(f"content-{i}" for i in range(20))
    for n in SPLITS:
        count, texts = results[n]
        assert count == 20, f"splits={n}: cross-batch dedup state leaked"
        assert texts == want_texts, f"splits={n} content set diverged"


def test_windowed_counts_split_invariant(spark):
    import uuid

    src = _events(spark)  # 600 rows over ~25 days
    want = sorted(
        (str(r["day"]), r["event_type"], r["n"])
        for r in src.groupBy(
            F.col("ts").cast("date").alias("day"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    results = {}
    for n in SPLITS:
        base = tempfile.mkdtemp(prefix=f"ym_split_win{n}_")
        try:
            feed = f"{base}/feed"
            os.makedirs(feed)
            for chunk in _chunks(src, n, "event_id"):
                chunk.coalesce(1).write.mode("append").parquet(feed)
            name = f"split_win_{uuid.uuid4().hex[:8]}"
            # 90-day watermark: no chunk permutation can make a row
            # late, so this isolates state carry-over from ST5's
            # late-drop semantics
            q = cdc.start_windowed_counts_stream(
                spark, feed, src.schema, "ts", ["event_type"],
                window_len="1 day", watermark="90 days",
                query_name=name, max_files_per_trigger=1,
            )
            assert q.awaitTermination(120), "drain did not terminate"
            results[n] = sorted(
                (str(r["win_start"].date()), r["event_type"], r["n"])
                for r in spark.table(name).collect()
            )
        finally:
            shutil.rmtree(base, ignore_errors=True)
    for n in SPLITS:
        assert results[n] == want, f"splits={n} diverged from batch agg"


def _star_docs(spark):
    """12 star clusters: original (id c) + two near-dup tails
    (ids 100+2c, 101+2c) that each share 10 of 11 shingles with the
    original AND with each other THROUGH the original (every tail
    matches its original directly — no flagged-chain-only matches,
    the documented split-divergent case) — plus one unique doc."""
    rows = []
    for c in range(12):
        words = [f"c{c}w{i}" for i in range(12)]
        rows.append((c, " ".join(words)))
        rows.append((100 + 2 * c, " ".join(words + [f"c{c}extraA"])))
        rows.append((101 + 2 * c, " ".join(words + [f"c{c}extraB"])))
    rows.append((500, " ".join(f"unique{i}" for i in range(12))))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_neardup_triage_split_invariant(spark):
    docs = _star_docs(spark)
    results = {}
    for n in SPLITS:
        base = tempfile.mkdtemp(prefix=f"ym_split_nd{n}_")
        try:
            feed, dest = f"{base}/feed", f"{base}/dest"
            chk, state = f"{base}/chk", f"{base}/state"
            os.makedirs(feed)
            for chunk in _chunks(docs, n, "doc_id"):
                chunk.coalesce(1).write.mode("append").parquet(feed)
                q = cdc.start_neardup_stream(
                    spark, feed, docs.schema, dest, chk, state,
                    k=3, num_hashes=64, bands=32, threshold=0.5,
                )
                assert q.awaitTermination(180), "drain did not terminate"
            results[n] = sorted(
                (r["doc_id"], r["is_dup"], r["dup_of"])
                for r in spark.read.parquet(dest)
                .select("doc_id", "is_dup", "dup_of")
                .collect()
            )
        finally:
            shutil.rmtree(base, ignore_errors=True)
    # the expected triage under earliest-wins: originals + the unique
    # doc unflagged, every tail flagged against its cluster original
    want = sorted(
        [(c, False, None) for c in range(12)]
        + [(500, False, None)]
        + [(100 + 2 * c, True, c) for c in range(12)]
        + [(101 + 2 * c, True, c) for c in range(12)]
    )
    for n in SPLITS:
        assert results[n] == want, f"splits={n} triage diverged"


def test_collapse_split_invariant(spark):
    """The foreachBatch collapse merge: a well-formed sign ledger
    (monotone versions per key, cancel rows always appended after the
    state they cancel — the CDC wire contract collapsed() documents)
    chunked 1/2/7 ways in APPEND order must materialize the same
    collapsed table, equal to the batch collapse of the full ledger.
    Chunk boundaries may split a (cancel, new-state) update pair:
    monotone versions make that safe — the higher-version state wins
    whether or not the cancel landed in the same micro-batch."""
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import collapse as col_ops

    rows = []  # (seq, VisitID, VisitVersion, Sign, StartDate)
    seq = 0
    for k in range(50):
        date = f"2022-01-{3 + 7 * (k % 3):02d}"  # 3 distinct weeks
        n_ver = 1 + k % 4
        for v in range(1, n_ver + 1):
            if v > 1:
                rows.append((seq, k, v - 1, -1, date)); seq += 1
            rows.append((seq, k, v, 1, date)); seq += 1
        if k % 10 == 9:  # hard delete: trailing cancel of the latest
            rows.append((seq, k, n_ver, -1, date)); seq += 1
    ledger = spark.createDataFrame(
        rows,
        "seq long, VisitID long, VisitVersion long, Sign int, StartDate string",
    ).withColumn("StartDate", F.col("StartDate").cast("date"))

    want = sorted(
        (r["VisitID"], r["VisitVersion"], r["Sign"], str(r["StartDate"]))
        for r in col_ops.collapsed(ledger.drop("seq")).collect()
    )
    assert want, "fixture collapsed to nothing — test would be vacuous"

    results = {}
    for n in SPLITS:
        base = tempfile.mkdtemp(prefix=f"ym_split_col{n}_")
        try:
            feed, dest, chk = f"{base}/feed", f"{base}/dest", f"{base}/chk"
            os.makedirs(feed)
            for chunk in _chunks(ledger, n, "seq"):
                chunk.drop("seq").coalesce(1).write.mode("append").parquet(feed)
                q = cdc.start_collapse_stream(
                    spark, feed, ledger.drop("seq").schema, dest, chk,
                    key=["VisitID"], date_col="StartDate",
                )
                assert q.awaitTermination(120), "drain did not terminate"
            results[n] = sorted(
                (r["VisitID"], r["VisitVersion"], r["Sign"], str(r["StartDate"]))
                for r in spark.read.parquet(dest)
                .select("VisitID", "VisitVersion", "Sign", "StartDate")
                .collect()
            )
        finally:
            shutil.rmtree(base, ignore_errors=True)
    for n in SPLITS:
        assert results[n] == want, f"splits={n} diverged from batch collapse"


def test_latest_version_state_split_invariant(spark):
    """The applyInPandasWithState tracker (ST3 option c): per-key
    (version, net, live) resolution after ingesting the same ledger in
    1/2/7 micro-batches must match the pure-Python fold (maxv = max
    version, net = sum of signs AT maxv) for every chunking — the
    state transition is order-insensitive by construction (rows below
    the running max are ignored, rows at it accumulate, higher rows
    reset), so batch boundaries cannot show through."""
    import uuid

    rows = []  # (seq, VisitID, VisitVersion, Sign)
    seq = 0
    for k in range(30):
        n_ver = 1 + k % 3
        for v in range(1, n_ver + 1):
            if v > 1:
                rows.append((seq, k, v - 1, -1)); seq += 1
            rows.append((seq, k, v, 1)); seq += 1
        if k % 5 == 4:  # delete: same-version trailing cancel
            rows.append((seq, k, n_ver, -1)); seq += 1
    ledger = spark.createDataFrame(
        rows, "seq long, VisitID long, VisitVersion long, Sign int"
    )

    # pure-Python model
    want = {}
    for _, k, v, s in rows:
        maxv, net = want.get(k, (None, 0))
        if maxv is None or v > maxv:
            maxv, net = v, s
        elif v == maxv:
            net += s
        want[k] = (maxv, net)
    want = {k: (v, n, n > 0) for k, (v, n) in want.items()}

    for n in SPLITS:
        base = tempfile.mkdtemp(prefix=f"ym_split_state{n}_")
        try:
            feed, chk, cap = f"{base}/feed", f"{base}/chk", f"{base}/cap"
            os.makedirs(feed)

            def capture(batch, batch_id, _cap=cap):
                # the memory sink refuses checkpoint RECOVERY, so the
                # sequential drains capture through foreachBatch; the
                # shared checkpoint keeps batch_id monotone across
                # drains, giving a per-key "latest update" order
                batch.withColumn("_bid", F.lit(batch_id)).write.mode(
                    "append"
                ).parquet(_cap)

            for chunk in _chunks(ledger, n, "seq"):
                chunk.drop("seq").coalesce(1).write.mode("append").parquet(feed)
                q = (
                    cdc.latest_version_stream(
                        spark, feed, ledger.drop("seq").schema
                    )
                    .writeStream.foreachBatch(capture)
                    .queryName(f"lv_{uuid.uuid4().hex[:8]}")
                    .outputMode("update")
                    .option("checkpointLocation", chk)
                    .trigger(availableNow=True)
                    .start()
                )
                assert q.awaitTermination(120), "drain did not terminate"
            got = {}
            for r in sorted(
                spark.read.parquet(cap).collect(), key=lambda r: r["_bid"]
            ):
                got[r["key"]] = (r["version"], r["net"], r["live"])
            assert got == want, f"splits={n} diverged from the fold model"
        finally:
            shutil.rmtree(base, ignore_errors=True)


def test_windowed_counts_update_mode_split_invariant(spark):
    """Update mode is the bounded-state PRODUCTION path (the watermark
    evicts closed windows; the memory sink appends per-batch deltas,
    counts monotone per key).  Split invariance here: max(n) per
    (day, event_type) over the appended updates equals the batch
    ground truth for every chunking — a boundary-dependent watermark
    advance may change WHICH updates are emitted, never the final
    per-key maximum, given the generous watermark keeps every row on
    time."""
    import uuid

    src = _events(spark)
    want = sorted(
        (str(r["day"]), r["event_type"], r["n"])
        for r in src.groupBy(
            F.col("ts").cast("date").alias("day"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    for n in SPLITS:
        base = tempfile.mkdtemp(prefix=f"ym_split_winu{n}_")
        try:
            feed = f"{base}/feed"
            os.makedirs(feed)
            for chunk in _chunks(src, n, "event_id"):
                chunk.coalesce(1).write.mode("append").parquet(feed)
            name = f"split_winu_{uuid.uuid4().hex[:8]}"
            q = cdc.start_windowed_counts_stream(
                spark, feed, src.schema, "ts", ["event_type"],
                window_len="1 day", watermark="90 days",
                query_name=name, output_mode="update",
                max_files_per_trigger=1,
            )
            assert q.awaitTermination(120), "drain did not terminate"
            got = sorted(
                (str(r["day"]), r["event_type"], r["n"])
                for r in spark.table(name)
                .groupBy(
                    F.col("win_start").cast("date").alias("day"),
                    "event_type",
                )
                .agg(F.max("n").alias("n"))
                .collect()
            )
            assert got == want, f"splits={n} diverged from batch agg"
        finally:
            shutil.rmtree(base, ignore_errors=True)
