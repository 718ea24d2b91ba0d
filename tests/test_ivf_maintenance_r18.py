"""Round-18 IVF index maintenance surface (r17 verdict #4).

``append_ivf_index`` writes one file set per batch into each ``cid=``
directory; a real ingest cadence therefore accumulates small files
per list and list-size skew under drift.  ``index_stats`` exposes the
rebuild/compact decision signals as a library call and
``compact_ivf_index`` rewrites only the dirty lists — preserving the
centroid sidecar (and its mtime-keyed serving cache) and serving
results bit-identically.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import similarity


def _vectors(spark, lo, hi, dim=6, seed=23):
    rng = np.random.RandomState(seed + lo)
    rows = [
        (i, [float(x) for x in rng.normal(size=dim)]) for i in range(lo, hi)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


@pytest.fixture()
def appended_index(spark):
    """An index grown by several appends: base build + 4 batches."""
    base = tempfile.mkdtemp(prefix="ym_r18_maint_")
    path = f"{base}/idx"
    first = _vectors(spark, 0, 80)
    cents = similarity.train_centroids(first, nlist=4)
    similarity.write_ivf_index(first, cents, path)
    for b in range(4):
        similarity.append_ivf_index(
            _vectors(spark, 80 + 30 * b, 110 + 30 * b), path
        )
    yield path, cents
    shutil.rmtree(base, ignore_errors=True)


def test_index_stats_counts_rows_files_and_skew(spark, appended_index):
    path, cents = appended_index
    stats = similarity.index_stats(spark, path)
    assert stats["nlist"] == len(cents)
    assert stats["rows"] == 200  # 80 base + 4 x 30 appended
    assert 1 <= stats["lists"] <= len(cents)
    # every batch lands at least one file somewhere; the max per list
    # must exceed a single build's output
    assert stats["files"] >= stats["max_files_per_list"] > 1
    assert stats["skew"] >= 1.0
    per_cid = stats["per_cid"]
    assert sum(v["rows"] for v in per_cid.values()) == 200
    assert all(v["bytes"] > 0 for v in per_cid.values() if v["files"])
    # stats agree with the frame itself
    actual = {
        r["cid"]: r["n"]
        for r in spark.read.parquet(path).groupBy("cid").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert {c: v["rows"] for c, v in per_cid.items() if v["rows"]} == actual


def test_compact_bounds_files_and_serves_identically(spark, appended_index):
    path, cents = appended_index
    qs = _vectors(spark, 500, 506).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    before_rows = {
        tuple(r)
        for r in similarity.ivf_topk_pruned(
            spark, path, qs, k=5, nprobe=3
        ).collect()
    }
    sidecar_before = similarity.read_centroid_sidecar(spark, path)
    sidecar_file = os.path.join(path, "_centroids.json")
    mtime_before = os.path.getmtime(sidecar_file)

    report = similarity.compact_ivf_index(
        spark, path, max_files_per_list=2, target_files_per_list=1
    )
    assert report["files_before"], "appended index should have dirty lists"
    for cid, n in report["files_after"].items():
        assert n <= 1, (cid, n)
        assert n < report["files_before"][cid]
    stats = similarity.index_stats(spark, path)
    assert stats["max_files_per_list"] <= 2
    assert stats["rows"] == 200  # nothing lost

    # sidecar untouched: same file mtime, cache returns the SAME array
    assert os.path.getmtime(sidecar_file) == mtime_before
    assert similarity.read_centroid_sidecar(spark, path) is sidecar_before

    after_rows = {
        tuple(r)
        for r in similarity.ivf_topk_pruned(
            spark, path, qs, k=5, nprobe=3
        ).collect()
    }
    assert after_rows == before_rows and after_rows

    # idempotent: a second pass finds nothing dirty
    again = similarity.compact_ivf_index(
        spark, path, max_files_per_list=2, target_files_per_list=1
    )
    assert again == {"files_before": {}, "files_after": {}}


def test_compact_target_above_one_bounds_per_list(spark, appended_index):
    path, _ = appended_index
    report = similarity.compact_ivf_index(
        spark, path, max_files_per_list=2, target_files_per_list=2
    )
    assert report["files_before"]
    assert all(n <= 2 for n in report["files_after"].values())
    assert similarity.index_stats(spark, path)["rows"] == 200


def test_compact_never_touches_clean_lists(spark):
    """'Clean lists are never read, never touched' pinned at the FILE
    level: dirty exactly one list (append only vectors that assign to
    it), compact, and assert every other list's file set is
    byte-identical (same names, same sizes, same mtimes)."""
    base = tempfile.mkdtemp(prefix="ym_r18_clean_")
    try:
        path = f"{base}/idx"
        vecs = _vectors(spark, 0, 80)
        cents = similarity.train_centroids(vecs, nlist=4)
        similarity.write_ivf_index(vecs, cents, path)
        # normalize: one file per list, so post-state is unambiguous
        similarity.compact_ivf_index(
            spark, path, max_files_per_list=0, target_files_per_list=1
        )
        # pick the busiest cid and append ONLY vectors assigned to it
        stats0 = similarity.index_stats(spark, path)
        hot = max(stats0["per_cid"], key=lambda c: stats0["per_cid"][c]["rows"])
        batch = _vectors(spark, 1000, 1200)
        hot_ids = [
            r["nn_id"]
            for r in similarity.assign_lists(batch, cents)
            .where(F.col("cid") == hot)
            .select("nn_id")
            .collect()
        ]
        assert hot_ids, "seeded batch must hit the busiest list"
        for _ in range(3):
            similarity.append_ivf_index(
                batch.where(F.col("vec_id").isin(hot_ids)).limit(10), path
            )

        def snapshot(cid):
            d = os.path.join(path, f"cid={cid}")
            return sorted(
                (f, os.path.getsize(os.path.join(d, f)),
                 os.path.getmtime(os.path.join(d, f)))
                for f in os.listdir(d)
                if f.endswith(".parquet")
            )

        clean = [c for c in stats0["per_cid"] if c != hot]
        before = {c: snapshot(c) for c in clean}
        report = similarity.compact_ivf_index(
            spark, path, max_files_per_list=2, target_files_per_list=1
        )
        assert set(report["files_before"]) == {hot}
        assert report["files_after"][hot] <= 1
        assert {c: snapshot(c) for c in clean} == before
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_rebuild_retrains_into_a_fresh_index(spark, appended_index):
    """rebuild_ivf_index = the drift fix as a library call: fresh
    centroids trained on the corpus read back from the index, a new
    sidecar'd layout at dest (rows preserved, nlist defaulted from
    the source sidecar), serving works against it, and the footguns
    refuse (in-place rebuild; sidecar-less source)."""
    path, cents = appended_index
    dest = path + "_rebuilt"
    stats = similarity.rebuild_ivf_index(spark, path, dest)
    assert stats["rows"] == 200 and stats["nlist"] == len(cents)
    new_cents = similarity.read_centroid_sidecar(spark, dest)
    assert isinstance(new_cents, np.ndarray) and len(new_cents) == len(cents)

    qs = _vectors(spark, 700, 704).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = similarity.ivf_topk_pruned(spark, dest, qs, k=4, nprobe=2)
    assert out.count() == 4 * 4

    # overlap refusals on QUALIFIED paths: same path (trailing slash,
    # '//' spelling, scheme alias) and nesting in either direction
    for bad in (
        path + "/",
        path.replace("/idx", "//idx"),
        "file://" + path,
        path + "/nested",
        # '..' aliasing: lexically different, resolves to the source
        os.path.dirname(path) + "/elsewhere/../" + os.path.basename(path),
    ):
        with pytest.raises(ValueError, match="overlap"):
            similarity.rebuild_ivf_index(spark, path, bad)
    with pytest.raises(ValueError, match="overlap"):
        similarity.rebuild_ivf_index(spark, path, os.path.dirname(path))
    with pytest.raises(ValueError, match="sidecar"):
        similarity.rebuild_ivf_index(spark, f"{path}_nowhere", dest + "2")

    # explicit nlist overrides the sidecar default
    dest3 = path + "_rb3"
    stats3 = similarity.rebuild_ivf_index(spark, path, dest3, nlist=2)
    assert stats3["nlist"] == 2 and stats3["rows"] == 200


def test_streaming_ivf_append_lifecycle(spark):
    """append_ivf_index_stream: a file-backed embedding stream drains
    into a persisted index (availableNow), a second drain over the
    same checkpoint ingests only NEW files, serving equals a one-shot
    build over the same vectors, replayed batch ids are skipped via
    the ingest-progress sidecar, and a foreign checkpoint lineage is
    refused."""
    base = tempfile.mkdtemp(prefix="ym_r18_ivfstream_")
    try:
        path, src, ckpt = f"{base}/idx", f"{base}/src", f"{base}/ckpt"
        first = _vectors(spark, 0, 80)
        cents = similarity.train_centroids(first, nlist=4)
        similarity.write_ivf_index(first, cents, path)

        _vectors(spark, 200, 260).write.parquet(src)
        stream = spark.readStream.schema(
            "vec_id long, embedding array<double>"
        ).parquet(src)
        q = similarity.append_ivf_index_stream(stream, path, ckpt)
        q.awaitTermination(120)
        assert similarity.index_stats(spark, path)["rows"] == 140

        # second drain over the SAME checkpoint: only the new file
        _vectors(spark, 400, 430).write.mode("append").parquet(src)
        q2 = similarity.append_ivf_index_stream(stream, path, ckpt)
        q2.awaitTermination(120)
        assert similarity.index_stats(spark, path)["rows"] == 170

        # serving == one-shot build over the same vectors
        qs = _vectors(spark, 900, 904).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        oneshot = f"{base}/oneshot"
        similarity.write_ivf_index(
            first.unionAll(_vectors(spark, 200, 260)).unionAll(
                _vectors(spark, 400, 430)
            ),
            cents,
            oneshot,
        )
        as_set = lambda df: {tuple(r) for r in df.collect()}
        got = as_set(similarity.ivf_topk_pruned(spark, path, qs, k=5, nprobe=3))
        want = as_set(
            similarity.ivf_topk_pruned(spark, oneshot, qs, k=5, nprobe=3)
        )
        assert got == want and got

        # the recorded lineage is the QUALIFIED checkpoint location
        lineage = similarity._qualified(spark, ckpt)
        prog = similarity._read_ingest_progress(spark, path)
        assert prog["checkpoint"] == lineage and prog["last_batch"] >= 0
        # no .tmp residue from the atomic sidecar writes
        assert not [
            f for f in os.listdir(path) if f.endswith(".json.tmp")
        ]

        # replayed batch id: the progress sidecar makes the apply a
        # no-op — mark future batch ids as already applied, deliver a
        # new file, and the drain must append nothing
        similarity._write_ingest_progress(
            spark, path, {"checkpoint": lineage, "last_batch": 10_000}
        )
        _vectors(spark, 600, 610).write.mode("append").parquet(src)
        # equivalent spelling of the SAME checkpoint resumes (the
        # lineage identity is qualified, not the raw argument string)
        q3 = similarity.append_ivf_index_stream(
            stream, path, "file://" + ckpt
        )
        q3.awaitTermination(120)
        assert similarity.index_stats(spark, path)["rows"] == 170

        # per-batch lineage re-check: a batch applying against a
        # progress record from ANOTHER lineage fails loudly instead
        # of silently comparing foreign batch ids (two fresh streams
        # racing one index)
        with pytest.raises(RuntimeError, match="lineage"):
            similarity._ingest_apply(
                _vectors(spark, 800, 805), 0, path,
                similarity._qualified(spark, f"{base}/ckptB"), None,
                "vec_id", "embedding", None, None,
            )
        assert similarity.index_stats(spark, path)["rows"] == 170

        # a recreated checkpoint (same location, new query id) is NOT
        # a resume: its batch ids restart at 0 and would be skipped
        # as replays — refused at start AND per-batch
        similarity._write_ingest_progress(
            spark, path,
            {"checkpoint": lineage, "query_id": "old-query-id",
             "last_batch": 10_000},
        )
        with pytest.raises(ValueError, match="recreated"):
            similarity.append_ivf_index_stream(stream, path, ckpt)
        with pytest.raises(RuntimeError, match="recreated"):
            similarity._ingest_apply(
                _vectors(spark, 800, 805), 0, path, lineage,
                "new-query-id", "vec_id", "embedding", None, None,
            )
        assert similarity.index_stats(spark, path)["rows"] == 170

        # foreign checkpoint lineage refuses at start too
        with pytest.raises(ValueError, match="lineage"):
            similarity.append_ivf_index_stream(stream, path, f"{base}/ckpt2")
        # sidecar-less index refuses
        with pytest.raises(ValueError, match="sidecar"):
            similarity.append_ivf_index_stream(
                stream, f"{base}/nowhere", ckpt
            )
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_compact_refuses_sidecar_less_layout(spark):
    base = tempfile.mkdtemp(prefix="ym_r18_nosc_")
    try:
        path = f"{base}/tbl"
        vecs = _vectors(spark, 0, 40)
        cents = similarity.train_centroids(vecs, nlist=3)
        similarity.assign_lists(vecs, cents).write.partitionBy(
            "cid"
        ).parquet(path)
        with pytest.raises(ValueError, match="sidecar"):
            similarity.compact_ivf_index(spark, path)
        with pytest.raises(ValueError, match="target_files_per_list"):
            similarity.compact_ivf_index(spark, path, target_files_per_list=0)
    finally:
        shutil.rmtree(base, ignore_errors=True)
