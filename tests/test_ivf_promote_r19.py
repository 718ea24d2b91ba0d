"""Round-19 IVF surface: the four r18 ADVICE closures, the
metadata-cheap ``index_stats`` (r18 verdict #4), and the blue/green
``promote_ivf_index`` swap that completes the rebuild lifecycle (r18
verdict #5 / missing #2).

Advice closures pinned here:

1. sidecar absence is matched by java exception CLASS (walking the
   cause chain), never by substring over the rendered trace — a
   non-FNF failure whose message mentions FNF must RAISE, not read as
   'no sidecar' (which would silently disable the ingest replay
   guard for that batch);
2. a publish that crashed in the delete->rename gap (``.tmp`` present,
   destination missing) refuses loudly instead of reporting a fresh
   state;
3. every cached/memoized serving array is frozen
   (``writeable=False``) so in-place mutation raises instead of
   poisoning the identity-keyed memos;
4. ``compact_ivf_index`` refuses a target above the dirtiness
   threshold (it could never converge to a no-op).
"""

from __future__ import annotations

import json
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
def built_index(spark):
    """A freshly built 80-row / 4-list index in a scratch dir."""
    base = tempfile.mkdtemp(prefix="ym_r19_promote_")
    path = f"{base}/idx"
    vecs = _vectors(spark, 0, 80)
    cents = similarity.train_centroids(vecs, nlist=4)
    similarity.write_ivf_index(vecs, cents, path)
    yield base, path, cents
    shutil.rmtree(base, ignore_errors=True)


# =====================================================================
# advice #1: FNF by exception class, not substring
# =====================================================================
def test_fnf_matched_by_class_not_substring(spark):
    class _FakeFs:
        def getFileStatus(self, src):
            raise RuntimeError(
                "org.apache.hadoop.security.AccessControlException: "
                "denied; Caused by: java.io.FileNotFoundException: /x"
            )

        open = getFileStatus

    # a non-py4j error whose MESSAGE mentions FNF must propagate —
    # the old substring match would have misread it as 'absent'
    with pytest.raises(RuntimeError, match="AccessControlException"):
        similarity._sidecar_status(_FakeFs(), None)
    with pytest.raises(RuntimeError, match="AccessControlException"):
        similarity._read_json_stream(spark, _FakeFs(), None)
    # a REAL java.io.FileNotFoundException (class-matched) still
    # reports absence
    fs, p = similarity._hadoop_fs(spark, "/ym_r19/definitely/not/here")
    assert similarity._sidecar_status(fs, p) is None


# =====================================================================
# advice #2: torn publish refuses instead of reading as fresh state
# =====================================================================
def test_torn_publish_refuses_for_ingest_progress(spark, built_index):
    _, path, _ = built_index
    similarity._write_ingest_progress(
        spark, path, {"checkpoint": "file:///ck", "query_id": "q", "last_batch": 3}
    )
    # simulate a crash in the delete->rename gap: destination gone,
    # completed .tmp left behind
    os.rename(
        f"{path}/_ingest_progress.json", f"{path}/_ingest_progress.json.tmp"
    )
    with pytest.raises(IOError, match="crashed between delete and rename"):
        similarity._read_ingest_progress(spark, path)
    # recovery by deleting the .tmp resets the state to a true absence
    os.remove(f"{path}/_ingest_progress.json.tmp")
    assert similarity._read_ingest_progress(spark, path) is None


def test_torn_publish_refuses_for_centroid_sidecar(spark, built_index):
    _, path, _ = built_index
    os.rename(f"{path}/_centroids.json", f"{path}/_centroids.json.tmp")
    with pytest.raises(IOError, match="crashed between delete and rename"):
        similarity.read_centroid_sidecar(spark, path)
    # the next successful publish self-heals (overwrites the .tmp)
    similarity._write_centroid_sidecar(spark, path, [[1.0, 0.0], [0.0, 1.0]])
    healed = similarity.read_centroid_sidecar(spark, path)
    assert healed is not None and healed.shape == (2, 2)
    assert not os.path.exists(f"{path}/_centroids.json.tmp")


# =====================================================================
# advice #3: serving-cache arrays are frozen
# =====================================================================
def test_cached_serving_arrays_are_frozen(spark, built_index):
    _, path, _ = built_index
    cents = similarity.read_centroid_sidecar(spark, path)
    assert cents.flags.writeable is False
    with pytest.raises(ValueError):
        cents[0, 0] = 99.0
    unit = similarity._unit_matrix(cents)
    assert unit.flags.writeable is False
    with pytest.raises(ValueError):
        unit[0, 0] = 99.0
    # the memo still returns the identical object on a repeat call
    assert similarity._unit_matrix(cents) is unit


# =====================================================================
# advice #4: compact target above the threshold cannot converge
# =====================================================================
def test_compact_refuses_nonconvergent_target(spark, built_index):
    _, path, _ = built_index
    with pytest.raises(ValueError, match="never converge"):
        similarity.compact_ivf_index(
            spark, path, max_files_per_list=2, target_files_per_list=3
        )
    with pytest.raises(ValueError, match="max_files_per_list"):
        similarity.compact_ivf_index(
            spark, path, max_files_per_list=-1, target_files_per_list=1
        )
    # the explicit full-rewrite spelling stays legal (normalize pass)
    report = similarity.compact_ivf_index(
        spark, path, max_files_per_list=0, target_files_per_list=1
    )
    assert all(n <= 1 for n in report["files_after"].values())


# =====================================================================
# r18 verdict #4: index_stats is honestly metadata-cheap
# =====================================================================
def test_index_stats_runs_no_spark_job(spark, built_index):
    """Row counts come from parquet footers on the driver-side FS
    walk: ZERO Spark jobs — pinned via the status tracker over a
    dedicated job group (any scan, even a zero-column count, would
    register a job there)."""
    _, path, _ = built_index
    sc = spark.sparkContext
    sc.setJobGroup("r19_stats_nojob", "index_stats must not run a job")
    try:
        stats = similarity.index_stats(spark, path)
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert list(sc.statusTracker().getJobIdsForGroup("r19_stats_nojob")) == []
    # ...and the footer counts agree with an actual distributed count
    assert stats["rows"] == 80
    actual = {
        r["cid"]: r["n"]
        for r in spark.read.parquet(path)
        .groupBy("cid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert {
        c: v["rows"] for c, v in stats["per_cid"].items() if v["rows"]
    } == actual


def test_index_stats_refuses_missing_path(spark, built_index):
    """A typo'd path must refuse, not describe a healthy empty index
    (automation drives rebuild/compact decisions off these stats)."""
    base, path, _ = built_index
    with pytest.raises(ValueError, match="missing path"):
        similarity.index_stats(spark, f"{base}/idx_typo")


def test_footer_counts_skip_empty_files_and_name_corrupt_ones(
    spark, built_index
):
    _, path, _ = built_index
    cid_dir = next(
        d for d in os.listdir(path) if d.startswith("cid=")
    )
    # a zero-byte .parquet (killed writer debris): skipped for rows,
    # exactly as Spark's scan planner produces no splits for it
    empty = os.path.join(path, cid_dir, "part-junk.parquet")
    open(empty, "w").close()
    assert similarity.index_stats(spark, path)["rows"] == 80
    os.remove(empty)
    # a non-empty corrupt file refuses WITH the file named — silent
    # under-counting would make promote compare wrong totals
    bad = os.path.join(path, cid_dir, "part-bad.parquet")
    with open(bad, "w") as f:
        f.write("not parquet at all")
    with pytest.raises(IOError, match="part-bad.parquet"):
        similarity.index_stats(spark, path)
    os.remove(bad)


# =====================================================================
# r18 verdict #5: the blue/green promote step
# =====================================================================
def test_rebuild_records_source_snapshot(spark, built_index):
    _, path, _ = built_index
    dest = path + "_rb"
    similarity.rebuild_ivf_index(spark, path, dest)
    with open(f"{dest}/_rebuild_source.json") as f:
        record = json.load(f)
    assert record["source"] == similarity._qualified(spark, path)
    assert record["source_rows"] == 80
    assert record["source_progress"] is None  # no streaming ingest yet


def test_promote_swaps_and_serving_stays_green(spark, built_index):
    base, path, cents = built_index
    qs = _vectors(spark, 500, 504).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    dest = path + "_rb"
    similarity.rebuild_ivf_index(spark, path, dest)
    expect = {
        tuple(r)
        for r in similarity.ivf_topk_pruned(spark, dest, qs, k=4, nprobe=2).collect()
    }
    out = similarity.promote_ivf_index(spark, path, dest)
    assert out["promoted"] == similarity._qualified(spark, path)
    assert out["carried_lineage"] is False
    assert out["stats"]["rows"] == 80
    # old index retired for rollback; candidate moved into place
    assert os.path.isdir(path + "__retired")
    assert not os.path.exists(dest)
    # the consumed rebuild marker does not ride into serving
    assert not os.path.exists(f"{path}/_rebuild_source.json")
    # readers at the ORIGINAL path see the rebuilt index (sidecar
    # cache self-invalidates on the new mtime)
    served = {
        tuple(r)
        for r in similarity.ivf_topk_pruned(spark, path, qs, k=4, nprobe=2).collect()
    }
    assert served == expect and served
    # a second promotion refuses while the retirement is uncleared
    dest2 = path + "_rb2"
    similarity.rebuild_ivf_index(spark, path, dest2)
    with pytest.raises(ValueError, match="never cleared"):
        similarity.promote_ivf_index(spark, path, dest2)
    shutil.rmtree(path + "__retired")
    similarity.promote_ivf_index(spark, path, dest2)
    assert similarity.index_stats(spark, path)["rows"] == 80


def test_promote_refuses_non_rebuild_candidate_and_wrong_source(
    spark, built_index
):
    base, path, cents = built_index
    # candidate built directly by write_ivf_index: no snapshot to
    # verify against -> refuse
    plain = f"{base}/plain"
    similarity.write_ivf_index(_vectors(spark, 0, 40), cents, plain)
    with pytest.raises(ValueError, match="not produced by rebuild_ivf_index"):
        similarity.promote_ivf_index(spark, path, plain)
    # candidate rebuilt from a DIFFERENT index -> refuse
    other = f"{base}/other"
    similarity.write_ivf_index(_vectors(spark, 100, 140), cents, other)
    other_rb = f"{base}/other_rb"
    similarity.rebuild_ivf_index(spark, other, other_rb)
    with pytest.raises(ValueError, match="unrelated index pair"):
        similarity.promote_ivf_index(spark, path, other_rb)
    # overlap refuses before any sidecar read
    with pytest.raises(ValueError, match="overlap"):
        similarity.promote_ivf_index(spark, path, path + "/nested")


def test_promote_names_recovery_for_half_swapped_crash(spark, built_index):
    """A promotion killed between its two renames leaves the serving
    path missing and the retired copy present; a retry must name the
    actual recovery (rename back / complete), never the misleading
    'row count moved (N -> 0), re-run rebuild' that cannot even run."""
    _, path, _ = built_index
    dest = path + "_rb"
    similarity.rebuild_ivf_index(spark, path, dest)
    os.rename(path, path + "__retired")  # simulate the crash state
    with pytest.raises(IOError, match="crashed between its two renames"):
        similarity.promote_ivf_index(spark, path, dest)
    os.rename(path + "__retired", path)  # the named rollback recovery
    out = similarity.promote_ivf_index(spark, path, dest)
    assert out["stats"]["rows"] == 80


def test_promote_refuses_mid_rebuild_appends(spark, built_index):
    """The corpus-fork case the r18 verdict called out: data landing
    in the old index AFTER the rebuild snapshot must refuse the swap.
    Batch appends never touch the ingest-progress sidecar, so the
    footer row-count comparison is what catches them."""
    _, path, _ = built_index
    dest = path + "_rb"
    similarity.rebuild_ivf_index(spark, path, dest)
    similarity.append_ivf_index(_vectors(spark, 300, 330), path)
    with pytest.raises(ValueError, match="row count.*moved"):
        similarity.promote_ivf_index(spark, path, dest)


def test_promote_carries_lineage_and_stream_resumes(spark):
    """rebuild -> promote -> the ORIGINAL streaming checkpoint resumes
    against the promoted index: new batches apply, already-baked-in
    batches stay skipped (carried ``last_batch``), and a drain that
    raced the rebuild refuses the promotion."""
    base = tempfile.mkdtemp(prefix="ym_r19_lineage_")
    try:
        path, src, ckpt = f"{base}/idx", f"{base}/src", f"{base}/ckpt"
        first = _vectors(spark, 0, 80)
        cents = similarity.train_centroids(first, nlist=4)
        similarity.write_ivf_index(first, cents, path)
        _vectors(spark, 200, 260).write.parquet(src)
        stream = spark.readStream.schema(
            "vec_id long, embedding array<double>"
        ).parquet(src)
        similarity.append_ivf_index_stream(stream, path, ckpt).awaitTermination(120)
        assert similarity.index_stats(spark, path)["rows"] == 140

        dest = f"{base}/idx_rb"
        similarity.rebuild_ivf_index(spark, path, dest)

        # a drain landing mid-rebuild advances the progress sidecar
        # past the snapshot -> promotion refuses
        raced = f"{base}/idx_raced_rb"
        similarity.rebuild_ivf_index(spark, path, raced)
        _vectors(spark, 400, 410).write.mode("append").parquet(src)
        similarity.append_ivf_index_stream(stream, path, ckpt).awaitTermination(120)
        assert similarity.index_stats(spark, path)["rows"] == 150
        with pytest.raises(ValueError, match="moved since the rebuild"):
            similarity.promote_ivf_index(spark, path, raced)

        # rebuild again on the settled state, then promote
        dest2 = f"{base}/idx_rb2"
        similarity.rebuild_ivf_index(spark, path, dest2)
        out = similarity.promote_ivf_index(spark, path, dest2)
        assert out["carried_lineage"] is True
        assert out["stats"]["rows"] == 150

        # the SAME checkpoint resumes against the promoted index:
        # only the genuinely new file is ingested
        _vectors(spark, 600, 620).write.mode("append").parquet(src)
        similarity.append_ivf_index_stream(stream, path, ckpt).awaitTermination(120)
        assert similarity.index_stats(spark, path)["rows"] == 170

        # serving green on the promoted + resumed index
        qs = _vectors(spark, 900, 903).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        got = similarity.ivf_topk_pruned(spark, path, qs, k=3, nprobe=2)
        assert got.count() == 9
    finally:
        shutil.rmtree(base, ignore_errors=True)


# =====================================================================
# bounded write layout (r19 probe --promote finding)
# =====================================================================
def test_build_and_append_bound_files_per_list(spark, built_index):
    """write_ivf_index / append_ivf_index bound output files per list
    (default 1 per write) — the raw partitionBy small-files trap
    (25,269 files for a 400k-row rebuild, probe --promote) is closed
    at the source."""
    _, path, _ = built_index
    stats = similarity.index_stats(spark, path)
    assert stats["max_files_per_list"] == 1
    similarity.append_ivf_index(_vectors(spark, 300, 360), path)
    stats = similarity.index_stats(spark, path)
    assert stats["max_files_per_list"] <= 2  # one more file set max
    assert stats["rows"] == 140


def test_bounded_by_list_width_and_validation(spark):
    """Explicit keys fan out to keys x slack partitions (AQE cannot
    SPLIT a narrow shuffle, so corpus-scale writes must not be left
    at spark.sql.shuffle.partitions); invalid domains refuse loudly
    instead of clamping to a one-task corpus funnel."""
    df = _vectors(spark, 0, 40).select(
        F.col("vec_id").alias("nn_id"),
        F.col("embedding").alias("nv"),
        (F.col("vec_id") % 4).alias("cid"),
    )
    wide = similarity._bounded_by_list(df, 2, keys=8)
    assert wide.rdd.getNumPartitions() == 8 * similarity._WIDTH_SLACK
    assert similarity._bounded_by_list(df, None) is df
    with pytest.raises(ValueError, match="files_per_list"):
        similarity._bounded_by_list(df, 0)
    with pytest.raises(ValueError, match="keys"):
        similarity._bounded_by_list(df, 1, keys=0)


def test_stream_rejects_bad_files_per_list_before_start(spark, built_index):
    """The streaming API refuses an invalid files_per_list
    synchronously, before any checkpoint state exists — not inside
    batch 0 as a StreamingQueryException."""
    base, path, _ = built_index
    src = f"{base}/stream_src"
    _vectors(spark, 200, 210).write.parquet(src)
    stream = spark.readStream.schema(
        "vec_id long, embedding array<double>"
    ).parquet(src)
    ckpt = f"{base}/stream_ckpt"
    with pytest.raises(ValueError, match="files_per_list"):
        similarity.append_ivf_index_stream(
            stream, path, ckpt, files_per_list=0
        )
    assert not os.path.exists(ckpt)
