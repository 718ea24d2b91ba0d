"""Property test for the IVF append -> compact -> serve lifecycle
against a pure-Python model: for a random sequence of append batch
sizes and a random (max_files, target) compaction policy,

- total indexed rows always equal base + sum(batches) — neither the
  appends nor the rewrite may lose or duplicate a vector,
- after compaction every list holds at most ``target`` data files
  (the at-most-target invariant the salt split must guarantee),
- ``index_stats`` row counts equal an independent groupBy over the
  raw frame, and its skew equals the max/mean of those counts,
- ``ivf_topk_pruned`` results are SET-identical before and after
  compaction for a held-out query batch (compaction is physical
  layout only; the sidecar, and therefore probe selection and exact
  rescoring, are untouched),
- a second compaction pass at the same policy is a no-op.

The unit tests (test_ivf_maintenance_r18.py) pin hand cases and the
clean-lists-byte-untouched invariant; this derives the row/file
arithmetic independently on random append shapes so a split-key or
overwrite-mode regression surfaces on inputs nobody hand-picked.
"""

from __future__ import annotations

import shutil
import tempfile

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import similarity


def _vectors(spark, lo, hi, dim=5, seed=37):
    rng = np.random.RandomState(seed + lo)
    rows = [
        (i, [float(x) for x in rng.normal(size=dim)]) for i in range(lo, hi)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=4),
    st.integers(min_value=0, max_value=3),
    st.integers(min_value=1, max_value=2),
)
def test_append_compact_serve_lifecycle(spark, batches, max_files, target):
    base_n = 60
    base = tempfile.mkdtemp(prefix="ym_prop_ivfm_")
    # r19 advice #4: a target above max(max_files, 1) can never
    # converge and is REFUSED — fold the generated combination into
    # the documented valid domain (the refusal itself is pinned in
    # test_ivf_promote_r19.py)
    target = min(target, max(max_files, 1))
    try:
        path = f"{base}/idx"
        first = _vectors(spark, 0, base_n)
        cents = similarity.train_centroids(first, nlist=3)
        similarity.write_ivf_index(first, cents, path)
        lo = 1000
        for n in batches:
            similarity.append_ivf_index(_vectors(spark, lo, lo + n), path)
            lo += n
        expected_rows = base_n + sum(batches)

        qs = _vectors(spark, 9000, 9005).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        served_before = {
            tuple(r)
            for r in similarity.ivf_topk_pruned(
                spark, path, qs, k=4, nprobe=2
            ).collect()
        }

        stats = similarity.index_stats(spark, path)
        assert stats["rows"] == expected_rows
        model_rows = {
            r["cid"]: r["n"]
            for r in spark.read.parquet(path)
            .groupBy("cid")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert {
            c: v["rows"] for c, v in stats["per_cid"].items() if v["rows"]
        } == model_rows
        sizes = list(model_rows.values())
        assert stats["skew"] == max(sizes) / (sum(sizes) / len(sizes))

        report = similarity.compact_ivf_index(
            spark, path,
            max_files_per_list=max_files,
            target_files_per_list=target,
        )
        after = similarity.index_stats(spark, path)
        assert after["rows"] == expected_rows
        # every DIRTY list came out at or under target; clean lists
        # kept whatever they had (and were at or under max_files)
        for cid, n in report["files_after"].items():
            assert n <= target, (cid, n, report)
        for cid, v in after["per_cid"].items():
            if cid not in report["files_after"]:
                assert v["files"] <= max(max_files, 1) or not report[
                    "files_before"
                ], (cid, v)

        served_after = {
            tuple(r)
            for r in similarity.ivf_topk_pruned(
                spark, path, qs, k=4, nprobe=2
            ).collect()
        }
        assert served_after == served_before and served_after

        again = similarity.compact_ivf_index(
            spark, path,
            max_files_per_list=max_files,
            target_files_per_list=target,
        )
        # second pass finds nothing above max(max_files, target)
        assert all(n <= target for n in again["files_after"].values())
        if max_files >= target:
            assert again == {"files_before": {}, "files_after": {}}
    finally:
        shutil.rmtree(base, ignore_errors=True)


@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.one_of(
            st.tuples(st.just("append"), st.integers(min_value=1, max_value=30)),
            st.tuples(st.just("compact"), st.just(0)),
            st.tuples(st.just("promote"), st.just(0)),
        ),
        min_size=1,
        max_size=4,
    ),
)
def test_maintenance_sequence_preserves_rows_and_serving(spark, ops):
    """Full-lifecycle property (r19): for a RANDOM sequence of
    append / compact / rebuild+promote operations,

    - ``index_stats`` rows always equal the model count (no op may
      lose or duplicate a vector — the row-count check is also what
      promote's mid-rebuild refusal rides on),
    - each promote serves BIT-identically to the candidate it
      swapped in (the swap moves files, not content), at the
      ORIGINAL serving path,
    - after the whole sequence the persisted index still equals an
      in-memory ``ivf_topk`` over the same vectors with the promoted
      sidecar's centroids (the pruned-serving identity, now across
      arbitrary maintenance histories).
    """
    base = tempfile.mkdtemp(prefix="ym_prop_promote_")
    try:
        path = f"{base}/idx"
        base_n = 50
        frames = [_vectors(spark, 0, base_n)]
        cents = similarity.train_centroids(frames[0], nlist=3)
        similarity.write_ivf_index(frames[0], cents, path)
        model_rows = base_n
        lo, gen = 1000, 0
        qs = _vectors(spark, 9000, 9004).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        for op, arg in ops:
            if op == "append":
                frames.append(_vectors(spark, lo, lo + arg))
                similarity.append_ivf_index(frames[-1], path)
                model_rows += arg
                lo += arg
            elif op == "compact":
                similarity.compact_ivf_index(
                    spark, path, max_files_per_list=2, target_files_per_list=1
                )
            else:  # rebuild + promote
                gen += 1
                dest = f"{base}/rb{gen}"
                similarity.rebuild_ivf_index(spark, path, dest)
                before = {
                    tuple(r)
                    for r in similarity.ivf_topk_pruned(
                        spark, dest, qs, k=4, nprobe=2
                    ).collect()
                }
                out = similarity.promote_ivf_index(spark, path, dest)
                shutil.rmtree(f"{path}__retired")
                assert out["stats"]["rows"] == model_rows
                after = {
                    tuple(r)
                    for r in similarity.ivf_topk_pruned(
                        spark, path, qs, k=4, nprobe=2
                    ).collect()
                }
                assert after == before and after
            assert similarity.index_stats(spark, path)["rows"] == model_rows

        # pruned serving over the maintained index == in-memory
        # ivf_topk over the concatenated vectors with the promoted
        # sidecar's centroids (same arithmetic both sides, no FP risk)
        sidecar = similarity.read_centroid_sidecar(spark, path)
        all_vecs = frames[0]
        for f in frames[1:]:
            all_vecs = all_vecs.unionAll(f)
        expect = {
            tuple(r)
            for r in similarity.ivf_topk(
                all_vecs, qs, k=4, nprobe=2,
                centroids=[[float(x) for x in row] for row in sidecar],
            ).collect()
        }
        got = {
            tuple(r)
            for r in similarity.ivf_topk_pruned(
                spark, path, qs, k=4, nprobe=2
            ).collect()
        }
        assert got == expect and got
    finally:
        shutil.rmtree(base, ignore_errors=True)
