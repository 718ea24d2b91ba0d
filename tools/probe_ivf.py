#!/usr/bin/env python
"""Scale-curve probe for the ANN family (ivf_topk vs brute_topk) —
the remaining expensive entry without a measured curve after
probe_neardup_stream (r14) and probe_clusters (r15).

The docstring claims verified, WITHOUT instrumenting the operator
(external wall clocks + a candidate-count computed from tiny aggs):

1. candidate-volume law: the rank window sees ~|Q| * N * nprobe/nlist
   candidate rows under IVF vs |Q| * N under brute — measured at
   1x / 4x / 16x corpus sizes;
2. build/query split (the serving posture): assign_lists is the one
   linear-in-N map-side pass, paid once per corpus; the per-batch
   query path over the persisted index must track CANDIDATES, so the
   brute/IVF query-wall ratio widens with N;
3. nprobe linearity: at fixed N, doubling nprobe ~doubles candidates
   (the recall knob is a budget knob, not a cliff);
4. constant-list-size regime: scaling nlist with N (list size pinned)
   keeps the per-batch candidate term ~CONSTANT while brute grows
   linearly — and the O(nlist) aggregate argmax keeps the build
   affordable at nlist=1024 (the pre-r16 array_sort assignment was
   O(nlist log nlist) per row and timed out there).

Synthetic clustered vectors (dim 16, 64 planted centers derived from
deterministic hashes — no RNG state, reruns agree); queries are 50
corpus members re-labeled with offset query ids (every query has an
exact duplicate in the corpus at cos=1.0 — fine for the timing and
candidate-volume laws measured here; do NOT read recall off these
numbers).  Centroids are pre-trained once per
(N, nlist) via train_centroids.

Usage: python tools/probe_ivf.py            # timing/candidate laws
       python tools/probe_ivf.py --recall   # r17: end-to-end recall@10
       python tools/probe_ivf.py --arrow    # r17: literal vs broadcast-UDF build
       python tools/probe_ivf.py --append   # r17: incremental-append skew/cost curve
Prints one human-readable table; the measured numbers land in
PLANS.md (round 16 entry; --recall in the round 17 entry).

--recall (r16 verdict #4): the number a user actually cares about —
END-TO-END recall@10 vs brute for served queries, exact vs
g=sqrt(nlist) two-level assignment, nprobe in {1,2,4,8} at the same
400k corpus / nlist=1024.  Queries here are HELD OUT (cluster-center
vectors with a different jitter stream than any corpus id), so recall
is not inflated by exact duplicates.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import similarity
from yc_data_transfer_clickhouse_from_yandex_metrica_spark.session import get_spark

DIM = 16
NCENTERS = 64
NQUERIES = 50
K = 10


def make_vectors(spark, n: int):
    """n clustered unit-ish vectors: center = hash-derived lattice
    point per (id % NCENTERS), plus a small deterministic per-id
    offset.  Pure column expressions — no RNG, no driver loop."""
    c = F.col("id") % NCENTERS
    comps = []
    for d in range(DIM):
        center = (F.xxhash64(c.cast("string"), F.lit(d)) % 1000) / 500.0 - 1.0
        jitter = (F.xxhash64(F.col("id"), F.lit(d + DIM)) % 100) / 2000.0
        comps.append((center + jitter).cast("double"))
    return spark.range(n).select(
        F.col("id").alias("vec_id"), F.array(*comps).alias("embedding")
    ).repartition(32)


def make_queries(spark):
    q = make_vectors(spark, NQUERIES * 7).where(F.col("vec_id") % 7 == 3)
    return q.select(
        (F.col("vec_id") + 10_000_000).alias("query_id"), "embedding"
    )


def timed_count(df) -> tuple[float, int]:
    t0 = time.time()
    n = df.count()
    return time.time() - t0, n


def candidate_rows(index, queries, centroids, nprobe) -> int:
    """Rows entering the rank window = sum of probed-list sizes over
    all queries — per-list sizes (one agg over the index) times the
    per-query probe cids from the OPERATOR'S OWN probe frame (so the
    count always measures the selection ivf_topk actually uses),
    never a big join."""
    sizes = {
        r["cid"]: r["n"]
        for r in index.groupBy("cid").agg(F.count("*").alias("n")).collect()
    }
    probed = similarity._probe_frame(
        queries, similarity._centroid_literal(centroids), nprobe,
        "query_id", "embedding",
    ).select("cid").collect()
    return sum(sizes.get(r["cid"], 0) for r in probed)


def main() -> None:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    base_n = 25_000
    queries = make_queries(spark).cache()
    queries.count()

    hdr = f"{'N':>9} {'mode':<24} {'build s':>8} {'query s':>8} {'cand rows':>12}"
    print(hdr)
    rows = []
    for mult in (1, 4, 16):
        n = base_n * mult
        vectors = make_vectors(spark, n).cache()
        vectors.count()

        t_brute, _ = timed_count(similarity.brute_topk(vectors, queries, k=K))
        print(f"{n:>9} {'brute':<24} {'-':>8} {t_brute:>8.2f} {n * NQUERIES:>12,}")

        # fixed nlist=64: candidate term grows with N/nlist
        cents64 = similarity.train_centroids(vectors, 64)
        idx64 = similarity.assign_lists(vectors, cents64).cache()
        t_build64, _ = timed_count(idx64)
        cand64 = candidate_rows(idx64, queries, cents64, 4)
        t64, _ = timed_count(
            similarity.ivf_topk(
                vectors, queries, k=K, nprobe=4,
                centroids=cents64, assigned=idx64,
            )
        )
        print(f"{n:>9} {'ivf nlist=64 np=4':<24} {t_build64:>8.2f} {t64:>8.2f} {cand64:>12,}")

        if mult in (1, 16):
            cand8 = candidate_rows(idx64, queries, cents64, 8)
            t8, _ = timed_count(
                similarity.ivf_topk(
                    vectors, queries, k=K, nprobe=8,
                    centroids=cents64, assigned=idx64,
                )
            )
            print(f"{n:>9} {'ivf nlist=64 np=8':<24} {'-':>8} {t8:>8.2f} {cand8:>12,}")

        # constant-list-size regime: nlist scales with N
        nlist_s = 64 * mult
        if nlist_s != 64:
            cents_s = similarity.train_centroids(vectors, nlist_s)
            idx_s = similarity.assign_lists(vectors, cents_s).cache()
            t_build_s, _ = timed_count(idx_s)
            cand_s = candidate_rows(idx_s, queries, cents_s, 4)
            t_s, _ = timed_count(
                similarity.ivf_topk(
                    vectors, queries, k=K, nprobe=4,
                    centroids=cents_s, assigned=idx_s,
                )
            )
            idx_s.unpersist()
        else:
            t_build_s, cand_s, t_s = t_build64, cand64, t64
        print(
            f"{n:>9} {'ivf nlist=' + str(nlist_s) + ' np=4':<24} "
            f"{t_build_s:>8.2f} {t_s:>8.2f} {cand_s:>12,}"
        )
        rows.append((n, t_brute, t64, cand64, t_s, cand_s))
        idx64.unpersist()
        vectors.unpersist()

    print("\nbrute/ivf(nlist=64) query-wall ratios:",
          [f"{b / i:.1f}x" for _, b, i, _, _, _ in rows])
    print("const-list candidate rows:", [f"{c:,}" for *_, c in rows])

    # two-level (IMI-style) build at the largest config: the scale
    # path once N x nlist dots stop being affordable
    n = base_n * 16
    vectors = make_vectors(spark, n).cache()
    vectors.count()
    cents = similarity.train_centroids(vectors, 1024)

    def _force(df) -> float:
        t0 = time.time()
        df.agg(F.sum("cid")).collect()
        return time.time() - t0

    t_exact = _force(similarity.assign_lists(vectors, cents))
    t_two = _force(
        similarity.assign_lists(vectors, cents, coarse_groups=32)
    )
    e = {
        r["nn_id"]: r["cid"]
        for r in similarity.assign_lists(vectors, cents).collect()
    }
    h = {
        r["nn_id"]: r["cid"]
        for r in similarity.assign_lists(
            vectors, cents, coarse_groups=32
        ).collect()
    }
    agree = sum(e[k] == h[k] for k in e) / len(e)
    print(
        f"\nbuild at N={n:,} nlist=1024: exact {t_exact:.1f}s, "
        f"two-level(g=32) {t_two:.1f}s, agreement {agree:.4f}"
    )


def recall_main() -> None:
    """recall@10 vs brute at N=400k / nlist=1024: exact assignment vs
    two-level g=32 (~sqrt(nlist)), nprobe in {1,2,4,8}."""
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    n, nlist, g = 400_000, 1024, 32
    vectors = make_vectors(spark, n).cache()
    vectors.count()
    # held-out queries: same planted centers, DISTINCT jitter stream
    # (ids >= n never appear in the corpus; center depends on id %
    # NCENTERS only, jitter on the full id) — so no query has an
    # exact duplicate and recall is a real retrieval number
    queries = (
        make_vectors(spark, n + NQUERIES * 7)
        .where((F.col("vec_id") >= n) & (F.col("vec_id") % 7 == 3))
        .select((F.col("vec_id") + 10_000_000).alias("query_id"), "embedding")
        .cache()
    )
    nq = queries.count()

    truth: dict[int, set] = {}
    for r in similarity.brute_topk(vectors, queries, k=K).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    cents = similarity.train_centroids(vectors, nlist)
    print(f"N={n:,} nlist={nlist} queries={nq} (held out), k={K}")
    print(f"{'assignment':<18} " + " ".join(f"np={p:<2}   " for p in (1, 2, 4, 8)))
    for label, groups in (("exact", None), (f"two-level g={g}", g)):
        idx = similarity.assign_lists(vectors, cents, coarse_groups=groups).cache()
        idx.count()
        cells = []
        for nprobe in (1, 2, 4, 8):
            got: dict[int, set] = {}
            for r in similarity.ivf_topk(
                vectors, queries, k=K, nprobe=nprobe,
                centroids=cents, assigned=idx,
            ).collect():
                got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
            rec = sum(
                len(truth[q] & got.get(q, set())) / len(truth[q]) for q in truth
            ) / len(truth)
            cells.append(f"{rec:.3f}  ")
        print(f"{label:<18} " + " ".join(cells))
        idx.unpersist()


def arrow_main() -> None:
    """Literal vs broadcast-UDF (arrow) assignment walls + agreement at
    the same 400k / nlist=1024 config, exact and two-level — the
    broadcast path exists for nlist past the literal parser budget, so
    its cost must be known where both forms still run."""
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    n, nlist, g = 400_000, 1024, 32
    vectors = make_vectors(spark, n).cache()
    vectors.count()
    cents = similarity.train_centroids(vectors, nlist)

    def _force(df) -> float:
        t0 = time.time()
        df.agg(F.sum("cid")).collect()
        return time.time() - t0

    print(f"N={n:,} nlist={nlist} dim={DIM}")
    results = {}
    for label, groups, arrow in (
        ("exact literal", None, False),
        ("exact arrow", None, True),
        (f"two-level g={g} literal", g, False),
        (f"two-level g={g} arrow", g, True),
    ):
        t = _force(
            similarity.assign_lists(
                vectors, cents, coarse_groups=groups, use_arrow=arrow
            )
        )
        results[label] = t
        print(f"{label:<24} {t:>7.1f}s")

    for groups in (None, g):
        lit = {
            r["nn_id"]: r["cid"]
            for r in similarity.assign_lists(
                vectors, cents, coarse_groups=groups, use_arrow=False
            ).collect()
        }
        arr = {
            r["nn_id"]: r["cid"]
            for r in similarity.assign_lists(
                vectors, cents, coarse_groups=groups, use_arrow=True
            ).collect()
        }
        agree = sum(lit[k] == arr[k] for k in lit) / len(lit)
        print(f"agreement groups={groups}: {agree:.6f}")


def make_drifted_vectors(spark, n: int, id_offset: int, drift: float):
    """Same lattice-center construction as make_vectors but with every
    center shifted by `drift` in each coordinate — appended batches
    whose distribution moved away from the trained centroids."""
    c = F.col("id") % NCENTERS
    comps = []
    for d in range(DIM):
        center = (F.xxhash64(c.cast("string"), F.lit(d)) % 1000) / 500.0 - 1.0
        jitter = (F.xxhash64(F.col("id"), F.lit(d + DIM)) % 100) / 2000.0
        comps.append((center + jitter + drift).cast("double"))
    return spark.range(n).select(
        (F.col("id") + id_offset).alias("vec_id"), F.array(*comps).alias("embedding")
    ).repartition(32)


def append_main() -> None:
    """Incremental-append curve, DETERMINISTIC metrics only (walls on
    this host drift 2-4x within a run — the candidate-volume law is
    the honest scale lens, as in the r16 probe): after K appended
    batches at increasing drift, report list-size skew (max/mean) and
    the query batch's candidate rows — grounds append_ivf_index's
    docstring claim that DRIFTED appends concentrate into few lists
    and grow the probed-list scan, where a rebuild (re-train) is the
    fix."""
    import shutil
    import tempfile

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    base_n, batch_n, nlist, nbatches = 200_000, 50_000, 256, 4
    vectors = make_vectors(spark, base_n).cache()
    vectors.count()
    queries = make_queries(spark).cache()
    queries.count()
    cents = similarity.train_centroids(vectors, nlist)

    def stats(path, qset) -> tuple[float, int, int]:
        idx = spark.read.parquet(path)
        ns = [r["count"] for r in idx.groupBy("cid").count().collect()]
        cand = candidate_rows(idx, qset, cents, 8)
        return max(ns) / (sum(ns) / len(ns)), sum(ns), cand

    for label, drift in (("no-drift", 0.0), ("drift=0.5", 0.5), ("drift=2.0", 2.0)):
        # queries FROM the appended distribution: the workload that
        # actually chases drifted data into its (skewed) lists
        dq = (
            make_drifted_vectors(spark, NQUERIES * 7, 20_000_000, drift)
            .where(F.col("vec_id") % 7 == 3)
            .select((F.col("vec_id") + 10_000_000).alias("query_id"), "embedding")
            .cache()
        )
        dq.count()
        base = tempfile.mkdtemp(prefix="ym_ivf_appendprobe_")
        try:
            path = f"{base}/idx"
            similarity.write_ivf_index(vectors, cents, path)
            s0, n0, c0 = stats(path, queries)
            print(f"{label}: base       skew {s0:5.2f}  N={n0:>9,}  cand(base-q)={c0:>11,}")
            for b in range(nbatches):
                similarity.append_ivf_index(
                    make_drifted_vectors(
                        spark, batch_n, 10_000_000 + b * batch_n, drift
                    ),
                    path,
                )
            s, n, c = stats(path, queries)
            _, _, cd = stats(path, dq)
            print(
                f"{label}: +4 appends skew {s:5.2f}  N={n:>9,}  "
                f"cand(base-q)={c:>11,}  cand(drift-q)={cd:>11,}"
            )
        finally:
            shutil.rmtree(base, ignore_errors=True)
            dq.unpersist()


def rebuild_main() -> None:
    """r18 (r17 verdict #6): does a REBUILD restore the
    candidate-fraction law for queries FROM the drifted distribution?
    The r17 --append probe measured skew-6 drift (drift=2.0) costing
    drift-distribution queries 1.47x the no-drift fraction-law
    candidates (1.61x what base-distribution queries pay on the same
    index).  This probe takes that worst case, then rebuilds
    (re-trains centroids on the grown corpus read back from the index
    itself + write_ivf_index) and re-measures skew and candidates for
    BOTH query origins.  Deterministic metrics only, as in --append.
    index_stats() supplies the skew signal the same way a production
    monitor would."""
    import shutil
    import tempfile

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    base_n, batch_n, nlist, nbatches, drift = 200_000, 50_000, 256, 4, 2.0
    vectors = make_vectors(spark, base_n).cache()
    vectors.count()
    queries = make_queries(spark).cache()
    queries.count()
    cents = similarity.train_centroids(vectors, nlist)
    dq = (
        make_drifted_vectors(spark, NQUERIES * 7, 20_000_000, drift)
        .where(F.col("vec_id") % 7 == 3)
        .select((F.col("vec_id") + 10_000_000).alias("query_id"), "embedding")
        .cache()
    )
    dq.count()

    def report(label, path, cts):
        st = similarity.index_stats(spark, path)
        idx = spark.read.parquet(path)
        cb = candidate_rows(idx, queries, cts, 8)
        cd = candidate_rows(idx, dq, cts, 8)
        print(
            f"{label}: skew {st['skew']:5.2f}  N={st['rows']:>9,}  "
            f"cand(base-q)={cb:>11,}  cand(drift-q)={cd:>11,}"
        )

    base = tempfile.mkdtemp(prefix="ym_ivf_rebuildprobe_")
    try:
        path = f"{base}/idx"
        similarity.write_ivf_index(vectors, cents, path)
        for b in range(nbatches):
            similarity.append_ivf_index(
                make_drifted_vectors(
                    spark, batch_n, 10_000_000 + b * batch_n, drift
                ),
                path,
            )
        report("appended (old cents)", path, cents)

        # THE REBUILD, through the shipped library call (r18:
        # rebuild_ivf_index packages re-train-on-the-grown-corpus +
        # write_ivf_index; this probe is its 400k integration run)
        path2 = f"{base}/idx_rebuilt"
        similarity.rebuild_ivf_index(spark, path, path2)
        new_cents = similarity.read_centroid_sidecar(spark, path2)
        report("rebuilt  (new cents)", path2, new_cents)
    finally:
        shutil.rmtree(base, ignore_errors=True)
        dq.unpersist()


def promote_main() -> None:
    """r19 (r18 verdict #5): the blue/green swap measured at the same
    400k worst case as --rebuild.  Claims: (1) promote's wall is
    validation (snapshot compare + footer walk + stats) plus two
    directory renames — O(files) metadata, orders of magnitude under
    the rebuild's O(N) re-train + rewrite; (2) after the swap the
    ORIGINAL serving path holds the rebuilt index bit-for-bit (same
    skew, same candidate counts); (3) a batch append landing after
    the rebuild snapshot refuses the swap loudly (the footer
    row-count check — batch appends never touch the progress
    sidecar)."""
    import shutil
    import tempfile

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    base_n, batch_n, nlist, nbatches, drift = 200_000, 50_000, 256, 4, 2.0
    vectors = make_vectors(spark, base_n).cache()
    vectors.count()
    queries = make_queries(spark).cache()
    queries.count()
    cents = similarity.train_centroids(vectors, nlist)
    base = tempfile.mkdtemp(prefix="ym_ivf_promoteprobe_")
    try:
        path = f"{base}/idx"
        similarity.write_ivf_index(vectors, cents, path)
        for b in range(nbatches):
            similarity.append_ivf_index(
                make_drifted_vectors(
                    spark, batch_n, 10_000_000 + b * batch_n, drift
                ),
                path,
            )

        t0 = time.time()
        dest = f"{base}/idx_rebuilt"
        similarity.rebuild_ivf_index(spark, path, dest)
        rebuild_wall = time.time() - t0
        new_cents = similarity.read_centroid_sidecar(spark, dest)
        cand_rebuilt = candidate_rows(
            spark.read.parquet(dest), queries, new_cents, 8
        )
        skew_rebuilt = similarity.index_stats(spark, dest)["skew"]

        t0 = time.time()
        out = similarity.promote_ivf_index(spark, path, dest)
        promote_wall = time.time() - t0
        st = similarity.index_stats(spark, path)
        cand_promoted = candidate_rows(
            spark.read.parquet(path), queries,
            similarity.read_centroid_sidecar(spark, path), 8,
        )
        print(
            f"rebuild wall {rebuild_wall:7.2f} s  "
            "(re-train + full rewrite: O(N))"
        )
        print(
            f"promote wall {promote_wall:7.2f} s  "
            f"(snapshot checks + footer walk + 2 renames: "
            f"O(files)={st['files']})"
        )
        print(
            f"promoted@original-path: rows={st['rows']:,} "
            f"skew={st['skew']:.2f} cand(base-q)={cand_promoted:,}"
        )
        print(
            f"rebuilt (pre-swap)    : rows={out['stats']['rows']:,} "
            f"skew={skew_rebuilt:.2f} cand(base-q)={cand_rebuilt:,}"
        )
        assert cand_promoted == cand_rebuilt and st["skew"] == skew_rebuilt

        # claim 3: a batch append after the rebuild snapshot refuses
        dest2 = f"{base}/idx_rb2"
        similarity.rebuild_ivf_index(spark, path, dest2)
        similarity.append_ivf_index(
            make_drifted_vectors(spark, 1000, 30_000_000, drift), path
        )
        shutil.rmtree(f"{path}__retired")
        try:
            similarity.promote_ivf_index(spark, path, dest2)
        except ValueError as e:
            print(f"mid-rebuild append refused: {str(e)[:90]}...")
        else:
            # fail like claims 1-2 do: an exit-0 probe must mean
            # every headline claim held
            raise AssertionError("mid-rebuild append was NOT refused")
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    if "--recall" in sys.argv[1:]:
        recall_main()
    elif "--arrow" in sys.argv[1:]:
        arrow_main()
    elif "--append" in sys.argv[1:]:
        append_main()
    elif "--rebuild" in sys.argv[1:]:
        rebuild_main()
    elif "--promote" in sys.argv[1:]:
        promote_main()
    else:
        main()
