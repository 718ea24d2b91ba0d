"""Hypothesis property tests for the corpus/pipeline operators
(SURVEY.md section 5 item 5, extending tests/test_properties.py).

These operators carry the training-data-pipeline semantics whose
driver oracles run on ONE fixed dataset; a random-input Python model
is strictly stronger evidence.  Each test batches one generated
scenario into one Spark job (the test_properties.py convention), so
example counts stay small.

Models:
- interval_length_sum == length of the merged union of [s, e]
  intervals per key (overlaps once), for any interval soup with
  s <= e.
- max_intersections == brute-force half-open [s, e) sweep peak.
- pack_sequences (portable shard_expr) == per-shard prefix-sum
  next-fit: bin = floor(start/budget), offset = start % budget,
  plus the next-fit overflow bound (no bin exceeds budget +
  max-doc - 1 tokens).
- shard_assign == the documented md5 formula, recomputed in Python
  byte-for-byte (seedable global shuffle must be engine-portable).
- domain_quota == per-domain sort by (-score, id), keep first cap.
- dedup_clusters == union-find over the pair graph with min-id
  labels; keep_best keeps exactly the best-(score, -id) member per
  component.
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


# --------------------------------------------------------------------------
# interval_length_sum: union length vs merged-intervals model
# --------------------------------------------------------------------------
_intervals = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # key
        st.integers(min_value=0, max_value=40),  # start
        st.integers(min_value=0, max_value=25),  # length (e = s + len)
    ),
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_intervals)
def test_interval_length_sum_matches_union_model(spark, rows):
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import series

    data = [(k, s, s + ln) for k, s, ln in rows]
    df = spark.createDataFrame(data, "k int, s long, e long")
    got = {
        r["k"]: r["covered"]
        for r in series.interval_length_sum(df, ["k"], "s", "e").collect()
    }
    by_key: dict[int, list[tuple[int, int]]] = {}
    for k, s, e in data:
        by_key.setdefault(k, []).append((s, e))
    for k, ivs in by_key.items():
        covered, cur_s, cur_e = 0, None, None
        for s, e in sorted(ivs):
            if cur_e is None or s > cur_e:
                covered += cur_e - cur_s if cur_e is not None else 0
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        covered += cur_e - cur_s if cur_e is not None else 0
        assert got[k] == covered, (k, ivs)


# --------------------------------------------------------------------------
# max_intersections: peak concurrency vs brute-force half-open sweep
# --------------------------------------------------------------------------
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_intervals)
def test_max_intersections_matches_sweep_model(spark, rows):
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import series

    data = [(k, s, s + ln) for k, s, ln in rows]
    df = spark.createDataFrame(data, "k int, s long, e long")
    got = {
        r["k"]: r["max_open"]
        for r in series.max_intersections(df, ["k"], "s", "e").collect()
    }
    by_key: dict[int, list[tuple[int, int]]] = {}
    for k, s, e in data:
        by_key.setdefault(k, []).append((s, e))
    for k, ivs in by_key.items():
        # half-open [s, e): ends sort before starts at the same point
        # (the operator's documented tie rule), so touching intervals
        # never overlap and a zero-length [s, s) never opens.
        events = []
        for s, e in ivs:
            events.append((s, 1))
            events.append((e, -1))
        peak, cur = 0, 0
        for _, d in sorted(events):  # (-1) sorts before (+1) at same pt
            cur += d
            peak = max(peak, cur)
        assert got[k] == peak, (k, ivs)


# --------------------------------------------------------------------------
# pack_sequences: exact next-fit model + overflow bound
# --------------------------------------------------------------------------
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.integers(min_value=1, max_value=60),  # n_tokens per doc
        min_size=1,
        max_size=30,
        unique=False,
    ),
    st.integers(min_value=8, max_value=64),  # budget
    st.integers(min_value=1, max_value=4),  # nshards
)
def test_pack_sequences_matches_nextfit_model(spark, tokens, budget, nshards):
    from pyspark.sql import functions as F

    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import packing

    data = [(i, n) for i, n in enumerate(tokens)]
    df = spark.createDataFrame(data, "doc_id long, n_tokens long")
    out = packing.pack_sequences(
        df,
        budget=budget,
        nshards=nshards,
        shard_expr=F.pmod(F.col("doc_id"), F.lit(nshards)),
    ).collect()
    got = {r["doc_id"]: (r["shard"], r["bin"], r["offset"]) for r in out}
    assert len(got) == len(data)  # every doc assigned exactly once

    by_shard: dict[int, list[tuple[int, int]]] = {}
    for i, n in data:
        by_shard.setdefault(i % nshards, []).append((i, n))
    max_doc = max(tokens)
    bin_loads: dict[tuple[int, int], int] = {}
    for shard, docs in by_shard.items():
        start = 0
        for i, n in sorted(docs):
            assert got[i] == (shard, start // budget, start % budget), (
                i,
                got[i],
            )
            bin_loads[(shard, start // budget)] = (
                bin_loads.get((shard, start // budget), 0) + n
            )
            start += n
    # next-fit guarantee: a bin holds its straddling doc but never more
    # than budget + (max_doc - 1) tokens
    assert all(v <= budget + max_doc - 1 for v in bin_loads.values())


# --------------------------------------------------------------------------
# shard_assign: byte-for-byte md5 model (engine portability contract)
# --------------------------------------------------------------------------
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.integers(min_value=0, max_value=10_000),
        min_size=1,
        max_size=25,
        unique=True,
    ),
    st.integers(min_value=1, max_value=8),  # n_shards
    st.sampled_from(["42", "7", "seed"]),
)
def test_shard_assign_matches_md5_model(spark, ids, n_shards, seed):
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import corpus

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    out = corpus.shard_assign(df, n_shards=n_shards, seed=seed).collect()
    got = {r["doc_id"]: (r["skey"], r["shard"], r["pos"]) for r in out}

    model = {}
    for i in ids:
        skey = hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
        model[i] = (skey, int(skey[:15], 16) % n_shards)
    by_shard: dict[int, list] = {}
    for i, (skey, shard) in model.items():
        by_shard.setdefault(shard, []).append((skey, i))
    for shard, members in by_shard.items():
        for pos, (skey, i) in enumerate(sorted(members), start=1):
            assert got[i] == (skey, shard, pos), (i, got[i])


# --------------------------------------------------------------------------
# domain_quota: per-domain top-cap model
# --------------------------------------------------------------------------
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a.com", "b.org", "c.net"]),
            st.integers(min_value=0, max_value=9),  # score (dups likely)
        ),
        min_size=1,
        max_size=25,
    ),
    st.integers(min_value=1, max_value=4),  # cap
)
def test_domain_quota_matches_topcap_model(spark, rows, cap):
    from pyspark.sql import functions as F

    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import corpus

    data = [(i, d, s) for i, (d, s) in enumerate(rows)]
    df = spark.createDataFrame(data, "doc_id long, domain string, sc long")
    out = corpus.domain_quota(
        df, "domain", F.col("sc").cast("double"), cap
    ).collect()
    got = sorted((r["doc_id"], r["domain"], r["rnk"]) for r in out)

    by_dom: dict[str, list] = {}
    for i, d, s in data:
        by_dom.setdefault(d, []).append((-s, i))
    model = []
    for d, members in by_dom.items():
        for rnk, (_, i) in enumerate(sorted(members)[:cap], start=1):
            model.append((i, d, rnk))
    assert got == sorted(model)


# --------------------------------------------------------------------------
# dedup_clusters / keep_best: union-find model
# --------------------------------------------------------------------------
_graph = st.tuples(
    st.integers(min_value=2, max_value=10),  # n docs
    st.lists(  # edges as (a, b) index pairs
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=9),
        ),
        min_size=0,
        max_size=8,
    ),
)


def _union_find(n: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = list(range(n))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            # union-by-min keeps every root the min of its component,
            # so find(i) IS the min-id component label
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in range(n)}


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_graph)
def test_dedup_clusters_matches_union_find(spark, graph):
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import dedup

    n, raw_edges = graph
    edges = [(a % n, b % n) for a, b in raw_edges if a % n != b % n]
    df = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(
        edges or [(0, 0)], "id_a long, id_b long"
    ).where("id_a != id_b")
    out = dedup.dedup_clusters(df, pairs).collect()
    got = {r["doc_id"]: (r["component"], r["is_canonical"]) for r in out}

    comp = _union_find(n, edges)
    assert len(got) == n
    for i in range(n):
        want = comp[i]
        assert got[i] == (want, want == i), (i, got[i], edges)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    _graph,
    st.lists(
        st.integers(min_value=0, max_value=5),  # scores (ties likely)
        min_size=10,
        max_size=10,
    ),
)
def test_keep_best_keeps_best_per_component(spark, graph, scores):
    from pyspark.sql import functions as F

    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import corpus

    n, raw_edges = graph
    edges = [(a % n, b % n) for a, b in raw_edges if a % n != b % n]
    df = spark.createDataFrame(
        [(i, scores[i]) for i in range(n)], "doc_id long, sc long"
    )
    pairs = spark.createDataFrame(
        edges or [(0, 0)], "id_a long, id_b long"
    ).where("id_a != id_b")
    out = corpus.keep_best(
        df, pairs, F.col("sc").cast("double")
    ).collect()
    got = {r["doc_id"]: (r["component"], r["keep"]) for r in out}

    comp = _union_find(n, edges)
    members: dict[int, list] = {}
    for i in range(n):
        members.setdefault(comp[i], []).append((-scores[i], i))
    for c, ms in members.items():
        best = sorted(ms)[0][1]
        for _, i in ms:
            assert got[i] == (c, i == best), (i, got[i], edges, scores)
