"""Hypothesis property tests for skew-safe rewrites, sessionize, and
exact ANN against pure-Python models.

- salted_agg / salted_join: the REWRITE property — identical results
  to the plain groupBy / join for any salt width, any data (that is
  the operators' whole contract; the salt must never leak into
  results).
- sessionize: the session_window split model (new session only when
  the inter-event gap is STRICTLY greater than the timeout — an
  event at exactly prev + gap still extends the session, i.e. Spark
  merges on window-end inclusively; the strategy generates
  exact-boundary gaps so this stays pinned).
- brute_topk: exact cosine top-k vs a Python model with the same
  (cos desc, neighbor id asc) tie-break and round_to(4) output.
"""

from __future__ import annotations

import math
from datetime import datetime, timezone

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # key (hot: few keys)
            st.integers(min_value=-50, max_value=50),
        ),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=1, max_value=8),  # nsalt
)
def test_salted_agg_equals_plain_agg(spark, rows, nsalt):
    from pyspark.sql import functions as F

    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import skew

    df = spark.createDataFrame(rows, "k int, v long")
    got = sorted(
        tuple(r)
        for r in skew.salted_agg(
            df,
            ["k"],
            {
                "s": ("sum", "v"),
                "n": ("count", "v"),
                "mn": ("min", "v"),
                "mx": ("max", "v"),
            },
            nsalt=nsalt,
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in df.groupBy("k")
        .agg(
            F.sum("v").alias("s"),
            F.count("v").alias("n"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    )
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),  # fact key
            st.integers(min_value=0, max_value=99),  # payload
        ),
        min_size=1,
        max_size=30,
    ),
    st.lists(
        st.integers(min_value=0, max_value=5),  # dim keys (some missing)
        min_size=0,
        max_size=4,
        unique=True,
    ),
    st.integers(min_value=1, max_value=5),  # nsalt
    st.sampled_from(["inner", "left"]),
)
def test_salted_join_equals_plain_join(spark, fact_rows, dim_keys, nsalt, how):
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import skew

    fact = spark.createDataFrame(fact_rows, "k int, p long")
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in dim_keys] or [(99, "none")], "k int, label string"
    )
    got = sorted(
        tuple(r)
        for r in skew.salted_join(fact, dim, ["k"], nsalt=nsalt, how=how).collect()
    )
    want = sorted(tuple(r) for r in fact.join(dim, on=["k"], how=how).collect())
    assert got == want


_GAPS = st.lists(
    # inter-event gaps in seconds: cluster around the 1800 s timeout,
    # INCLUDING the exact boundary
    st.sampled_from([0, 1, 60, 1799, 1800, 1801, 4000]),
    min_size=0,
    max_size=10,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_GAPS, min_size=1, max_size=3))
def test_sessionize_matches_gap_split_model(spark, users_gaps):
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import sessionize

    base = int(datetime(2024, 3, 1, tzinfo=timezone.utc).timestamp())
    rows, model = [], []
    for u, gaps in enumerate(users_gaps):
        ts, all_ts = base, [base]
        for g in gaps:
            ts += g
            all_ts.append(ts)
        for t in all_ts:
            rows.append((u, datetime.fromtimestamp(t, tz=timezone.utc)))
        # split model: only a gap STRICTLY > 1800 s starts a new
        # session (hypothesis found the boundary: session_window
        # merges an event landing at exactly prev + gap)
        sessions, cur = [], [all_ts[0]]
        for prev, t in zip(all_ts, all_ts[1:]):
            if t - prev > 1800:
                sessions.append(cur)
                cur = [t]
            else:
                cur.append(t)
        sessions.append(cur)
        for s in sessions:
            model.append((u, min(s), len(s), max(s) - min(s), len(s) == 1))

    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    out = sessionize.sessionize(df, gap="30 minutes").collect()
    got = sorted(
        (
            r["user_id"],
            int(r["session_start"].replace(tzinfo=timezone.utc).timestamp()),
            r["n_events"],
            r["duration_sec"],
            r["is_bounce"],
        )
        for r in out
    )
    assert got == sorted(model), (users_gaps, got)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.lists(
            st.integers(min_value=-5, max_value=5),
            min_size=3,
            max_size=3,
        ).filter(lambda v: any(v)),  # nonzero vectors only
        min_size=2,
        max_size=12,
    ),
    st.integers(min_value=1, max_value=4),  # k
)
def test_brute_topk_matches_python_model(spark, vecs, k):
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import similarity

    data = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    queries = df.selectExpr("vec_id AS query_id", "embedding").limit(3)
    out = similarity.brute_topk(df, queries, k=k).collect()
    got = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["cos"]) for r in out
    )

    model = []
    qids = [r["query_id"] for r in queries.collect()]
    by_id = dict(data)
    for qid in qids:
        qv = by_id[qid]
        qn = math.sqrt(sum(x * x for x in qv))
        scored = []
        for nid, nv in data:
            if nid == qid:
                continue
            nn = math.sqrt(sum(x * x for x in nv))
            cos = sum(a * b for a, b in zip(nv, qv)) / (nn * qn)
            scored.append((-cos, nid))
        for rank, (negcos, nid) in enumerate(sorted(scored)[:k], start=1):
            model.append(
                (qid, rank, nid, math.floor(-negcos * 1e4 + 0.5) / 1e4)
            )
    model = sorted(model)
    # ids/ranks must agree exactly; the cos VALUE is compared with a
    # tolerance because the Python model is only bit-identical to the
    # JVM while the dot-product summation order matches — integer-
    # valued dim-3 vectors make it exact today, but a dim or
    # aggregation-order change must not surface as a round_to-boundary
    # hypothesis flake
    assert [t[:3] for t in got] == [t[:3] for t in model], (vecs, got)
    for (_, _, _, gc), (_, _, _, mc) in zip(got, model):
        assert math.isclose(gc, mc, abs_tol=1e-9), (vecs, got)

@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(  # vectors, zero vectors allowed (they must land in cid 0)
        st.lists(
            st.integers(min_value=-5, max_value=5), min_size=3, max_size=3
        ),
        min_size=1,
        max_size=12,
    ),
    st.lists(  # centroids, nonzero rows (zero rows are a typed refusal)
        st.lists(
            st.integers(min_value=-3, max_value=3), min_size=3, max_size=3
        ).filter(lambda v: any(v)),
        min_size=1,
        max_size=6,
    ),
)
def test_assign_lists_matches_python_argmax_model(spark, vecs, cents):
    """The r16 O(nlist) native argmax (unit-normalized centroid dots,
    array_max + first array_position) against an exact Python model
    using the SAME ieee operation order: driver-side centroid
    normalization is literally the same Python expression, and the
    Spark dot is a left fold, so scores match bit-for-bit and the
    first-max tie-break must agree exactly — including zero vectors
    (all scores 0.0 -> cid 0) and duplicate centroids (lowest cid
    wins)."""
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import similarity

    data = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    cent_rows = [[float(x) for x in c] for c in cents]
    got = {
        r["nn_id"]: r["cid"]
        for r in similarity.assign_lists(df, cent_rows).collect()
    }

    # model: same normalization arithmetic, left-fold dot, first max
    unit = []
    for row in cent_rows:
        n = sum(x * x for x in row) ** 0.5
        unit.append([x / n for x in row])
    model = {}
    for i, v in data:
        scores = []
        for c in unit:
            acc = 0.0
            for a, b in zip(v, c):
                acc = acc + a * b
            scores.append(acc)
        model[i] = scores.index(max(scores))
    assert got == model, (vecs, cents, got, model)


def test_assign_lists_refuses_zero_norm_centroid(spark):
    """Zero-norm centroid rows have no cosine ordering; the index
    build refuses them loudly instead of silently ranking by raw
    dot."""
    import pytest

    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import similarity

    df = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="zero-norm centroid"):
        similarity.assign_lists(df, [[1.0, 0.0], [0.0, 0.0]])

@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(  # query vectors (nonzero: zero-norm queries carry NULL
        st.lists(  # cosines whose CH-style ordering is pinned in unit
            st.integers(min_value=-5, max_value=5), min_size=3, max_size=3
        ).filter(lambda v: any(v)),  # tests, not here)
        min_size=1,
        max_size=8,
    ),
    st.lists(  # centroids, nonzero
        st.lists(
            st.integers(min_value=-3, max_value=3), min_size=3, max_size=3
        ).filter(lambda v: any(v)),
        min_size=2,
        max_size=6,
    ),
    st.integers(min_value=1, max_value=4),  # nprobe
)
def test_probe_frame_matches_python_topn_model(spark, qvecs, cents, nprobe):
    """The query-side probe selection (_probe_frame over _best_cids:
    per-query top-nprobe centroid cids, cos desc, cid asc ties)
    against an exact Python model with the same arithmetic order —
    integer-valued dim-3 vectors make the cosine comparisons exact.
    Together with the assign_lists model test this pins BOTH sides of
    the IVF contract: where vectors go, and where queries look."""
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import similarity

    n = min(nprobe, len(cents))
    qs = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(qvecs)],
        "query_id long, embedding array<double>",
    )
    cent_rows = [[float(x) for x in c] for c in cents]
    got = {}
    probe = similarity._probe_frame(
        qs, similarity._centroid_literal(cent_rows), n,
        "query_id", "embedding",
    )
    for r in probe.collect():
        got.setdefault(r["query_id"], []).append(r["cid"])

    for qid, v in enumerate(qvecs):
        qn = math.sqrt(sum(x * x for x in v))
        scored = []
        for cid, c in enumerate(cent_rows):
            cn = math.sqrt(sum(x * x for x in c))
            acc = 0.0
            for a, b in zip(v, c):
                acc = acc + a * b
            scored.append((-(acc / (qn * cn)), cid))
        want = [cid for _, cid in sorted(scored)[:n]]
        assert got[qid] == want, (qvecs, cents, qid, got[qid], want)
