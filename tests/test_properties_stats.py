"""Hypothesis property tests for operators/stats.py and
operators/sampling.py against pure-Python models.

quantile_exact already has a property model (test_properties.py);
this adds the weighted variant (vs expand-the-multiset indexing),
histogram (vs the exact bin arithmetic incl. clamp/degenerate rules),
entropy (vs -sum p*log2 p), weighted heavy_hitters, and the
deterministic-sampling invariants that are the operators' actual
contract: sample_mod equals its modular model, the hash buckets of
sample_hash partition the table, and stratified_sample keeps
verdicts consistent across tables and monotone in the rate map.
"""

from __future__ import annotations

import math

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
            st.integers(min_value=0, max_value=2),  # group
            st.integers(min_value=-20, max_value=20),  # value
            st.integers(min_value=-2, max_value=5),  # weight (<=0 ignored)
        ),
        min_size=1,
        max_size=25,
    ),
    st.sampled_from(["low", "high"]),
)
def test_quantile_exact_weighted_matches_expand_model(spark, rows, variant):
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import stats

    qs = {"q0": 0.0, "q33": 0.33, "q50": 0.5, "q90": 0.9, "q100": 1.0}
    df = spark.createDataFrame(rows, "g int, v long, w long")
    out = stats.quantile_exact_weighted(df, ["g"], "v", "w", qs, variant)
    got = {r["g"]: {k: r[k] for k in qs} for r in out.collect()}

    by_g: dict[int, list[int]] = {}
    for g, v, w in rows:
        if w > 0:
            by_g.setdefault(g, []).extend([v] * w)
    rank_fn = math.floor if variant == "low" else math.ceil
    for g, vals in by_g.items():
        vals.sort()
        n = len(vals)
        for name, q in qs.items():
            r = rank_fn(q * (n - 1))
            assert got[g][name] == vals[r], (g, name, vals, got[g])
    # groups with only non-positive weights vanish entirely
    assert set(got) == set(by_g)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.one_of(st.none(), st.floats(min_value=-50, max_value=50, width=32)),
        min_size=1,
        max_size=25,
    ),
    st.integers(min_value=1, max_value=6),  # nbins
    st.one_of(
        st.none(),
        st.tuples(
            st.integers(min_value=-10, max_value=10),
            st.integers(min_value=-10, max_value=10),
        ),
    ),
)
def test_histogram_matches_bin_model(spark, values, nbins, bounds):
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import stats

    df = spark.createDataFrame([(v,) for v in values], "v double")
    out = stats.histogram(df, "v", nbins, bounds=bounds).collect()
    got = {r["bin"]: (r["n"], r["lo"], r["hi"]) for r in out}

    present = [float(v) for v in values if v is not None]
    if not present:
        assert got == {}
        return
    lo, hi = (
        (float(bounds[0]), float(bounds[1]))
        if bounds is not None
        else (min(present), max(present))
    )
    width = (hi - lo) / float(nbins)
    model: dict[int, int] = {}
    for v in present:
        if hi <= lo:
            b = 0
        else:
            b = max(0, min(int(math.floor((v - lo) / width)), nbins - 1))
        model[b] = model.get(b, 0) + 1
    assert {b: n for b, (n, _, _) in got.items()} == model, (values, got)
    for b, (_, blo, bhi) in got.items():
        assert math.isclose(blo, lo + b * width, rel_tol=0, abs_tol=1e-9)
        assert math.isclose(bhi, lo + (b + 1) * width, rel_tol=0, abs_tol=1e-9)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),  # group
            st.sampled_from(["a", "b", "c", "d"]),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_entropy_matches_shannon_model(spark, rows):
    from collections import Counter

    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import stats

    df = spark.createDataFrame(rows, "g int, v string")
    got = {r["g"]: r["entropy"] for r in stats.entropy(df, ["g"], "v").collect()}
    by_g: dict[int, list[str]] = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, vs in by_g.items():
        n = len(vs)
        want = -sum(
            (c / n) * math.log2(c / n) for c in Counter(vs).values()
        )
        assert math.isclose(got[g], want, rel_tol=1e-9, abs_tol=1e-12), (
            g,
            vs,
            got[g],
            want,
        )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c", "d", "e"]),
            st.integers(min_value=1, max_value=9),  # weight
        ),
        min_size=1,
        max_size=25,
    ),
    st.integers(min_value=1, max_value=4),
)
def test_heavy_hitters_weighted_matches_model(spark, rows, k):
    from collections import Counter

    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import stats

    df = spark.createDataFrame(rows, "v string, w long")
    out = stats.heavy_hitters(df, ["v"], k, weight_col="w").collect()
    got = [(r["v"], r["freq"]) for r in out]

    freqs = Counter()
    for v, w in rows:
        freqs[v] += w
    model = sorted(freqs.items(), key=lambda t: (-t[1], t[0]))[:k]
    assert got == model, (rows, got, model)


# --------------------------------------------------------------------------
# deterministic sampling invariants
# --------------------------------------------------------------------------
_IDS = st.lists(
    st.integers(min_value=0, max_value=10_000), min_size=1, max_size=40, unique=True
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_IDS, st.integers(min_value=1, max_value=7))
def test_sample_mod_matches_model_and_hash_buckets_partition(spark, ids, k):
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import sampling

    df = spark.createDataFrame([(i,) for i in ids], "id long")
    for bucket in range(min(k, 3)):
        got = sorted(
            r["id"] for r in sampling.sample_mod(df, "id", k, bucket).collect()
        )
        assert got == sorted(i for i in ids if i % k == bucket)
    # xxhash64 buckets partition the table: disjoint, exhaustive
    seen: list[int] = []
    for bucket in range(k):
        seen.extend(
            r["id"] for r in sampling.sample_hash(df, "id", k, bucket).collect()
        )
    assert sorted(seen) == sorted(ids)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    _IDS,
    st.sampled_from([0.0, 0.01, 0.1, 0.5, 1.0]),
    st.sampled_from([0.0, 0.01, 0.1, 0.5, 1.0]),
)
def test_stratified_sample_monotone_and_cross_table_consistent(
    spark, ids, r_hi, r_lo
):
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import sampling

    rows = [(i, "hi" if i % 2 == 0 else "lo") for i in ids]
    df = spark.createDataFrame(rows, "id long, stratum string")
    rates = {"hi": r_hi, "lo": r_lo}
    kept = {r["id"] for r in sampling.stratified_sample(df, "id", "stratum", rates).collect()}

    # raising every rate only ADDS rows (the SAMPLE-BY nesting property)
    raised = {s: min(1.0, r * 2 + 0.05) for s, r in rates.items()}
    kept_up = {
        r["id"]
        for r in sampling.stratified_sample(df, "id", "stratum", raised).collect()
    }
    assert kept <= kept_up, (sorted(kept - kept_up), rates, raised)

    # a second table sharing keys gets the identical verdict per key
    df2 = spark.createDataFrame(
        [(i, s, i * 10) for i, s in rows], "id long, stratum string, payload long"
    )
    kept2 = {
        r["id"]
        for r in sampling.stratified_sample(df2, "id", "stratum", rates).collect()
    }
    assert kept2 == kept

    # a stratum absent from the map is dropped entirely
    only_hi = {
        r["id"]
        for r in sampling.stratified_sample(df, "id", "stratum", {"hi": 1.0}).collect()
    }
    assert only_hi == {i for i in ids if i % 2 == 0}

    # rate 1.0 keeps the whole stratum, rate 0.0 keeps none of it
    if rates["hi"] == 1.0:
        assert {i for i in kept if i % 2 == 0} == {i for i in ids if i % 2 == 0}
    if rates["hi"] == 0.0:
        assert not {i for i in kept if i % 2 == 0}
