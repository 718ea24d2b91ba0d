"""Hypothesis property test for operators/rangejoin.interval_join
against a brute-force containment model.

The operator's date-bucket explode + equi-join + between-refine must
equal the naive "every (fact, dim) pair with from <= point <= to"
join — for any granularity (bucketing only changes the plan, never
the result), any inverted/degenerate intervals (from > to matches
nothing), explicit or derived bounds, and inner/left how.
"""

from __future__ import annotations

from datetime import date, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_D0 = date(2024, 1, 1)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(  # fact: (equi key, day offset)
        st.tuples(
            st.integers(min_value=0, max_value=1),
            st.integers(min_value=0, max_value=40),
        ),
        min_size=1,
        max_size=12,
    ),
    st.lists(  # dim: (equi key, from offset, to offset) — may invert
        st.tuples(
            st.integers(min_value=0, max_value=1),
            st.integers(min_value=0, max_value=40),
            st.integers(min_value=0, max_value=40),
        ),
        min_size=0,
        max_size=8,
    ),
    st.sampled_from(["day", "week", "month"]),
    st.sampled_from(["inner", "left"]),
    st.booleans(),  # explicit (wide) bounds vs derived
)
def test_interval_join_matches_containment_model(
    spark, facts, dims, granularity, how, explicit_bounds
):
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import rangejoin

    fact_rows = [
        (i, k, _D0 + timedelta(days=d)) for i, (k, d) in enumerate(facts)
    ]
    dim_rows = [
        (j, k, _D0 + timedelta(days=a), _D0 + timedelta(days=b))
        for j, (k, a, b) in enumerate(dims)
    ]
    fact = spark.createDataFrame(fact_rows, "fid long, k int, p date")
    dim = spark.createDataFrame(
        dim_rows or [(99, 9, _D0, _D0)], "did long, dk int, f date, t date"
    )
    bounds = (
        (_D0 - timedelta(days=7), _D0 + timedelta(days=60))
        if explicit_bounds
        else None
    )
    out = rangejoin.interval_join(
        fact,
        dim,
        "p",
        "f",
        "t",
        equi=[("k", "dk")],
        granularity=granularity,
        how=how,
        bounds=bounds,
    ).collect()
    got = sorted((r["fid"], r["did"]) for r in out)

    model = []
    for fid, k, p in fact_rows:
        matched = False
        for did, dk, f, t in dim_rows:
            if dk == k and f <= p <= t:
                model.append((fid, did))
                matched = True
        if not matched and how == "left":
            model.append((fid, None))
    assert got == sorted(model), (facts, dims, granularity, how, got)
