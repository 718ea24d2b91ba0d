"""Hypothesis property test for operators/rangejoin.asof_join against
a Python nearest-match model — all four CH comparators, both join
types, NULL times on both sides (the r12-hardened semantics: a NULL
time never matches anything).

Right (key, time) pairs are generated unique per key, which is the
operator's documented determinism precondition.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(  # left rows: (key, time-or-None)
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.one_of(st.none(), st.integers(min_value=0, max_value=20)),
        ),
        min_size=1,
        max_size=15,
    ),
    st.lists(  # right rows: (key, time-or-None); (k, t) unique below
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.one_of(st.none(), st.integers(min_value=0, max_value=20)),
        ),
        min_size=0,
        max_size=15,
    ),
    st.sampled_from([">=", ">", "<=", "<"]),
    st.sampled_from(["left", "inner"]),
)
def test_asof_join_matches_nearest_model(spark, lrows, rrows_raw, op, how):
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import rangejoin

    # enforce the documented (key, right_time) uniqueness precondition
    seen: set[tuple[int, int | None]] = set()
    rrows = []
    for k, t in rrows_raw:
        if (k, t) not in seen:
            seen.add((k, t))
            rrows.append((k, t, k * 1000 + (t if t is not None else 999)))

    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lrows)],
        "lid long, k int, lt long",
    )
    right = spark.createDataFrame(
        rrows or [(99, 0, 0)], "k int, rt long, v long"
    )
    out = rangejoin.asof_join(
        left, right, "k", "lt", "rt", ["v"], how=how, inequality=op
    ).collect()
    got = sorted((r["lid"], r["v"]) for r in out)

    cmp = {
        ">=": lambda lt, rt: lt >= rt,
        ">": lambda lt, rt: lt > rt,
        "<=": lambda lt, rt: lt <= rt,
        "<": lambda lt, rt: lt < rt,
    }[op]
    nearest = max if op in (">=", ">") else min
    model = []
    for i, (k, lt) in enumerate(lrows):
        match = None
        if lt is not None:
            cands = [
                (rt, v)
                for rk, rt, v in rrows
                if rk == k and rt is not None and cmp(lt, rt)
            ]
            if cands:
                match = nearest(cands)[1]
        if match is None and how == "inner":
            continue
        model.append((i, match))
    assert got == sorted(model), (lrows, rrows, op, how, got)
