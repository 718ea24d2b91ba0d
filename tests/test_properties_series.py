"""Hypothesis property tests for the remaining operators/series.py
window forms against Python models: moving_agg (all four heads),
delta_sum, running_difference, neighbor (both directions, with and
without default), and fill_series on an integer axis (dense spine,
static fills, interpolate carry-forward, explicit bounds).

Rows get a unique index column so every window order is total — the
same determinism convention as the limit_by model in
test_properties.py.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # key
        st.integers(min_value=-20, max_value=20),  # value
    ),
    min_size=1,
    max_size=25,
)


def _grouped(data):
    by_key: dict[int, list[tuple[int, int]]] = {}
    for k, v, i in data:
        by_key.setdefault(k, []).append((i, v))
    for vs in by_key.values():
        vs.sort()
    return by_key


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_ROWS, st.integers(min_value=1, max_value=5),
       st.sampled_from(["avg", "sum", "min", "max"]))
def test_moving_agg_matches_sliding_model(spark, rows, window, agg):
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import series

    data = [(k, v, i) for i, (k, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "k int, v long, idx int")
    out = series.moving_agg(df, ["k"], "idx", "v", window, agg=agg).collect()
    got = {r["idx"]: r["mov"] for r in out}
    fn = {"avg": lambda xs: sum(xs) / len(xs), "sum": sum,
          "min": min, "max": max}[agg]
    for vs in _grouped(data).values():
        for pos, (i, _v) in enumerate(vs):
            frame = [v for _, v in vs[max(0, pos - window + 1): pos + 1]]
            want = fn(frame)
            assert got[i] == want, (rows, window, agg, i, got[i], want)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_ROWS)
def test_delta_sum_and_running_difference_match_models(spark, rows):
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import series

    data = [(k, v, i) for i, (k, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "k int, v long, idx int")
    ds = {
        r["k"]: r["delta_sum"]
        for r in series.delta_sum(df, ["k"], "idx", "v").collect()
    }
    rd = {
        r["idx"]: r["diff"]
        for r in series.running_difference(df, ["k"], "idx", "v").collect()
    }
    for k, vs in _grouped(data).items():
        vals = [v for _, v in vs]
        assert ds[k] == sum(
            max(b - a, 0) for a, b in zip(vals, vals[1:])
        ), (rows, k)
        assert rd[vs[0][0]] is None  # first row per key: NULL
        for (i0, a), (i1, b) in zip(vs, vs[1:]):
            assert rd[i1] == b - a, (rows, i1)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_ROWS, st.integers(min_value=-3, max_value=3), st.booleans())
def test_neighbor_matches_lead_lag_model(spark, rows, offset, use_default):
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import series

    data = [(k, v, i) for i, (k, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "k int, v long, idx int")
    out = series.neighbor(
        df, ["k"], "idx", "v", offset, default=-99 if use_default else None
    ).collect()
    got = {r["idx"]: r["neighbor"] for r in out}
    for vs in _grouped(data).values():
        for pos, (i, _v) in enumerate(vs):
            j = pos + offset
            want = vs[j][1] if 0 <= j < len(vs) else None
            if want is None and use_default:
                want = -99
            assert got[i] == want, (rows, offset, i, got[i], want)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(  # sparse (axis, n, carry) points; axis unique
        st.tuples(
            st.integers(min_value=0, max_value=15),
            st.integers(min_value=1, max_value=9),
            st.integers(min_value=0, max_value=9),
        ),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    ),
    st.booleans(),  # explicit bounds
)
def test_fill_series_integer_axis_matches_model(spark, points, explicit):
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import series

    df = spark.createDataFrame(points, "x long, n long, c long")
    bounds = (0, 20) if explicit else None
    out = series.fill_series(
        df, "x", step="1", fill={"n": 0}, bounds=bounds, interpolate=("c",)
    ).collect()
    got = {r["x"]: (r["n"], r["c"]) for r in out}

    by_x = {x: (n, c) for x, n, c in points}
    lo, hi = (0, 20) if explicit else (min(by_x), max(by_x))
    assert set(got) == set(range(lo, hi + 1))  # dense spine
    carried = None
    for x in range(lo, hi + 1):
        if x in by_x:
            n, carried = by_x[x]
        else:
            n = 0  # static fill default
        assert got[x] == (n, carried), (points, x, got[x])
