"""Hypothesis property test for operators/maps.agg_map's min/max/sum
heads against a dict-merge model (test_properties.py covers the
sum_map specialization; this exercises the shared head machinery plus
the documented edge semantics: null/empty arrays, all-empty groups
surviving with ([], []), and NULL group keys kept as a real group).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_ROW = st.tuples(
    st.one_of(st.none(), st.integers(min_value=0, max_value=2)),  # group
    st.one_of(
        st.none(),
        st.lists(
            st.tuples(
                st.sampled_from(["a", "b", "c"]),  # key
                st.integers(min_value=-9, max_value=9),  # val
            ),
            min_size=0,
            max_size=4,
        ),
    ),
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_ROW, min_size=1, max_size=15), st.sampled_from(["sum", "min", "max"]))
def test_agg_map_matches_dict_merge_model(spark, rows, how):
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import maps

    data = [
        (
            g,
            [k for k, _ in kv] if kv is not None else None,
            [v for _, v in kv] if kv is not None else None,
        )
        for g, kv in rows
    ]
    df = spark.createDataFrame(
        data, "g int, ks array<string>, vs array<long>"
    )
    out = maps.agg_map(df, ["g"], "ks", "vs", how=how).collect()
    got = {r["g"]: (r["map_keys"], r["map_vals"]) for r in out}

    merge = {"sum": lambda a, b: a + b, "min": min, "max": max}[how]
    model: dict[object, dict[str, int]] = {}
    for g, kv in rows:
        model.setdefault(g, {})
        for k, v in kv or []:
            model[g][k] = merge(model[g][k], v) if k in model[g] else v
    assert set(got) == set(model)  # all groups kept, incl. NULL g
    for g, m in model.items():
        keys = sorted(m)
        assert got[g] == (keys, [m[k] for k in keys]), (rows, how, g, got[g])
