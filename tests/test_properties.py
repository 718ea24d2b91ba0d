"""Hypothesis property tests (SURVEY.md section 5 item 5).

Spark round-trips are expensive, so the ledger property batches each
generated scenario into ONE job; pure-Python components (alias
inlining, BPE estimator vs its spec) get full-speed fuzzing.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from yc_data_transfer_clickhouse_from_yandex_metrica_spark.plans.alias import inline_aliases


# --------------------------------------------------------------------------
# CDC ledger: any upsert/delete interleaving keeps the invariants
# --------------------------------------------------------------------------
events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key
        st.integers(min_value=0, max_value=99),  # metric
        st.booleans(),  # delete?
    ),
    min_size=1,
    max_size=12,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events_strategy)
def test_ledger_invariants_any_interleaving(spark, events):
    """Replay events through a model: upsert => cancel prior + new
    version; delete => cancel prior.  Ledger invariants:
    sum(Sign) == live count, collapsed() == model's live rows."""
    from pyspark.sql import functions as F

    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import collapse

    model: dict[int, tuple[int, int]] = {}
    last_ver: dict[int, int] = {}  # versions are MONOTONE per key, never
    rows = []  # reset on delete -- the CDC wire contract (ddl/visits.sql:10)
    for key, metric, delete in events:
        cur = model.get(key)
        if delete:
            if cur is not None:
                ver, m = cur
                rows.append((key, m, -1, ver))
                del model[key]
        else:
            if cur is not None:
                ver, m = cur
                rows.append((key, m, -1, ver))
            new_ver = last_ver.get(key, 0) + 1
            rows.append((key, metric, 1, new_ver))
            model[key] = (new_ver, metric)
            last_ver[key] = new_ver
    if not rows:
        return
    df = spark.createDataFrame(
        rows, "VisitID long, metric long, Sign int, VisitVersion int"
    )
    live = df.agg(collapse.sign_count().alias("n")).collect()[0]["n"]
    assert live == len(model)
    got = {
        (r["VisitID"], r["VisitVersion"], r["metric"])
        for r in collapse.collapsed(df, key=["VisitID"]).collect()
    }
    assert got == {(k, v, m) for k, (v, m) in model.items()}
    msum = df.agg(collapse.sign_sum("metric").alias("s")).collect()[0]["s"]
    assert msum == sum(m for _, m in model.values())


# --------------------------------------------------------------------------
# Alias inlining: fuzz names/expressions around string literals
# --------------------------------------------------------------------------
ident = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=8
)


@settings(max_examples=200, deadline=None)
@given(ident, ident, st.sampled_from(["sum(Sign)", "a + b", "count(1)"]))
def test_inline_aliases_never_touches_literals(alias, literal_text, expr):
    pred = f"`{alias}` > 0 AND note = '{literal_text}'"
    out = inline_aliases(pred, {alias: expr})
    assert f"({expr}) > 0" in out
    assert f"'{literal_text}'" in out  # string literal byte-identical
