"""Tie-free funnel/sequence property tests against the LITERAL
ClickHouse scan algorithms (r13 verdict task 5).

tests/test_properties.py already pins ``window_funnel`` (both modes)
to multi-anchor / instant-collapse reference models — models written
in the same *formulation* as the operator.  These tests use the other
formulation: the event-by-event scan state machines that the
ClickHouse docs describe (windowFunnel strict_order's
break-on-interleave scan; the default mode's advance-on-match scan;
sequenceCount's waiting-1/waiting-2 machine).  On streams with NO
equal timestamps per user the two formulations are defined to
coincide — our documented tie-rule deviations (module docstring of
operators/funnel.py, COVERAGE.md) only exist AT ties — so agreement
here pins the operator to CH's published semantics exactly in the
regime where CH itself is deterministic.

The sequence_count test additionally covers the ``tiebreak_col``
path on streams WITH ties: with a unique secondary order column the
operator documents (ts, tiebreak) scan order, which the model
reproduces — the path the existing tie-free property test skips.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# tie-free stream: unique ts per user, so CH scan semantics are
# deterministic and coincide with the operator's documented tie rules
_tie_free_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),    # user
        st.integers(min_value=0, max_value=400),  # ts offset seconds
        st.integers(min_value=1, max_value=4),    # step (4 = noise)
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda e: (e[0], e[1]),
)


def _by_user(events):
    users = {u for u, _, _ in events}
    return {
        u: sorted((ts, s) for uu, ts, s in events if uu == u)
        for u in users
    }


def _ch_default_scan(events, n_steps, window_s):
    """CH windowFunnel(window)(ts, c1..ck) WITHOUT strict_order, as the
    docs describe it: for each step-1 anchor, scan FORWARD through the
    user's events in time order; an event matching the next expected
    condition (strictly later — tie-free by construction) and within
    the anchor's window advances the chain; anything else is skipped."""
    out = {}
    for u, mine in _by_user(events).items():
        best = 0
        for i, (t1, s1) in enumerate(mine):
            if s1 != 1:
                continue
            depth, expect = 1, 2
            for ts, s in mine[i + 1:]:
                if expect > n_steps or ts > t1 + window_s:
                    break
                if s == expect:
                    depth, expect = expect, expect + 1
            best = max(best, depth)
        out[u] = best
    return out


def _ch_strict_order_scan(events, n_steps, window_s):
    """CH strict_order scan: the chain from each step-1 anchor must
    advance on EVERY following event — an event that is not the next
    expected condition breaks it (the docs' A->B->D->C example stops
    at D with depth 2)."""
    out = {}
    for u, mine in _by_user(events).items():
        best = 0
        for i, (t1, s1) in enumerate(mine):
            if s1 != 1:
                continue
            depth, expect = 1, 2
            for ts, s in mine[i + 1:]:
                if expect > n_steps:
                    break
                if s == expect and ts <= t1 + window_s:
                    depth, expect = expect, expect + 1
                else:
                    break
            best = max(best, depth)
        out[u] = best
    return out


def _spark_funnel(spark, events, window_s, mode):
    from pyspark.sql import functions as F

    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import funnel

    base = datetime(2023, 10, 1)
    rows = [(u, base + timedelta(seconds=s), step) for u, s, step in events]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, step int")
    return {
        r["user_id"]: r["depth"]
        for r in funnel.window_funnel(
            df,
            "user_id",
            "ts",
            [F.col("step") == 1, F.col("step") == 2, F.col("step") == 3],
            window_seconds=window_s,
            mode=mode,
        ).collect()
    }


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_tie_free_events, st.integers(min_value=1, max_value=300))
def test_default_funnel_tiefree_matches_ch_scan(spark, events, window_s):
    got = _spark_funnel(spark, events, window_s, mode=None)
    assert got == _ch_default_scan(events, 3, window_s), events


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_tie_free_events, st.integers(min_value=1, max_value=300))
def test_strict_order_tiefree_matches_ch_scan(spark, events, window_s):
    got = _spark_funnel(spark, events, window_s, mode="strict_order")
    assert got == _ch_strict_order_scan(events, 3, window_s), events


# --------------------------------------------------------------------------
# sequence_count_pairs with ties + tiebreak_col: the operator documents
# (ts, tiebreak) scan order; the CH state machine over that total order
# is the model.  Event ids are globally unique, so the order is total.
# --------------------------------------------------------------------------
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),   # user
            st.integers(min_value=0, max_value=12),  # ts (ties likely)
            st.integers(min_value=1, max_value=3),   # step (3 = noise)
        ),
        min_size=1,
        max_size=40,
    )
)
def test_sequence_count_ties_resolved_by_tiebreak_col(spark, events):
    from pyspark.sql import functions as F

    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import funnel

    base = datetime(2023, 10, 1)
    rows = [
        (i, u, base + timedelta(seconds=s), step)
        for i, (u, s, step) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, step int"
    )
    got = {
        r["user_id"]: r["n_matches"]
        for r in funnel.sequence_count_pairs(
            df,
            "user_id",
            "ts",
            F.col("step") == 1,
            F.col("step") == 2,
            tiebreak_col="event_id",
        ).collect()
    }

    model = {}
    for u in {u for u, _, _ in events}:
        mine = sorted(
            (s, i, step)
            for i, (uu, s, step) in enumerate(events)
            if uu == u
        )  # total order: (ts, event_id)
        state, n = 1, 0
        for _, _, step in mine:
            if state == 1 and step == 1:
                state = 2
            elif state == 2 and step == 2:
                n += 1
                state = 1
        model[u] = n
    assert got == model, events
