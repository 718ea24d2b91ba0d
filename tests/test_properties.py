"""Hypothesis property tests (SURVEY.md section 5 item 5).

Spark round-trips are expensive, so the ledger property batches each
generated scenario into ONE job; pure-Python components (alias
inlining, BPE estimator vs its spec) get full-speed fuzzing.
"""

from __future__ import annotations

from hypothesis import HealthCheck, example, given, settings
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


# --------------------------------------------------------------------------
# quantile_exact == python sorted-index reference for ANY groups/level
# --------------------------------------------------------------------------
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.floats(
                min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
            ),
        ),
        min_size=1,
        max_size=50,
    ),
    st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
)
def test_quantile_exact_any_groups_and_level(spark, data, q):
    """Both variants must equal indexing the Python-sorted group at
    floor/ceil(q*(n-1)) -- the selection is pure rank arithmetic, so
    equality is exact (no float tolerance)."""
    import math

    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import stats

    df = spark.createDataFrame([(f"g{g}", v) for g, v in data], "g string, v double")
    by_group: dict[str, list[float]] = {}
    for g, v in data:
        by_group.setdefault(f"g{g}", []).append(v)
    for variant, rank in (("low", math.floor), ("high", math.ceil)):
        got = {
            r["g"]: r["p"]
            for r in stats.quantile_exact(df, ["g"], "v", {"p": q}, variant=variant).collect()
        }
        for g, vals in by_group.items():
            s = sorted(vals)
            assert got[g] == s[rank(q * (len(s) - 1))], (variant, g, q)


# --------------------------------------------------------------------------
# window_funnel == pure-Python multi-anchor reference for ANY stream
# --------------------------------------------------------------------------
def _funnel_ref(events, n_steps, window_s):
    """CH multi-anchor max-chain reference: EVERY step-1 event anchors
    a candidate chain; each next step binds to the earliest matching
    event strictly after the previous bind and within window of that
    anchor (greedy earliest binding is depth-optimal); result = the
    deepest chain over all anchors."""
    depth_by_user: dict[int, int] = {}
    users = {u for u, _, _ in events}
    for u in users:
        mine = sorted([(ts, s) for uu, ts, s in events if uu == u])
        best = 0
        for t1, s1 in mine:
            if s1 != 1:
                continue
            depth = 1
            t_prev = t1
            for step in range(2, n_steps + 1):
                cands = [
                    ts
                    for ts, s in mine
                    if s == step and ts > t_prev and ts <= t1 + window_s
                ]
                if not cands:
                    break
                t_prev = min(cands)
                depth = step
            best = max(best, depth)
        depth_by_user[u] = best
    return depth_by_user


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),    # user
            st.integers(min_value=0, max_value=400),  # ts offset seconds
            st.integers(min_value=1, max_value=3),    # which step fired
        ),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=1, max_value=300),  # window seconds
)
def test_window_funnel_any_stream(spark, events, window_s):
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import funnel

    base = datetime(2023, 10, 1)
    rows = [(u, base + timedelta(seconds=s), step) for u, s, step in events]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, step int")
    got = {
        r["user_id"]: r["depth"]
        for r in funnel.window_funnel(
            df, "user_id", "ts",
            [F.col("step") == 1, F.col("step") == 2, F.col("step") == 3],
            window_seconds=window_s,
        ).collect()
    }
    assert got == _funnel_ref(events, 3, window_s)


def _funnel_strict_ref(events, n_steps, window_s):
    """strict_order reference: events sharing a timestamp form one
    instant (any matching event at the instant advances); a chain from
    each step-1 anchor must occupy CONSECUTIVE instants, breaks on the
    first non-matching instant, and is capped by the anchor's window."""
    depth_by_user: dict[int, int] = {}
    users = {u for u, _, _ in events}
    for u in users:
        by_ts: dict[int, set[int]] = {}
        for uu, ts, s in events:
            if uu == u:
                by_ts.setdefault(ts, set()).add(s)
        instants = sorted(by_ts)
        best = 0
        for i, t1 in enumerate(instants):
            if 1 not in by_ts[t1]:
                continue
            depth = 1
            for step in range(2, n_steps + 1):
                j = i + step - 1
                if (
                    j >= len(instants)
                    or instants[j] > t1 + window_s
                    or step not in by_ts[instants[j]]
                ):
                    break
                depth = step
            best = max(best, depth)
        depth_by_user[u] = best
    return depth_by_user


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),    # user
            st.integers(min_value=0, max_value=400),  # ts offset seconds
            st.integers(min_value=1, max_value=3),    # which step fired
        ),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=1, max_value=300),  # window seconds
)
def test_window_funnel_strict_any_stream(spark, events, window_s):
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import funnel

    base = datetime(2023, 10, 1)
    rows = [(u, base + timedelta(seconds=s), step) for u, s, step in events]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, step int")
    got = {
        r["user_id"]: r["depth"]
        for r in funnel.window_funnel(
            df, "user_id", "ts",
            [F.col("step") == 1, F.col("step") == 2, F.col("step") == 3],
            window_seconds=window_s,
            mode="strict_order",
        ).collect()
    }
    assert got == _funnel_strict_ref(events, 3, window_s)


# --------------------------------------------------------------------------
# scrub_pii is idempotent: redaction can never create a new match
# --------------------------------------------------------------------------
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.text(
            alphabet="abc01. @-x\n", min_size=0, max_size=60
        ),
        min_size=1,
        max_size=8,
    )
)
def test_scrub_pii_idempotent(spark, texts):
    """scrub(scrub(x)) == scrub(x) and the second pass finds 0 matches:
    '[REDACTED]' contains no digits or '@', so redaction cannot
    manufacture a new email/phone/IP -- for ANY input."""
    from pyspark.sql import functions as F

    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import text as tx

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    once = tx.scrub_pii(df).select("id", F.col("text_clean").alias("text"))
    twice = tx.scrub_pii(once).collect()
    for r in twice:
        assert r["n_pii"] == 0
        assert r["text_clean"] == r["text"]


# --------------------------------------------------------------------------
# limit_by / heavy_hitters / agg_map vs pure-Python models
# --------------------------------------------------------------------------
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # key
            st.integers(min_value=-50, max_value=50),  # value
        ),
        min_size=1,
        max_size=30,
    ),
    st.integers(min_value=1, max_value=3),  # n
    st.integers(min_value=0, max_value=2),  # offset
)
def test_limit_by_matches_python_model(spark, rows, n, offset):
    """limit_by == sort-then-slice per key, for any data/offset/n.
    Rows are made unique via an index column so the order is total."""
    from pyspark.sql import functions as F

    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import series

    data = [(k, v, i) for i, (k, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "k int, v int, idx int")
    got = sorted(
        (r["k"], r["v"], r["idx"])
        for r in series.limit_by(
            df, ["k"], n, [F.col("v").asc(), F.col("idx").asc()],
            offset=offset,
        ).collect()
    )
    model = []
    by_key: dict[int, list] = {}
    for k, v, i in data:
        by_key.setdefault(k, []).append((v, i))
    for k, vs in by_key.items():
        for v, i in sorted(vs)[offset:offset + n]:
            model.append((k, v, i))
    assert got == sorted(model)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.sampled_from(["a", "b", "c", "d", "e"]),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=1, max_value=4),
)
def test_heavy_hitters_matches_python_model(spark, values, k):
    from collections import Counter

    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import stats

    df = spark.createDataFrame([(v,) for v in values], "c string")
    got = [(r["c"], r["freq"]) for r in stats.heavy_hitters(df, ["c"], k).collect()]
    counts = Counter(values)
    model = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    assert got == model


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            # group key, INCLUDING None (the r7 restore-join bug class:
            # a NULL group must aggregate normally, never reset to [])
            st.one_of(st.none(), st.integers(min_value=0, max_value=2)),
            st.lists(
                st.tuples(
                    st.sampled_from(["x", "y", "z"]),  # map key
                    st.integers(min_value=-9, max_value=9),  # map value
                ),
                min_size=0,
                max_size=4,
            ),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_sum_map_matches_python_model(spark, rows):
    """sum_map == per-group dict-merge with sorted keys, any input
    (including rows with empty arrays, which contribute nothing, and
    NULL group keys, which aggregate like any other group)."""
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import maps

    data = [
        (g, [k for k, _ in pairs], [v for _, v in pairs])
        for g, pairs in rows
    ]
    df = spark.createDataFrame(
        data, "g int, ks array<string>, vs array<int>"
    )
    got = {
        r["g"]: (r["map_keys"], r["map_vals"])
        for r in maps.sum_map(df, ["g"], "ks", "vs").collect()
    }
    model: dict[int, dict[str, int]] = {}
    for g, pairs in rows:
        acc = model.setdefault(g, {})
        for k, v in pairs:
            acc[k] = acc.get(k, 0) + v
    expect = {
        # groups whose rows are all empty still appear, as ([], [])
        g: (sorted(d), [d[k] for k in sorted(d)])
        for g, d in model.items()
    }
    assert got == expect


# --------------------------------------------------------------------------
# with_totals multi-key == dual-aggregate union model (VERDICT r5 #6)
# --------------------------------------------------------------------------
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),   # k1
            st.integers(min_value=0, max_value=2),   # k2
            st.integers(min_value=-5, max_value=5),  # v
        ),
        min_size=1,
        max_size=30,
    ),
    st.integers(min_value=-3, max_value=3),  # HAVING threshold
)
def test_with_totals_two_key_property(spark, rows, thr):
    """n>=2 grouping keys: output must be exactly the full-detail
    groups passing HAVING plus ONE grand-total row over all rows
    computed BEFORE HAVING -- no intermediate rollup levels, totals
    row never filtered."""
    from pyspark.sql import functions as F

    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.plans.totals import (
        with_totals,
    )

    df = spark.createDataFrame(rows, "k1 int, k2 int, v int")
    out = with_totals(
        df,
        ["k1", "k2"],
        [F.sum("v").alias("s")],
        having=F.col("s") > thr,
    )
    got = {(r["k1"], r["k2"]): r["s"] for r in out.collect()}

    detail: dict[tuple[int, int], int] = {}
    for k1, k2, v in rows:
        detail[(k1, k2)] = detail.get((k1, k2), 0) + v
    expect = {k: s for k, s in detail.items() if s > thr}
    expect[(None, None)] = sum(v for _, _, v in rows)  # before HAVING
    assert got == expect


# --------------------------------------------------------------------------
# apply_versions: sequential batches keep the collapsed() preconditions
# (VERDICT r5 #7 -- monotone versions, last-write-wins, sign algebra)
# --------------------------------------------------------------------------
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(  # two-to-three sequential batches of (key, payload) states
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=3),    # key
                st.integers(min_value=0, max_value=99),   # payload
            ),
            min_size=1,
            max_size=5,
            unique_by=lambda kv: kv[0],  # one state per key per batch
        ),
        min_size=2,
        max_size=3,
    )
)
def test_apply_versions_sequential_batches(spark, batches):
    """Applying batches sequentially (each appended before the next is
    computed) must keep versions strictly monotone per key, make
    collapsed() the last-write-wins view, and keep sum(Sign) == 1 for
    every live key -- the precondition contract collapsed() documents."""
    from pyspark.sql import functions as F

    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import collapse

    schema = "VisitID int, payload int, VisitVersion int, Sign int"
    ledger = spark.createDataFrame([], schema)
    expected_state: dict[int, int] = {}
    expected_versions: dict[int, int] = {}
    for batch in batches:
        new_rows = spark.createDataFrame(
            [(k, p, None, None) for k, p in batch], schema
        ).select("VisitID", "payload")
        delta = collapse.apply_versions(ledger, new_rows, key=("VisitID",))
        ledger = ledger.unionByName(delta).localCheckpoint(eager=True)
        for k, p in batch:
            expected_state[k] = p
            expected_versions[k] = expected_versions.get(k, 0) + 1

    live = {
        r["VisitID"]: (r["payload"], r["VisitVersion"], r["Sign"])
        for r in collapse.collapsed(ledger, key=("VisitID",)).collect()
    }
    assert {k: v[0] for k, v in live.items()} == expected_state
    # versions continue monotonically: live version == number of updates
    assert {k: v[1] for k, v in live.items()} == expected_versions
    # sign algebra: net sum(Sign) per key is exactly 1 for live keys
    nets = {
        r["VisitID"]: r["net"]
        for r in ledger.groupBy("VisitID").agg(F.sum("Sign").alias("net")).collect()
    }
    assert nets == {k: 1 for k in expected_state}
    # every (key, version) pair appears at most once with sign +1
    dup = (
        ledger.where(F.col("Sign") == 1)
        .groupBy("VisitID", "VisitVersion")
        .count()
        .where(F.col("count") > 1)
        .count()
    )
    assert dup == 0


# --------------------------------------------------------------------------
# sequence_match / sequence_count_pairs vs pure-python references
# --------------------------------------------------------------------------
def _seq_match_ref(events, n_steps, gaps):
    """Subsequence e1<e2<...<ek with adjacent gap caps, exact search."""
    out = {}
    for u in {u for u, _, _ in events}:
        mine = sorted([(ts, s) for uu, ts, s in events if uu == u])

        # exhaustive DFS (tiny inputs): try every candidate per step
        def dfs(step, j0, prev_ts):
            if step > n_steps:
                return True
            for j in range(j0, len(mine)):
                ts, s = mine[j]
                if s != step:
                    continue
                if prev_ts is not None:
                    if ts <= prev_ts:
                        continue
                    g = gaps[step - 2]
                    if g is not None and ts > prev_ts + g:
                        continue
                if dfs(step + 1, j + 1, ts):
                    return True
            return False

        out[u] = 1 if dfs(1, 0, None) else 0
    return out


def _seq_count_ref(events):
    """CH sequenceCount('(?1).*(?2)') state machine: greedy scan in ts
    order, waiting-for-1 advances on step 1, waiting-for-2 completes
    on step 2 and resets."""
    out = {}
    for u in {u for u, _, _ in events}:
        mine = sorted([(ts, s) for uu, ts, s in events if uu == u])
        state, n = 1, 0
        for _, s in mine:
            if state == 1 and s == 1:
                state = 2
            elif state == 2 and s == 2:
                n += 1
                state = 1
        out[u] = n
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),    # user
            st.integers(min_value=0, max_value=400),  # ts offset seconds
            st.integers(min_value=1, max_value=3),    # step
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda e: (e[0], e[1]),  # unique ts per user (tie-free)
    ),
    st.tuples(
        st.one_of(st.none(), st.integers(min_value=1, max_value=120)),
        st.one_of(st.none(), st.integers(min_value=1, max_value=120)),
    ),
)
def test_sequence_match_any_stream(spark, events, gaps):
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import funnel

    base = datetime(2023, 10, 1)
    rows = [(u, base + timedelta(seconds=s), step) for u, s, step in events]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, step int")
    got = {
        r["user_id"]: r["matched"]
        for r in funnel.sequence_match(
            df, "user_id", "ts",
            [F.col("step") == 1, F.col("step") == 2, F.col("step") == 3],
            max_gaps=list(gaps),
        ).collect()
    }
    assert got == _seq_match_ref(events, 3, list(gaps))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=400),
            st.integers(min_value=1, max_value=3),  # step 3 = noise
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda e: (e[0], e[1]),
    )
)
def test_sequence_count_any_stream(spark, events):
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import funnel

    base = datetime(2023, 10, 1)
    rows = [(u, base + timedelta(seconds=s), step) for u, s, step in events]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, step int")
    got = {
        r["user_id"]: r["n_matches"]
        for r in funnel.sequence_count_pairs(
            df, "user_id", "ts", F.col("step") == 1, F.col("step") == 2
        ).collect()
    }
    assert got == _seq_count_ref(events)


# --------------------------------------------------------------------------
# chsql scanning primitives (round 7): structural invariants on
# arbitrary inputs -- these underpin every verbatim-SQL rewrite
# --------------------------------------------------------------------------
_sql_atoms = st.text(
    alphabet="ab,()'- \n*/x0", min_size=0, max_size=60
)


@settings(max_examples=200, deadline=None)
@given(_sql_atoms)
@example(
    s='//*/*',
).via('discovered failure')
@example(
    s='//*a*/*',  # r19: removing '/*a*/' juxtaposes '/' + '*'
).via('discovered failure')
def test_chsql_strip_comments_never_grows_and_is_single_pass(s):
    """strip_comments is a single-pass lexer, deliberately matching
    ClickHouse's own: removing a block comment can JUXTAPOSE '/' and
    '*' into text that would open a comment on a re-lex
    ('//*a*/*' -> tokens '/', '*', exactly CH's token stream), and
    neither CH nor this pipeline ever re-lexes — every chsql entry
    point (DDL parse, query parse, script split) strips exactly once.
    So idempotency is only claimed when the output cannot re-lex
    differently (no opener sequence present); the r19-discovered
    juxtaposition case pins the single-pass contract instead."""
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.plans import chsql

    out = chsql.strip_comments(s)
    assert len(out) <= len(s)
    if "--" not in out and "/*" not in out:
        assert chsql.strip_comments(out) == out  # no re-lex hazard
    # complete string literals survive verbatim (comments may swallow
    # an apostrophe, so only check literals that start OUTSIDE any
    # comment in a comment-free input)
    if "--" not in s and "/*" not in s:
        assert out == s


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(alphabet="ab('g)x d", min_size=0, max_size=12), max_size=6))
def test_chsql_split_top_round_trips_balanced_parts(parts):
    """Joining balanced, quote-free parts with top-level commas and
    splitting again recovers them (modulo outer whitespace)."""
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.plans import chsql

    def balanced(p):
        # the model must mask string literals exactly like _split_top
        # does: a paren INSIDE '...' is text, not structure (hypothesis
        # found ["(')'"] -- balanced by raw count, unbalanced masked)
        masked = chsql._mask(p)
        depth = 0
        for c in masked:
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth < 0:
                    return False
        return depth == 0 and masked.count("'") % 2 == 0

    parts = [p for p in parts if balanced(p)]
    if not parts:
        return
    joined = ",".join(parts)
    assert chsql._split_top(joined) == [p.strip() for p in parts]


# --------------------------------------------------------------------------
# paragraph_dedup == pure-Python first-occurrence model for ANY corpus
# --------------------------------------------------------------------------
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["p1", "p2", "p3", "p4", ""]),
            min_size=1,
            max_size=5,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_paragraph_dedup_matches_python_model(spark, docs):
    """Corpus-global first-occurrence retention on random corpora
    (repeats within AND across docs, empty paragraphs included) must
    equal the sequential-scan model."""
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import dedup

    sep = "\n\n"
    rows = [(i, sep.join(paras)) for i, paras in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["text"]
        for r in dedup.paragraph_dedup(df, "doc_id", "text", sep=sep).collect()
    }
    seen: set[str] = set()
    expect = {}
    for i, paras in enumerate(docs):
        # split/join round trip mirrors the engine's split() view of
        # the text (consecutive separators yield empty paragraphs)
        split_view = sep.join(paras).split(sep)
        kept = []
        for p in split_view:
            if p not in seen:
                seen.add(p)
                kept.append(p)
        expect[i] = sep.join(kept)
    assert got == expect


# --------------------------------------------------------------------------
# corpus operators vs sequential Python models
# --------------------------------------------------------------------------
docs_strategy = st.lists(
    st.text(alphabet="ab c", min_size=0, max_size=24),
    min_size=1,
    max_size=10,
)


def _model_tokens(text: str) -> list[str]:
    import re as _re

    cleaned = _re.sub(r"[^a-z0-9]+", " ", (text or "").lower()).strip()
    return cleaned.split() if cleaned else []


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs_strategy)
def test_tfidf_matches_python_model(spark, texts):
    """tfidf_top_terms == a sequential model of the pinned formula
    (tf * (ln((N+1)/(df+1))+1), 6dp floor-round, rank by score desc
    then term asc, top-5) on arbitrary tiny corpora."""
    import math
    from collections import Counter

    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import corpus

    docs = [(i, t) for i, t in enumerate(texts)]
    n = len(docs)
    tf = {i: Counter(_model_tokens(t)) for i, t in docs}
    df = Counter(term for c in tf.values() for term in c)
    want = set()
    for i, c in tf.items():
        scored = sorted(
            (
                (
                    math.floor(
                        cnt * (math.log((n + 1) / (df[t] + 1)) + 1) * 1e6 + 0.5
                    )
                    / 1e6,
                    t,
                )
                for t, cnt in c.items()
            ),
            key=lambda x: (-x[0], x[1]),
        )
        for rnk, (score, term) in enumerate(scored[:5], 1):
            want.add((i, term, score, rnk))
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_id, r.term, r.score, r.rnk)
        for r in corpus.tfidf_top_terms(sdf, k=5).collect()
    }
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=40, unique=True),
       st.integers(min_value=1, max_value=6))
def test_shard_assign_matches_python_model(spark, ids, n_shards):
    """shard_assign == the sequential md5 model: shard from the top
    60 bits, positions = 1..k within each shard by (skey, id); the
    deal is a partition of the input."""
    import hashlib

    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import corpus

    model = []
    for i in ids:
        hx = hashlib.md5(f"7:{i}".encode()).hexdigest()
        model.append((i, hx, int(hx[:15], 16) % n_shards))
    want = set()
    by_shard: dict[int, list] = {}
    for i, hx, sh in model:
        by_shard.setdefault(sh, []).append((hx, i))
    for sh, rows in by_shard.items():
        for pos, (hx, i) in enumerate(sorted(rows), 1):
            want.add((i, hx, sh, pos))
    sdf = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        (r.doc_id, r.skey, r.shard, r.pos)
        for r in corpus.shard_assign(sdf, n_shards=n_shards, seed="7").collect()
    }
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs_strategy)
def test_bigram_lm_matches_python_model(spark, texts):
    """bigram_lm_score == a sequential model of the pinned add-one
    LM (P = (C2+1)/(C1+|V|), instance-weighted mean -ln P, 6dp
    floor-round; docs with <2 tokens absent)."""
    import math
    from collections import Counter

    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import corpus

    docs = [(i, t) for i, t in enumerate(texts)]
    toks = {i: _model_tokens(t) for i, t in docs}
    vocab = {w for ts in toks.values() for w in ts}
    c2: Counter = Counter()
    for ts in toks.values():
        c2.update(zip(ts, ts[1:]))
    c1: Counter = Counter()
    for (w1, _), n in c2.items():
        c1[w1] += n
    want = {}
    for i, ts in toks.items():
        bigs = list(zip(ts, ts[1:]))
        if not bigs:
            continue
        nll = [
            math.log((c1[w1] + len(vocab)) / (c2[(w1, w2)] + 1.0))
            for w1, w2 in bigs
        ]
        want[i] = (
            len(bigs),
            math.floor(sum(nll) / len(nll) * 1e6 + 0.5) / 1e6,
        )
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_bigrams, r.xent)
        for r in corpus.bigram_lm_score(sdf).collect()
    }
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.sampled_from("pqr"), st.integers(0, 9)),
        min_size=1, max_size=25, unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=4),
)
def test_domain_quota_matches_python_model(spark, rows, cap):
    """domain_quota == per-domain sort by (score desc, id asc) cut at
    cap, for arbitrary score ties and domain histograms."""
    from pyspark.sql import functions as F

    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import corpus

    by_dom: dict[str, list] = {}
    for i, d, q in rows:
        by_dom.setdefault(d, []).append((i, float(q)))
    want = set()
    for d, items in by_dom.items():
        for rnk, (i, q) in enumerate(
            sorted(items, key=lambda t: (-t[1], t[0]))[:cap], 1
        ):
            want.add((i, d, q, rnk))
    sdf = spark.createDataFrame(
        [(i, d, float(q)) for i, d, q in rows],
        "doc_id long, source string, q double",
    )
    got = {
        (r.doc_id, r.source, r.score, r.rnk)
        for r in corpus.domain_quota(sdf, "source", F.col("q"), cap=cap).collect()
    }
    assert got == want
