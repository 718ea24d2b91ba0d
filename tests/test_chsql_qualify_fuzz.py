"""Randomized cross-check of the r12 statement compiles — QUALIFY,
DISTINCT ON, LIMIT WITH TIES — against DuckDB running the SAME clause
natively (QUALIFY / DISTINCT ON) or the rank() definition (WITH TIES,
which DuckDB lacks).  Seeded generation (no Date.now-style entropy),
NULL-heavy data, duplicate keys, all-tied columns: the edge surface a
hand-picked example battery misses.
"""

from __future__ import annotations

import random

import pytest

from yc_data_transfer_clickhouse_from_yandex_metrica_spark.plans import chsql

N_CASES = 20


def _mk_rows(rng: random.Random, n: int):
    """NULL-heavy rows over a tiny domain: collisions + ties abound."""
    rows = []
    for i in range(n):
        k = rng.choice([0, 1, 2, None])
        g = rng.choice(["a", "b", None])
        v = rng.choice([1, 2, 3, 7, None])
        rows.append((i, k, g, v))
    return rows


def _duck(rows):
    import duckdb

    con = duckdb.connect()
    vals = ", ".join(
        "({}, {}, {}, {})".format(
            i,
            "NULL" if k is None else k,
            "NULL" if g is None else f"'{g}'",
            "NULL" if v is None else v,
        )
        for i, k, g, v in rows
    )
    con.sql(
        f"CREATE TABLE t AS SELECT * FROM (VALUES {vals}) "
        "v(id, k, g, v)"
    )
    return con


def _srt(tuples):
    return sorted(tuples, key=repr)


@pytest.mark.parametrize("seed", range(N_CASES))
def test_qualify_fuzz_vs_duckdb_native(spark, seed):
    rng = random.Random(1000 + seed)
    rows = _mk_rows(rng, rng.randint(0, 25))
    t = spark.createDataFrame(
        rows, "id int, k int, g string, v int"
    ) if rows else spark.createDataFrame([], "id int, k int, g string, v int")
    con = _duck(rows) if rows else None
    fn = rng.choice(["row_number()", "rank()", "dense_rank()"])
    lim = rng.randint(1, 3)
    part = rng.choice(["k", "g", "k, g"])
    order = rng.choice(
        ["v ASC NULLS FIRST, id", "v DESC NULLS LAST, id", "id"]
    )
    q = (
        f"SELECT id, k, g, v FROM t QUALIFY {fn} OVER "
        f"(PARTITION BY {part} ORDER BY {order}) <= {lim}"
    )
    got = _srt(tuple(r) for r in chsql.run_sql(spark, q, {"t": t}).collect())
    if con is None:
        assert got == []
        return
    want = _srt(tuple(r) for r in con.sql(q).fetchall())
    con.close()
    assert got == want, q


@pytest.mark.parametrize("seed", range(N_CASES))
def test_distinct_on_fuzz_vs_duckdb_native(spark, seed):
    rng = random.Random(2000 + seed)
    rows = _mk_rows(rng, rng.randint(1, 25))
    t = spark.createDataFrame(rows, "id int, k int, g string, v int")
    con = _duck(rows)
    keys = rng.choice(["k", "g", "k, g"])
    # a TOTAL order (id is unique) so both engines pick the same row
    order = rng.choice(
        [f"{keys}, v ASC NULLS FIRST, id", f"{keys}, v DESC NULLS LAST, id"]
    )
    q = (
        f"SELECT DISTINCT ON ({keys}) id, k, g, v FROM t "
        f"ORDER BY {order}"
    )
    got = _srt(tuple(r) for r in chsql.run_sql(spark, q, {"t": t}).collect())
    want = _srt(tuple(r) for r in con.sql(q).fetchall())
    con.close()
    assert got == want, q


@pytest.mark.parametrize("seed", range(N_CASES))
def test_with_ties_fuzz_vs_rank_definition(spark, seed):
    """DuckDB has no WITH TIES — the oracle is the definition itself:
    rank() OVER (same ORDER BY) <= n."""
    rng = random.Random(3000 + seed)
    rows = _mk_rows(rng, rng.randint(1, 25))
    t = spark.createDataFrame(rows, "id int, k int, g string, v int")
    con = _duck(rows)
    n = rng.randint(1, 4)
    order = rng.choice(
        ["v ASC NULLS FIRST", "v DESC NULLS LAST", "k ASC NULLS FIRST, g ASC NULLS FIRST"]
    )
    q = f"SELECT id, k, g, v FROM t ORDER BY {order} LIMIT {n} WITH TIES"
    got = _srt(tuple(r) for r in chsql.run_sql(spark, q, {"t": t}).collect())
    want = _srt(
        tuple(r)
        for r in con.sql(
            "SELECT id, k, g, v FROM (SELECT *, rank() OVER "
            f"(ORDER BY {order}) AS rk FROM t) WHERE rk <= {n}"
        ).fetchall()
    )
    con.close()
    assert got == want, q
