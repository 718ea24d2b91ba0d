"""Clause-composition differential fuzz: seeded random statements
combining WHERE x GROUP BY x HAVING x QUALIFY in ONE statement, run
through the chsql compile AND natively by DuckDB on identical rows.

The per-feature fuzzers (test_chsql_fuzz.py, test_chsql_qualify_fuzz
.py) pin each clause alone; the remaining risk surface is clause
INTERACTION — alias visibility across HAVING/QUALIFY, predicate
ordering around the window filter, aggregate-over-filtered-groups.

Statement text is written in the dialect intersection so DuckDB can
run it verbatim: `=`/`!=` comparisons, full aggregate expressions in
HAVING (no alias-resolution dependence), coalesce() instead of NULLS
FIRST/LAST for total window orders, CAST around sum/avg (DuckDB's
HUGEINT/decimal outputs would hash-differ from Spark's BIGINT/DOUBLE).
Row SETS are compared (no LIMIT here — the ordered/limited forms have
their own suites), so engine default NULL ordering never matters.
"""

from __future__ import annotations

import math
import random

import pytest

from yc_data_transfer_clickhouse_from_yandex_metrica_spark.plans import chsql

N_CASES = 25

_WHERES = [
    "",
    "WHERE v > 2",
    "WHERE g = 'a'",
    "WHERE v IS NOT NULL AND k IS NOT NULL",
    "WHERE k != 1",
    "WHERE v + k > 3",
    "WHERE g != '' AND v < 7",
]
_HAVINGS = [
    "",
    "HAVING CAST(sum(v) AS BIGINT) > 3",
    "HAVING count(1) >= 2",
    "HAVING sum(v) IS NOT NULL",
    "HAVING min(v) != max(v)",
]
_QUALIFYS = [
    "",
    "QUALIFY row_number() OVER "
    "(ORDER BY c DESC, coalesce(k, -1)) <= 2",
    "QUALIFY rank() OVER "
    "(ORDER BY coalesce(s, -999) DESC, coalesce(k, -1)) = 1",
    "QUALIFY coalesce(s, 0) >= max(coalesce(s, 0)) OVER () - 2",
]


def _mk_rows(rng: random.Random, n: int):
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                rng.choice([0, 1, 2, 3, None]),
                rng.choice(["a", "b", "", None]),
                rng.choice([1, 2, 3, 5, 7, None]),
            )
        )
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
        f"CREATE TABLE t AS SELECT * FROM (VALUES {vals}) v(id, k, g, v)"
    )
    return con


def _norm(x):
    if isinstance(x, float):
        return ("f", "nan") if math.isnan(x) else ("f", round(x, 9))
    return x


def _srt(tuples):
    return sorted((tuple(_norm(x) for x in t) for t in tuples), key=repr)


@pytest.mark.parametrize("seed", range(N_CASES))
def test_clause_composition_matches_duckdb(spark, seed):
    rng = random.Random(7000 + seed)
    rows = _mk_rows(rng, rng.randint(1, 30))
    where = rng.choice(_WHERES)
    having = rng.choice(_HAVINGS)
    qualify = rng.choice(_QUALIFYS)
    q = (
        "SELECT k, CAST(sum(v) AS BIGINT) AS s, count(1) AS c, "
        "CAST(avg(v) AS DOUBLE) AS a FROM t "
        f"{where} GROUP BY k {having} {qualify}"
    ).strip()

    t = spark.createDataFrame(rows, "id int, k int, g string, v int")
    got = _srt(tuple(r) for r in chsql.run_sql(spark, q, {"t": t}).collect())
    con = _duck(rows)
    want = _srt(tuple(r) for r in con.sql(q).fetchall())
    assert got == want, (seed, q, rows)


@pytest.mark.parametrize("seed", range(N_CASES))
def test_plain_select_composition_matches_duckdb(spark, seed):
    """Non-aggregate variant: WHERE x QUALIFY over raw rows (window
    partitioned by a data column), DISTINCT ON as the alternative."""
    rng = random.Random(8000 + seed)
    rows = _mk_rows(rng, rng.randint(1, 30))
    where = rng.choice(_WHERES)
    shape = rng.choice(["qualify", "distinct_on"])
    if shape == "qualify":
        q = (
            "SELECT id, k, v FROM t "
            f"{where} QUALIFY row_number() OVER "
            "(PARTITION BY k ORDER BY coalesce(v, -1) DESC, id) <= 2"
        ).strip()
    else:
        q = (
            "SELECT DISTINCT ON (k) id, k, v FROM t "
            f"{where} ORDER BY k, coalesce(v, -1), id"
        ).strip()

    t = spark.createDataFrame(rows, "id int, k int, g string, v int")
    got = _srt(tuple(r) for r in chsql.run_sql(spark, q, {"t": t}).collect())
    con = _duck(rows)
    want = _srt(tuple(r) for r in con.sql(q).fetchall())
    assert got == want, (seed, q, rows)
