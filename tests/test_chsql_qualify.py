"""CH statement features landed in r12: QUALIFY (window filter,
CH 23.x+), SELECT DISTINCT ON (== LIMIT 1 BY), LIMIT n WITH TIES,
and the refusal surface for COLLATE / untuple / COLUMNS / * APPLY.

QUALIFY and DISTINCT ON are cross-checked against DuckDB's NATIVE
spellings of the same clauses (not a hand-derived window rewrite),
so the compile is pinned to an independent implementation.
"""

import pytest

from yc_data_transfer_clickhouse_from_yandex_metrica_spark.plans import chsql


@pytest.fixture()
def tbl(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (1, "b", 20), (2, "a", 30), (2, "b", 30), (2, "c", 5)],
        "k int, g string, v int",
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# ---------------------------------------------------------------------------
# QUALIFY
# ---------------------------------------------------------------------------


def test_qualify_matches_duckdb_native(spark, duck, tbl):
    """The compiled QUALIFY equals DuckDB running the SAME clause
    natively (same rows, any order)."""
    duck.sql("CREATE OR REPLACE TABLE t AS SELECT * FROM VALUES "
             "(1, 'a', 10), (1, 'b', 20), (2, 'a', 30), (2, 'b', 30), "
             "(2, 'c', 5) AS t(k, g, v)")
    q = ("SELECT k, g, v FROM t QUALIFY "
         "row_number() OVER (PARTITION BY k ORDER BY v DESC, g) = 1")
    got = _rows(chsql.run_sql(spark, q, {"t": tbl}))
    want = sorted(tuple(r) for r in duck.sql(q).fetchall())
    assert got == want == [(1, "b", 20), (2, "a", 30)]


def test_qualify_sees_select_aliases_and_group_by(spark, tbl):
    """CH resolves select aliases in QUALIFY; windows run over the
    post-GROUP-BY rows."""
    out = chsql.run_sql(
        spark,
        "SELECT k, sum(v) AS s FROM t GROUP BY k "
        "QUALIFY rank() OVER (ORDER BY s DESC) = 1",
        {"t": tbl},
    )
    assert _rows(out) == [(2, 65)]


def test_qualify_uint8_truthiness(spark, tbl):
    """WHERE/HAVING UInt8 truthiness applies to QUALIFY too."""
    out = chsql.run_sql(
        spark,
        "SELECT k, g, v FROM t QUALIFY toInt64(row_number() OVER "
        "(PARTITION BY k ORDER BY v DESC, g) = 1)",
        {"t": tbl},
    )
    assert _rows(out) == [(1, "b", 20), (2, "a", 30)]


def test_qualify_composes_with_order_and_limit(spark, tbl):
    out = chsql.run_sql(
        spark,
        "SELECT k, g, v FROM t QUALIFY row_number() OVER "
        "(PARTITION BY k ORDER BY v DESC, g) <= 2 "
        "ORDER BY k, v DESC, g LIMIT 3",
        {"t": tbl},
    ).collect()
    assert [tuple(r) for r in out] == [
        (1, "b", 20), (1, "a", 10), (2, "a", 30)
    ]


def test_qualify_refusals(spark, tbl):
    with pytest.raises(ValueError, match="WITH TOTALS"):
        chsql.run_sql(
            spark,
            "SELECT k, sum(v) AS s FROM t GROUP BY k WITH TOTALS "
            "QUALIFY rank() OVER (ORDER BY s) = 1",
            {"t": tbl},
        )
    with pytest.raises(ValueError, match="DISTINCT"):
        chsql.run_sql(
            spark,
            "SELECT DISTINCT k FROM t QUALIFY "
            "rank() OVER (ORDER BY k) = 1",
            {"t": tbl},
        )


# ---------------------------------------------------------------------------
# DISTINCT ON
# ---------------------------------------------------------------------------


def test_distinct_on_matches_duckdb_native(spark, duck, tbl):
    duck.sql("CREATE OR REPLACE TABLE t AS SELECT * FROM VALUES "
             "(1, 'a', 10), (1, 'b', 20), (2, 'a', 30), (2, 'b', 30), "
             "(2, 'c', 5) AS t(k, g, v)")
    q = ("SELECT DISTINCT ON (k) k, g, v FROM t "
         "ORDER BY k, v DESC, g")
    got = _rows(chsql.run_sql(spark, q, {"t": tbl}))
    want = sorted(tuple(r) for r in duck.sql(q).fetchall())
    assert got == want == [(1, "b", 20), (2, "a", 30)]


def test_distinct_on_without_order_is_deterministic_smallest(spark, tbl):
    """No ORDER BY -> the smallest row by the output columns in
    select order (the ANY-join refinement), reproducibly."""
    q = "SELECT DISTINCT ON (k) k, g, v FROM t"
    first = _rows(chsql.run_sql(spark, q, {"t": tbl}))
    assert first == [(1, "a", 10), (2, "a", 30)]
    assert first == _rows(chsql.run_sql(spark, q, {"t": tbl}))


def test_distinct_on_refusals(spark, tbl):
    with pytest.raises(ValueError, match="IS LIMIT 1 BY"):
        chsql.run_sql(
            spark,
            "SELECT DISTINCT ON (k) k, v FROM t "
            "ORDER BY k, v LIMIT 1 BY k",
            {"t": tbl},
        )
    with pytest.raises(ValueError, match="plain column|alias"):
        chsql.run_sql(
            spark, "SELECT DISTINCT ON (k) k, v + 1 FROM t", {"t": tbl}
        )


# ---------------------------------------------------------------------------
# LIMIT n WITH TIES
# ---------------------------------------------------------------------------


def test_with_ties_includes_tie_group(spark, tbl):
    out = chsql.run_sql(
        spark,
        "SELECT k, v FROM t ORDER BY v DESC LIMIT 2 WITH TIES",
        {"t": tbl},
    )
    assert _rows(out) == [(2, 30), (2, 30)]
    out2 = chsql.run_sql(
        spark,
        "SELECT g, v FROM t ORDER BY v LIMIT 1 WITH TIES",
        {"t": tbl},
    )
    assert _rows(out2) == [("c", 5)]


def test_with_ties_boundary_pulls_whole_group(spark):
    df = spark.createDataFrame(
        [(i, i // 3) for i in range(12)], "id int, b int"
    )
    out = chsql.run_sql(
        spark, "SELECT id, b FROM t ORDER BY b LIMIT 4 WITH TIES",
        {"t": df},
    )
    # rows 0-2 have b=0, the 4th row is from b=1 -> its whole tie
    # group (ids 3,4,5) comes along
    assert _rows(out) == [(i, i // 3) for i in range(6)]


def test_with_ties_refusals(spark, tbl):
    with pytest.raises(ValueError, match="ORDER BY"):
        chsql.run_sql(
            spark, "SELECT k, v FROM t LIMIT 2 WITH TIES", {"t": tbl}
        )
    with pytest.raises(ValueError, match="offset"):
        chsql.run_sql(
            spark,
            "SELECT k, v FROM t ORDER BY v LIMIT 1, 2 WITH TIES",
            {"t": tbl},
        )


# ---------------------------------------------------------------------------
# refusal surface: COLLATE / untuple / COLUMNS / * APPLY
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sql,frag", [
    ("SELECT g FROM t ORDER BY g COLLATE 'en'", "COLLATE"),
    ("SELECT untuple((1, 'x')) AS u FROM t", "star expansion"),
    ("SELECT COLUMNS('^k$') FROM t", "Catalyst"),
    ("SELECT * APPLY(sum) FROM t", "APPLY"),
])
def test_matcher_refusals(spark, tbl, sql, frag):
    with pytest.raises(ValueError, match=frag):
        chsql.run_sql(spark, sql, {"t": tbl})


def test_star_except_passes_through(spark, tbl):
    """CH's * EXCEPT matcher is valid Spark SQL — stays a
    passthrough."""
    out = chsql.run_sql(
        spark, "SELECT * EXCEPT (g) FROM t ORDER BY k, v LIMIT 2",
        {"t": tbl},
    )
    assert [tuple(r) for r in out.collect()] == [(1, 10), (1, 20)]


def test_qualify_with_named_window_clause(spark, tbl):
    """The WINDOW clause rides inside the wrapped inner query, so
    QUALIFY can reference a named window."""
    out = chsql.run_sql(
        spark,
        "SELECT k, g, v FROM t WINDOW w AS (PARTITION BY k "
        "ORDER BY v DESC, g) QUALIFY row_number() OVER w = 1 ORDER BY k",
        {"t": tbl},
    )
    assert _rows(out) == [(1, "b", 20), (2, "a", 30)]
