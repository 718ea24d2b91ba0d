"""CH<->Spark same-NAME different-SEMANTICS collisions (r11 batch).

The bare CH spellings ``length``/``lower``/``upper``/``round``/
``rand``/``reverse`` also exist in Spark with silently different
behavior: CH length counts BYTES (arrays: elements), CH lower/upper
fold ASCII A-Z only, CH round ties half-even on floats, CH rand() is
a uniform UInt32.  Before this batch they passed through to Spark
and diverged on any non-ASCII byte / .5 tie / rand comparison; the
CH hash family (cityHash64 ...) died as UNRESOLVED_ROUTINE.  Value
pins per the CH docs, battery style of test_chsql_vocab_r12b.
"""

from __future__ import annotations

import pytest

from yc_data_transfer_clickhouse_from_yandex_metrica_spark.plans import chsql


@pytest.fixture(scope="module")
def tbl(spark):
    return spark.createDataFrame(
        [
            # s: 2-byte é and Cyrillic Д make byte/ASCII semantics
            # visible; k/v/dec cover the round dispatch classes
            (1, "héllo", [10, 20, 30], 2.5, 25),
            (2, "AbЖc", [7], 3.5, -25),
            (3, None, None, -2.5, 5),
        ],
        "k int, s string, arr array<int>, v double, i int",
    ).selectExpr("k", "s", "arr", "v", "i", "CAST(v AS DECIMAL(5,1)) AS dc")


def _rows(spark, tbl, sql):
    out = chsql.run_sql(spark, sql, {"t": tbl})
    return {r["k"]: r for r in out.collect()}


# ---------------------------------------------------------------------------
# length: bytes for strings, elements for known array columns
# ---------------------------------------------------------------------------


def test_length_is_bytes_on_strings(spark, tbl):
    r = _rows(spark, tbl, "SELECT k, length(s) AS n, lengthUTF8(s) AS c FROM t")
    assert (r[1]["n"], r[1]["c"]) == (6, 5)  # é is 2 bytes, 1 char
    assert (r[2]["n"], r[2]["c"]) == (5, 4)  # Ж is 2 bytes
    assert (r[3]["n"], r[3]["c"]) == (None, None)


def test_length_is_element_count_on_array_columns(spark, tbl):
    r = _rows(spark, tbl, "SELECT k, length(arr) AS n FROM t")
    assert (r[1]["n"], r[2]["n"], r[3]["n"]) == (3, 1, None)


def test_length_on_array_expression_fails_loudly(spark, tbl):
    # the empty()/notEmpty() dispatch policy: an array EXPRESSION
    # reaches OCTET_LENGTH and fails Spark analysis instead of
    # silently counting something else
    with pytest.raises(Exception, match="OCTET_LENGTH|DATATYPE_MISMATCH"):
        chsql.run_sql(
            spark, "SELECT length(array(1, 2)) AS n FROM t", {"t": tbl}
        ).collect()


# ---------------------------------------------------------------------------
# lower/upper: ASCII-only; the UTF8 spellings stay full Unicode
# ---------------------------------------------------------------------------


def test_lower_upper_fold_ascii_only(spark, tbl):
    r = _rows(
        spark, tbl,
        "SELECT k, lower(s) AS lo, upper(s) AS up, "
        "lowerUTF8(s) AS lou, upperUTF8(s) AS upu FROM t",
    )
    # Ж (upper Cyrillic) survives lower(); ж appears only via UTF8
    assert r[2]["lo"] == "abЖc"
    assert r[2]["up"] == "ABЖC"
    assert r[2]["lou"] == "abжc"
    assert r[2]["upu"] == "ABЖC"
    assert r[3]["lo"] is None


def test_lcase_ucase_match_lower_upper(spark, tbl):
    r = _rows(
        spark, tbl, "SELECT k, lcase(s) AS lo, ucase(s) AS up FROM t"
    )
    assert r[2]["lo"] == "abЖc"
    assert r[2]["up"] == "ABЖC"


# ---------------------------------------------------------------------------
# round: half-even on floats/expressions, half-up on int/decimal cols
# ---------------------------------------------------------------------------


def test_round_float_column_ties_to_even(spark, tbl):
    r = _rows(spark, tbl, "SELECT k, round(v) AS rv FROM t")
    assert (r[1]["rv"], r[2]["rv"], r[3]["rv"]) == (2.0, 4.0, -2.0)


def test_round_nonfloat_columns_tie_away_from_zero(spark, tbl):
    r = _rows(
        spark, tbl, "SELECT k, round(i, -1) AS ri, round(dc) AS rd FROM t"
    )
    assert (r[1]["ri"], r[2]["ri"]) == (30, -30)
    assert float(r[1]["rd"]) == 3.0
    assert float(r[3]["rd"]) == -3.0


def test_round_expression_defaults_to_half_even(spark, tbl):
    # CH arithmetic is Float64 (division always): expression -> bround
    r = _rows(spark, tbl, "SELECT k, round(v + 0.0) AS r2 FROM t")
    assert r[1]["r2"] == 2.0  # 2.5 -> 2, not 3


def test_round_scale_argument_passes_through(spark, tbl):
    r = _rows(spark, tbl, "SELECT k, round(v / 8, 2) AS r FROM t")
    assert r[1]["r"] == round(2.5 / 8, 2)


# ---------------------------------------------------------------------------
# rand family: UInt32 range / 64-bit / canonical
# ---------------------------------------------------------------------------


def test_rand_is_uniform_uint32_range(spark):
    df = spark.range(512).selectExpr("id")
    out = chsql.run_sql(
        spark,
        "SELECT rand() AS r, rand64() AS r64, randCanonical() AS rc FROM t",
        {"t": df},
    )
    assert dict(out.dtypes)["r"] == "bigint"
    assert dict(out.dtypes)["r64"] == "bigint"
    assert dict(out.dtypes)["rc"] == "double"
    rows = out.collect()
    assert all(0 <= r["r"] < 2**32 for r in rows)
    assert all(0.0 <= r["rc"] < 1.0 for r in rows)
    assert len({r["r"] for r in rows}) > 1
    assert len({r["r64"] for r in rows}) > 1
    # rand64 spans the full signed-64 reinterpretation of UInt64
    assert any(r["r64"] < 0 for r in rows) and any(r["r64"] > 0 for r in rows)


def test_rand_optional_cse_dodge_argument_ignored(spark, tbl):
    out = chsql.run_sql(spark, "SELECT rand(k) AS r FROM t", {"t": tbl})
    assert all(0 <= r["r"] < 2**32 for r in out.collect())


# ---------------------------------------------------------------------------
# reverse
# ---------------------------------------------------------------------------


def test_reverse_utf8_and_array_passthrough(spark, tbl):
    r = _rows(
        spark, tbl,
        "SELECT k, reverseUTF8(s) AS rs, reverse(arr) AS ra FROM t",
    )
    assert r[1]["rs"] == "olléh"
    assert r[1]["ra"] == [30, 20, 10]


# ---------------------------------------------------------------------------
# hash family + randConstant: named refusals, not UNRESOLVED_ROUTINE
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "fn", ["cityHash64", "sipHash64", "xxHash64", "intHash32", "CRC32",
           "farmFingerprint64", "murmurHash3_64", "halfMD5"]
)
def test_ch_hash_spellings_refuse_with_alternatives(spark, tbl, fn):
    with pytest.raises(ValueError, match="same VALUES"):
        chsql.run_sql(spark, f"SELECT {fn}(s) AS h FROM t", {"t": tbl})


def test_rand_constant_refuses(spark, tbl):
    with pytest.raises(ValueError, match="randConstant"):
        chsql.run_sql(spark, "SELECT randConstant() AS r FROM t", {"t": tbl})


# ---------------------------------------------------------------------------
# cascade safety: emitted CHAR_LENGTH/LOWER/UPPER/REVERSE are inert
# to the bare-name mappings (the rewrite scan is case-sensitive)
# ---------------------------------------------------------------------------


def test_utf8_spellings_not_re_rewritten_by_bare_mappings(spark, tbl):
    sql = chsql._rewrite_calls("SELECT lowerUTF8(s), lengthUTF8(s) FROM t")
    assert "LOWER(s)" in sql and "CHAR_LENGTH(s)" in sql
    assert "translate" not in sql and "OCTET_LENGTH" not in sql


def test_empty_still_works_with_length_mapped(spark, tbl):
    r = _rows(spark, tbl, "SELECT k, empty(s) AS e, notEmpty(s) AS ne FROM t")
    assert (r[1]["e"], r[1]["ne"]) == (0, 1)


# ---------------------------------------------------------------------------
# r11 batch 2: decode-transform, enumerate-uniq, left/right negative
# lengths, representation adapters, whitespace split, dict/display
# refusals
# ---------------------------------------------------------------------------


def test_transform_decode_form(spark, tbl):
    r = _rows(
        spark, tbl,
        "SELECT k, transform(k, [1, 2], [10, 20], -1) AS t4, "
        "transform(k, [1, 2], [10, 20]) AS t3 FROM t",
    )
    assert (r[1]["t4"], r[2]["t4"], r[3]["t4"]) == (10, 20, -1)
    assert (r[1]["t3"], r[2]["t3"], r[3]["t3"]) == (10, 20, 3)


def test_transform_matched_null_and_duplicate_keys(spark, tbl):
    """ADVICE r11 #5: a MATCHED key whose to-value is NULL must return
    that mapped NULL, not fall through to the default/x; duplicate
    from-keys pick the FIRST match (CH's tie rule)."""
    r = _rows(
        spark, tbl,
        "SELECT k, transform(k, [1, 2], [NULL, 20], -1) AS tn, "
        "transform(k, [1, 2], [NULL, 20]) AS tn3, "
        "transform(k, [1, 1, 2], [11, 99, 20], -1) AS tdup FROM t",
    )
    assert (r[1]["tn"], r[2]["tn"], r[3]["tn"]) == (None, 20, -1)
    assert (r[1]["tn3"], r[2]["tn3"], r[3]["tn3"]) == (None, 20, 3)
    assert (r[1]["tdup"], r[2]["tdup"], r[3]["tdup"]) == (11, 20, -1)


def test_transform_two_args_is_spark_hof_passthrough(spark, tbl):
    r = _rows(spark, tbl, "SELECT k, transform(arr, x -> x + 1) AS m FROM t")
    assert r[1]["m"] == [11, 21, 31]


def test_array_enumerate_uniq(spark):
    df = spark.createDataFrame([(1, [10, 20, 10, 30, 10])], "k int, a array<int>")
    r = _rows(spark, df, "SELECT k, arrayEnumerateUniq(a) AS e FROM t")
    assert r[1]["e"] == [1, 1, 2, 1, 3]


def test_left_right_negative_lengths(spark):
    df = spark.createDataFrame([(1, "hello")], "k int, s string")
    r = _rows(
        spark, df,
        "SELECT k, left(s, 2) AS l2, left(s, -2) AS lm2, "
        "right(s, 2) AS r2, right(s, -1) AS rm1, "
        "leftUTF8(s, 0) AS l0, rightUTF8(s, -9) AS rbig FROM t",
    )
    assert (r[1]["l2"], r[1]["lm2"]) == ("he", "hel")
    assert (r[1]["r2"], r[1]["rm1"]) == ("lo", "ello")
    assert (r[1]["l0"], r[1]["rbig"]) == ("", "")


def test_representation_adapters_are_identity(spark, tbl):
    r = _rows(
        spark, tbl,
        "SELECT k, toNullable(k) AS n, toLowCardinality(s) AS lc, "
        "materialize(v) AS m FROM t",
    )
    assert (r[1]["n"], r[1]["lc"], r[1]["m"]) == (1, "héllo", 2.5)


def test_split_by_whitespace_drops_empty_tokens(spark):
    df = spark.createDataFrame([(1, "  a,  b.   c ")], "k int, s string")
    r = _rows(spark, df, "SELECT k, splitByWhitespace(s) AS w FROM t")
    assert r[1]["w"] == ["a,", "b.", "c"]


@pytest.mark.parametrize("fn,args", [
    ("dictGet", "'d', 'attr', k"),
    ("dictGetString", "'d', 'attr', k"),
    ("dictHas", "'d', k"),
    ("dictGetHierarchy", "'d', k"),
])
def test_dict_functions_refuse_with_join_recipe(spark, tbl, fn, args):
    with pytest.raises(ValueError, match="dictionary engine"):
        chsql.run_sql(spark, f"SELECT {fn}({args}) AS x FROM t", {"t": tbl})


@pytest.mark.parametrize("fn,args", [
    ("bar", "k, 0, 100"),
    ("formatReadableSize", "k"),
    ("formatReadableQuantity", "k"),
    ("formatReadableTimeDelta", "k"),
])
def test_display_helpers_refuse(spark, tbl, fn, args):
    with pytest.raises(ValueError, match="presentation helper"):
        chsql.run_sql(spark, f"SELECT {fn}({args}) AS x FROM t", {"t": tbl})


def test_locate_refuses_version_dependent_order(spark):
    """CH locate() is (haystack, needle) before 24.3 and MySQL's
    (needle, haystack) from 24.3 on -- any fixed mapping silently
    swaps arguments for users of the other version, so bare locate()
    refuses with a pointer to the version-stable position()
    (ADVICE r11 #3).  position() itself stays mapped in CH order."""
    df = spark.createDataFrame([("abcdef",)], "s string")
    with pytest.raises(ValueError, match="24.3.*position"):
        chsql.run_sql(
            spark, "SELECT locate(s, 'cd') AS p FROM t", {"t": df}
        )
    r = chsql.run_sql(
        spark,
        "SELECT position(s, 'cd') AS p1, position(s, 'cd', 4) AS p2, "
        "position(s, 'zz') AS p0 FROM t",
        {"t": df},
    ).collect()[0]
    assert (r["p1"], r["p2"], r["p0"]) == (3, 0, 0)


def test_global_modifier_is_stripped_everywhere(spark):
    """CH GLOBAL is a pure distribution hint (ship the right side to
    every shard); Spark plans its own exchanges, so it strips -- for
    every JOIN strictness spelling AND the [NOT] IN subquery forms."""
    left = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, s string")
    right = spark.createDataFrame([(1,), (3,)], "k int")
    out = chsql.run_sql(
        spark,
        "SELECT l.s AS s FROM l GLOBAL INNER JOIN r ON l.k = r.k ORDER BY s",
        {"l": left, "r": right},
    )
    assert [x["s"] for x in out.collect()] == ["a", "c"]
    out2 = chsql.run_sql(
        spark,
        "SELECT s FROM l WHERE k GLOBAL IN (SELECT k FROM r) ORDER BY s",
        {"l": left, "r": right},
    )
    assert [x["s"] for x in out2.collect()] == ["a", "c"]
    out3 = chsql.run_sql(
        spark,
        "SELECT s FROM l WHERE k GLOBAL NOT IN (SELECT k FROM r) ORDER BY s",
        {"l": left, "r": right},
    )
    assert [x["s"] for x in out3.collect()] == ["b"]


def test_global_any_join_reaches_the_any_compile(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b")], "k int, s string")
    right = spark.createDataFrame([(1, 10), (1, 20)], "k int, v int")
    # (GROUP BY uses the bare column: `GROUP BY l.k` with a same-named
    # SELECT alias trips the inline_aliases qualified-reference bug,
    # pinned as the r12 deferral xfail in test_advice_r11_deferred)
    out = chsql.run_sql(
        spark,
        "SELECT s, count(1) AS n FROM l GLOBAL ANY LEFT JOIN r "
        "ON l.k = r.k GROUP BY s ORDER BY s",
        {"l": left, "r": right},
    )
    # ANY: at most one right match per left row
    assert [(x["s"], x["n"]) for x in out.collect()] == [("a", 1), ("b", 1)]


@pytest.mark.parametrize("fn", [
    "sumState", "uniqMerge", "countMergeState", "uniqSimpleState",
    "sumForEach", "avgResample", "groupArrayState",
])
def test_state_combinators_refuse_by_name(spark, tbl, fn):
    with pytest.raises(ValueError, match="partial-aggregation state"):
        chsql.run_sql(spark, f"SELECT {fn}(k) AS x FROM t", {"t": tbl})


def test_state_guard_ignores_unknown_bases(spark, tbl):
    # a user function merely ENDING in State must not be caught
    with pytest.raises(Exception) as ei:
        chsql.run_sql(spark, "SELECT myCustomState(k) AS x FROM t", {"t": tbl})
    assert "partial-aggregation" not in str(ei.value)
