"""URL family #2 (r11): firstSignificantSubdomain / cutToFirst... /
URLHierarchy / URLPathHierarchy / decodeURLComponent /
encodeURLComponent -- the Metrica traffic-source and page-drilldown
report functions.  Value pins are the CH docs' own examples; the
chsql spellings are pinned EQUAL to the functions/ch.py wrappers
(the same oracle-proven relationship as the r10 url battery).
"""

from __future__ import annotations

import pytest

from yc_data_transfer_clickhouse_from_yandex_metrica_spark.functions import ch
from yc_data_transfer_clickhouse_from_yandex_metrica_spark.plans import chsql

URLS = [
    "https://mail.yandex.ru/inbox",
    "https://news.clickhouse.com.tr/",
    "https://example.com/browse/CONV-6788",
    "https://example.com/browse/tags/?page=1&x=a%20b",
    "http://localhost/x",
    "https://a.b.co.uk/",
    "https://example.com",
    "",
]


@pytest.fixture(scope="module")
def tbl(spark):
    return spark.createDataFrame([(u,) for u in URLS], "u string")


@pytest.fixture(scope="module")
def rows(spark, tbl):
    out = chsql.run_sql(
        spark,
        "SELECT u, firstSignificantSubdomain(u) AS fss, "
        "cutToFirstSignificantSubdomain(u) AS cut, "
        "URLHierarchy(u) AS h, URLPathHierarchy(u) AS ph FROM t",
        {"t": tbl},
    )
    return {r["u"]: r for r in out.collect()}


def test_first_significant_subdomain_docs_examples(rows):
    assert rows["https://mail.yandex.ru/inbox"]["fss"] == "yandex"
    # insignificant 2nd-level label (com) shifts the pick one left
    assert rows["https://news.clickhouse.com.tr/"]["fss"] == "clickhouse"
    assert rows["https://a.b.co.uk/"]["fss"] == "b"
    assert rows["http://localhost/x"]["fss"] == ""  # dotless host
    assert rows[""]["fss"] == ""


def test_cut_to_first_significant_subdomain(rows):
    assert rows["https://mail.yandex.ru/inbox"]["cut"] == "yandex.ru"
    assert (
        rows["https://news.clickhouse.com.tr/"]["cut"] == "clickhouse.com.tr"
    )
    assert rows["https://a.b.co.uk/"]["cut"] == "b.co.uk"
    assert rows[""]["cut"] == ""


def test_url_hierarchy_docs_example(rows):
    assert rows["https://example.com/browse/CONV-6788"]["h"] == [
        "https://example.com/",
        "https://example.com/browse/",
        "https://example.com/browse/CONV-6788",
    ]
    # trailing-slash path: no duplicate full-path element
    assert rows["https://news.clickhouse.com.tr/"]["h"] == [
        "https://news.clickhouse.com.tr/"
    ]
    # query string adds one final element
    assert rows["https://example.com/browse/tags/?page=1&x=a%20b"]["h"] == [
        "https://example.com/",
        "https://example.com/browse/",
        "https://example.com/browse/tags/",
        "https://example.com/browse/tags/?page=1&x=a%20b",
    ]
    assert rows[""]["h"] == []


def test_url_path_hierarchy_docs_example(rows):
    assert rows["https://example.com/browse/CONV-6788"]["ph"] == [
        "/browse/",
        "/browse/CONV-6788",
    ]
    # root '/' element excluded (CH docs: "root is not included")
    assert rows["https://news.clickhouse.com.tr/"]["ph"] == []


def test_chsql_spellings_equal_ch_wrappers(spark, tbl, rows):
    want = {
        r["u"]: r
        for r in tbl.select(
            "u",
            ch.url_first_significant_subdomain("u").alias("fss"),
            ch.url_cut_to_first_significant_subdomain("u").alias("cut"),
            ch.url_hierarchy("u").alias("h"),
            ch.url_path_hierarchy("u").alias("ph"),
        ).collect()
    }
    for u in URLS:
        for c in ("fss", "cut", "h", "ph"):
            assert rows[u][c] == want[u][c], (u, c)


def test_decode_url_component_plus_is_not_space(spark, tbl):
    out = chsql.run_sql(
        spark,
        "SELECT decodeURLComponent('a%20b+c') AS d1, "
        "decodeURLComponent('%D0%BF%D1%80') AS d2 FROM t LIMIT 1",
        {"t": tbl},
    ).collect()[0]
    assert out["d1"] == "a b+c"  # %20 decodes; '+' survives (CH rule)
    assert out["d2"] == "пр"


def test_encode_url_component_rfc3986(spark, tbl):
    out = chsql.run_sql(
        spark,
        "SELECT encodeURLComponent('a b*~/п') AS e FROM t LIMIT 1",
        {"t": tbl},
    ).collect()[0]
    # space -> %20 (not '+'), '*' -> %2A, '~' kept, '/' and UTF-8
    # bytes percent-encoded
    assert out["e"] == "a%20b%2A~%2F%D0%BF"


def test_encode_decode_roundtrip(spark, tbl):
    out = chsql.run_sql(
        spark,
        "SELECT decodeURLComponent(encodeURLComponent('п+и в*~')) AS r "
        "FROM t LIMIT 1",
        {"t": tbl},
    ).collect()[0]
    assert out["r"] == "п+и в*~"


# ---------------------------------------------------------------------------
# r11 batch 5: URL stragglers, ISO year, string search/distance
# ---------------------------------------------------------------------------


def test_url_stragglers(spark, tbl):
    u = "'https://u:p@example.com:8080/a/b?x=1&y=a%20b#frag'"
    out = chsql.run_sql(
        spark,
        f"SELECT extractURLParameters({u}) AS ps, "
        f"extractURLParameterNames({u}) AS ns, "
        f"queryStringAndFragment({u}) AS qf, "
        f"cutQueryStringAndFragment({u}) AS cut, "
        f"netloc({u}) AS nl FROM t LIMIT 1",
        {"t": tbl},
    ).collect()[0]
    assert out["ps"] == ["x=1", "y=a%20b"]
    assert out["ns"] == ["x", "y"]
    assert out["qf"] == "?x=1&y=a%20b#frag"
    assert out["cut"] == "https://u:p@example.com:8080/a/b"
    assert out["nl"] == "u:p@example.com:8080"


def test_url_stragglers_absent_pieces(spark, tbl):
    out = chsql.run_sql(
        spark,
        "SELECT extractURLParameters('https://e.com/a') AS ps, "
        "queryStringAndFragment('https://e.com/a') AS qf FROM t LIMIT 1",
        {"t": tbl},
    ).collect()[0]
    assert out["ps"] == [] and out["qf"] == ""


def test_form_component_coding(spark, tbl):
    out = chsql.run_sql(
        spark,
        "SELECT decodeURLFormComponent('a+b%20c') AS d, "
        "encodeURLFormComponent('a b*~') AS e FROM t LIMIT 1",
        {"t": tbl},
    ).collect()[0]
    assert out["d"] == "a b c"  # form variant: '+' IS a space
    assert out["e"] == "a+b%2A~"


def test_iso_year(spark, tbl):
    out = chsql.run_sql(
        spark,
        # 2016-01-01 is ISO week 53 of 2015; 2014-12-29 is ISO 2015-W01
        "SELECT toISOYear(CAST('2016-01-01' AS DATE)) AS y1, "
        "toISOYear(CAST('2014-12-29' AS DATE)) AS y2, "
        "CAST(toStartOfISOYear(CAST('2016-06-15' AS DATE)) AS STRING) "
        "AS s1, "
        "CAST(toStartOfISOYear(CAST('2016-01-01' AS DATE)) AS STRING) "
        "AS s2 FROM t LIMIT 1",
        {"t": tbl},
    ).collect()[0]
    assert (out["y1"], out["y2"]) == (2015, 2015)
    assert out["s1"] == "2016-01-04"  # ISO 2016 starts Mon Jan 4
    assert out["s2"] == "2014-12-29"  # date in ISO-2015 -> its Monday


def test_string_search_distance(spark, tbl):
    out = chsql.run_sql(
        spark,
        "SELECT positionCaseInsensitiveUTF8('aЖb', 'ж') AS p, "
        "regexpExtract('ab12cd', '([0-9]+)') AS r1, "
        "regexpExtract('ab12cd', '([a-z]+)([0-9]+)', 2) AS r2, "
        "substringIndex('a.b.c', '.', 2) AS si, "
        "initcapUTF8('hello жук') AS ic, "
        "levenshteinDistance('kitten', 'sitting') AS lv, "
        "editDistance('abc', 'abd') AS ed FROM t LIMIT 1",
        {"t": tbl},
    ).collect()[0]
    assert out["p"] == 2  # Unicode case-fold finds Ж
    assert (out["r1"], out["r2"]) == ("12", "12")
    assert out["si"] == "a.b"
    assert out["ic"] == "Hello Жук"
    assert (out["lv"], out["ed"]) == (3, 1)


@pytest.mark.parametrize("sql", [
    "SELECT URLHash('https://e.com') FROM t",
    "SELECT cutToFirstSignificantSubdomainWithWWW('https://www.tr') FROM t",
    "SELECT damerauLevenshteinDistance('a', 'b') FROM t",
    "SELECT jaroSimilarity('a', 'b') FROM t",
    "SELECT stringJaccardIndex('a', 'b') FROM t",
])
def test_b5_refusals(spark, tbl, sql):
    with pytest.raises(ValueError, match="chsql:"):
        chsql.run_sql(spark, sql, {"t": tbl})
