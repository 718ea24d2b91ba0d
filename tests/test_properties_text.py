"""Hypothesis property tests for the text-analysis operators
(operators/text.py) against pure-Python models.

The text entries' driver oracles run on the fixed documents table;
these re-derive every metric from the docstring formulas on random
input, one Spark job per generated scenario (the test_properties.py
batching convention).

Alphabet notes (so the Python model and the JVM agree by
construction):

- The general strategy mixes ASCII words, digits, punctuation and a
  few multibyte letters/CJK/emoji, but EXCLUDES exotic whitespace
  (NBSP etc.): Python's ``\\s`` is Unicode-aware while Java's is
  ASCII, so NBSP-adjacent text would model-diverge without being a
  Spark-side bug.  Spark's ``length`` counts code points (emoji = 1),
  same as Python ``len``.
- scrub_pii's patterns use ``\\b``, whose word-character set is
  Unicode in Python but ASCII in Java/RE2 — that test stays
  ASCII-only on purpose (the operator documents RE2/Java-compatible
  ASCII regex syntax as its contract).
"""

from __future__ import annotations

import hashlib
import math
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_WORDS = st.sampled_from(
    [
        "the", "a", "of", "und", "der", "le", "les", "v", "ne",
        "Hello", "WORLD", "x9", "42", "straße", "Ювелир", "中文",
        "🙂", "don't", "e-mail", "foo.bar", "", " ", "  ", "\t", "\n",
        "!!!", "--", "a" * 25,
    ]
)
_TEXTS = st.lists(
    st.lists(_WORDS, min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=8,
)


def _model_tokens(text: str | None) -> list[str]:
    if text is None:
        return []
    cleaned = re.sub("[^a-z0-9]+", " ", text.lower()).strip()
    return cleaned.split(" ") if cleaned else []


def _round_to(x: float, digits: int = 4) -> float:
    p = float(10 ** digits)
    return math.floor(x * p + 0.5) / p


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_TEXTS)
def test_tokens_and_simple_metrics_match_python_model(spark, texts):
    from pyspark.sql import functions as F

    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import text as tx

    data = [(i, t) for i, t in enumerate(texts)] + [(len(texts), None)]
    df = spark.createDataFrame(data, "doc_id long, text string")
    toks = tx.tokens("text")
    out = df.select(
        "doc_id",
        toks.alias("toks"),
        tx.token_count("text").alias("n"),
        tx.stopword_ratio(toks, "en").alias("sw"),
        tx.mean_token_len(toks).alias("mlen"),
        tx.alnum_ratio("text").alias("alnum"),
        tx.lang_id("text").alias("lang"),
        tx.fingerprint_md5(toks).alias("md5"),
    ).collect()
    got = {r["doc_id"]: r for r in out}

    for i, t in data:
        m = _model_tokens(t)
        r = got[i]
        assert r["toks"] == m, (t, r["toks"])
        assert r["n"] == len(m)
        # stopword ratio (en): NULL on zero tokens
        if m:
            hits = sum(1 for w in m if w in tx.STOPWORDS["en"])
            assert math.isclose(r["sw"], hits / len(m), rel_tol=1e-12)
            assert math.isclose(
                r["mlen"], sum(map(len, m)) / len(m), rel_tol=1e-12
            )
        else:
            assert r["sw"] is None and r["mlen"] is None
        # alnum ratio: NULL on NULL/empty text
        if t:
            kept = len(re.sub("[^a-z0-9 ]", "", t.lower()))
            assert math.isclose(r["alnum"], kept / len(t), rel_tol=1e-12)
        else:
            assert r["alnum"] is None
        # lang_id: argmax stopword evidence, LANG_PRIORITY tie-break
        best, best_s = "und", 0.0
        if m:
            for lang in tx.LANG_PRIORITY:
                s = sum(1 for w in m if w in tx.STOPWORDS[lang]) / len(m)
                if s > 0.0 and s > best_s:
                    best, best_s = lang, s
        assert r["lang"] == best, (t, r["lang"], best)
        assert r["md5"] == hashlib.md5(" ".join(m).encode()).hexdigest()


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_TEXTS)
def test_rolling_fingerprint_matches_python_model(spark, texts):
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import text as tx

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = df.select(
        "doc_id", tx.fingerprint_rolling(tx.tokens("text")).alias("fp")
    ).collect()
    got = {r["doc_id"]: r["fp"] for r in out}
    for i, t in enumerate(texts):
        h = 0
        for w in _model_tokens(t):
            h = (h * 31 + ord(w[0]) * 131 + len(w)) % 1_000_000_007
        assert got[i] == h, (t, got[i], h)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_TEXTS)
def test_repetition_stats_matches_counter_model(spark, texts):
    from collections import Counter

    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import text as tx

    data = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(data, "doc_id long, text string")
    out = tx.repetition_stats(df).collect()
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["dup_token_ratio"],
            r["top_bigram_frac"],
            r["dup_trigram_frac"],
        )
        for r in out
    }
    assert len(got) == len(data)  # zero-token docs kept

    for i, t in data:
        m = _model_tokens(t)
        n = len(m)
        dup_tok = 1.0 - len(set(m)) / n if n else 0.0
        bigrams = Counter(zip(m, m[1:]))
        top2 = max(bigrams.values()) * 2.0 / n if bigrams else 0.0
        trigrams = Counter(zip(m, m[1:], m[2:]))
        n3 = sum(trigrams.values())
        dup3 = (
            sum(c for c in trigrams.values() if c > 1) / n3 if n3 else 0.0
        )
        want = (
            n,
            _round_to(dup_tok),
            _round_to(top2),
            _round_to(dup3),
        )
        assert got[i] == want, (t, got[i], want)


_ASCII_PII = st.lists(
    st.sampled_from(
        [
            "contact us at", "bob.smith+x@example.co.uk", "or",
            "192.168.1.255", "555-867-5309", "555.867.5309",
            "123-45-6789", "4111-1111-1111-1111", "no pii here",
            "1:2:3:4:5:6:7:8", "12:30", "version 1.2.3.4",
            "a@b.cd", "999-99-9999 trailing", "(parens) [brackets]",
        ]
    ),
    min_size=1,
    max_size=8,
).map(" ".join)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_ASCII_PII, min_size=1, max_size=6))
def test_scrub_pii_matches_sequential_regex_model(spark, texts):
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import text as tx

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = tx.scrub_pii(df).collect()
    got = {r["doc_id"]: (r["n_pii"], r["text_clean"]) for r in out}
    for i, t in enumerate(texts):
        cur, total = t, 0
        for _, pat in tx.PII_PATTERNS:
            total += len(re.findall(pat, cur))
            cur = re.sub(pat, "[REDACTED]", cur)
        assert got[i] == (total, cur), (t, got[i], (total, cur))


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_TEXTS)
def test_bpe_estimate_matches_python_model(spark, texts):
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import text as tx
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators.text import _BPE_PIECE

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)] + [(len(texts), None)],
        "doc_id long, text string",
    )
    out = df.select(
        "doc_id", tx.bpe_token_estimate("text").alias("n")
    ).collect()
    got = {r["doc_id"]: r["n"] for r in out}
    for i, t in list(enumerate(texts)) + [(len(texts), None)]:
        s = t or ""
        pieces = len(re.findall(_BPE_PIECE, s))
        dense = len(re.sub(r"\s+", "", s))
        surcharge = max(math.floor((dense - pieces * 4) / 8), 0)
        assert got[i] == pieces + surcharge, (t, got[i])


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_TEXTS)
def test_text_stats_staged_equals_naive(spark, texts):
    """text_stats is built as staged projections (each lambda HOF named
    once -- the r19 optimization); this pins it bit-identical to the
    naive single-select over the public per-column helpers (the
    pre-r19 formulation the DuckDB oracle mirrors)."""
    from pyspark.sql import functions as F

    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.functions import ch
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import text as tx

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)] + [(len(texts), None)],
        "doc_id long, text string",
    )
    t = tx.tokens("text")
    naive = df.select(
        F.col("doc_id"),
        tx.token_count("text").alias("n_tokens"),
        tx.bpe_token_estimate("text").alias("n_tokens_bpe"),
        ch.round_to(F.coalesce(tx.stopword_ratio(t), F.lit(0.0)), 4).alias("stop_ratio"),
        ch.round_to(F.coalesce(tx.mean_token_len(t), F.lit(0.0)), 4).alias("mean_tok_len"),
        ch.round_to(F.coalesce(tx.alnum_ratio("text"), F.lit(0.0)), 4).alias("alnum_ratio"),
        ch.round_to(tx.quality_score("text"), 4).alias("quality"),
        tx.lang_id("text").alias("pred_lang"),
        tx.fingerprint_md5(t).alias("fingerprint"),
    )
    staged = tx.text_stats(df)
    assert staged.columns == naive.columns
    a = {r["doc_id"]: tuple(r) for r in staged.collect()}
    b = {r["doc_id"]: tuple(r) for r in naive.collect()}
    assert a == b
