"""Text analysis for large-scale training-data pipelines.

Language-ID (stopword heuristic), quality scoring, token counting,
document fingerprinting -- all pure built-in ``pyspark.sql.functions``
(whole-stage codegen, no Python in the hot path), designed so the same
arithmetic is expressible in ANSI SQL for the DuckDB oracle.

At 100TB these are embarrassingly parallel map-side expressions: no
shuffle, full column pruning (only ``text`` is read), parquet scan
pushdown intact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import ch

# Tiny per-language stopword lists for the n-gram/stopword language
# heuristic.  Deliberately small + fixed: the point is the *operator*
# (argmax over per-language evidence), not lexicon quality.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in"),
    "de": ("der", "die", "das", "und", "nicht", "ist"),
    "fr": ("le", "la", "et", "les", "des", "une"),
    "ru": ("i", "v", "ne", "na", "chto", "eto"),  # translit
}
# Priority order for deterministic tie-breaking (first wins on equal score).
LANG_PRIORITY: tuple[str, ...] = ("en", "de", "fr", "ru")


def tokens(text: Column | str, lower: bool = True) -> Column:
    """Normalized word tokens: lowercase, strip non-alphanumerics, split.

    Exactly mirrored by the oracle SQL
    ``regexp_split_to_array(trim(lower(regexp_replace(text,
    '[^a-z0-9]+', ' ', 'g'))), '\\s+')``.
    """
    c = F.col(text) if isinstance(text, str) else text
    if lower:
        c = F.lower(c)
    cleaned = F.trim(F.regexp_replace(c, "[^a-z0-9]+", " "))
    return F.when(F.length(cleaned) == 0, F.array().cast("array<string>")).otherwise(
        F.split(cleaned, r"\s+")
    )


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("long")


# GPT2-style pre-tokenizer shape: contractions, letter runs, digit
# runs, non-space symbol runs, then whitespace.  No \p classes so the
# identical pattern runs in Spark (Java regex) and DuckDB (RE2).
_BPE_PIECE = "'(?:s|t|re|ve|m|ll|d)|[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+"


def bpe_token_estimate(text: Column | str) -> Column:
    """LLM-tokenizer-shaped token count (BPE-ish): count pre-tokenizer
    pieces, then charge one extra token per 8 characters of piece
    length beyond the first 8 (long words split into subwords).  A
    deterministic, pure-regexp estimator of training-token cost --
    the unit data budgets are denominated in; NOT a real BPE encode
    (no vocab in this container; swap in tiktoken via mapInPandas for
    exact counts, batch shape stays).
    """
    c = F.col(text) if isinstance(text, str) else text
    pieces = F.regexp_count(c, F.lit(_BPE_PIECE))
    # long-piece surcharge: ceil(len/8)-1 summed over pieces equals
    # (total piece chars + continuation) approximated via total
    # alnum-run length: use length of text stripped of whitespace
    dense_len = F.length(F.regexp_replace(c, "\\s+", ""))
    surcharge = F.greatest(
        F.floor((dense_len - pieces * F.lit(4)) / F.lit(8)), F.lit(0)
    )
    return (pieces + surcharge).cast("long")


def stopword_ratio(toks: Column, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of ``lang``."""
    stops = STOPWORDS[lang]
    hits = F.size(F.filter(toks, lambda t: t.isin(*stops)))
    return hits.cast("double") / F.nullif(F.size(toks).cast("double"), F.lit(0.0))


def mean_token_len(toks: Column) -> Column:
    total = F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t))
    return total.cast("double") / F.nullif(F.size(toks).cast("double"), F.lit(0.0))


def alnum_ratio(text: Column | str) -> Column:
    """Share of characters that are alphanumeric or space (punctuation /
    symbol density is 1 - this)."""
    c = F.col(text) if isinstance(text, str) else text
    kept = F.length(F.regexp_replace(F.lower(c), "[^a-z0-9 ]", ""))
    return kept.cast("double") / F.nullif(F.length(c).cast("double"), F.lit(0.0))


def quality_score(text: Column | str, lang: str = "en") -> Column:
    """Composite [0,1] quality heuristic: stopword presence (fluency
    proxy), sane mean word length, alphanumeric density, non-trivial
    length.  Fixed arithmetic so the DuckDB oracle can reproduce it
    bit-for-bit (after rounding)."""
    t = tokens(text)
    sw = F.coalesce(stopword_ratio(t, lang), F.lit(0.0))
    mlen = F.coalesce(mean_token_len(t), F.lit(0.0))
    alnum = F.coalesce(alnum_ratio(text), F.lit(0.0))
    n = F.size(t).cast("double")
    len_ok = F.least(n / F.lit(20.0), F.lit(1.0))
    mlen_ok = F.when((mlen >= 3.0) & (mlen <= 8.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.least(
        F.greatest(
            F.lit(0.25) * F.least(sw * 5.0, F.lit(1.0))
            + F.lit(0.25) * mlen_ok
            + F.lit(0.25) * alnum
            + F.lit(0.25) * len_ok,
            F.lit(0.0),
        ),
        F.lit(1.0),
    )


def lang_scores(toks: Column) -> dict[str, Column]:
    return {lang: F.coalesce(stopword_ratio(toks, lang), F.lit(0.0)) for lang in LANG_PRIORITY}


def lang_id(text: Column | str) -> Column:
    """Predicted language = argmax of per-language stopword evidence,
    ties broken by LANG_PRIORITY order; 'und' (undetermined) when no
    language scores > 0.  Chained CASE so the oracle SQL is identical."""
    t = tokens(text)
    scores = lang_scores(t)
    best: Column = F.lit("und")
    best_score: Column = F.lit(0.0)
    # iterate in reverse priority: earlier langs overwrite on >= score
    for lang in reversed(LANG_PRIORITY):
        s = scores[lang]
        cond = s > 0.0
        better = cond & (s >= best_score)
        best = F.when(better, F.lit(lang)).otherwise(best)
        best_score = F.when(better, s).otherwise(best_score)
    return best


def fingerprint_md5(toks: Column) -> Column:
    """Content fingerprint: md5 over normalized token stream.  Portable
    (same value in any engine with md5) -- the oracle-checked variant."""
    return F.md5(F.concat_ws(" ", toks))


def fingerprint_rolling(toks: Column, mod: int = 1_000_000_007) -> Column:
    """Order-sensitive polynomial rolling hash over tokens.

    h := (h*31 + ascii(first_char)*131 + len(token)) mod p, folded
    JVM-side with ``F.aggregate``.  Cheap doc identity for shard-local
    dedup; verified against a pure-Python reference in tests.
    """
    p = F.lit(mod)
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda h, t: F.pmod(
            h * F.lit(31) + F.ascii(F.substring(t, 1, 1)) * F.lit(131) + F.length(t),
            p,
        ),
    )


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document stats frame: token count, stopword ratio, mean token
    length, alnum ratio, quality score, predicted language, fingerprint."""
    t = tokens(text_col)
    return df.select(
        F.col(id_col),
        token_count(text_col).alias("n_tokens"),
        bpe_token_estimate(text_col).alias("n_tokens_bpe"),
        ch.round_to(F.coalesce(stopword_ratio(t), F.lit(0.0)), 4).alias("stop_ratio"),
        ch.round_to(F.coalesce(mean_token_len(t), F.lit(0.0)), 4).alias("mean_tok_len"),
        ch.round_to(F.coalesce(alnum_ratio(text_col), F.lit(0.0)), 4).alias("alnum_ratio"),
        ch.round_to(quality_score(text_col), 4).alias("quality"),
        lang_id(text_col).alias("pred_lang"),
        fingerprint_md5(t).alias("fingerprint"),
    )
