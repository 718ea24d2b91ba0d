"""Corpus-level training-data operators: TF-IDF salient terms,
bigram-LM cross-entropy scoring, deterministic shard assignment,
per-domain quality quotas, keep-best-in-cluster dedup.

These are the curation stages a large-scale LLM data pipeline runs
AFTER per-document filtering (operators/text.py) and near-dup mining
(operators/dedup.py): rank what a document is about, score its
fluency against the corpus itself (the CCNet/KenLM perplexity-filter
shape, here a self-trained add-one bigram model so it is exactly
reproducible), cap how much any one domain contributes (the C4
per-domain rule), pick the best representative of each near-dup
cluster, and deal documents into deterministic training shards.

Scale design: everything is hash-aggregates and bounded windows.
Token/bigram count tables shuffle 8-byte-hashable short strings, not
documents; corpus scalars (N, |V|) ride a one-row broadcast cross
join, never a driver collect; per-cluster and per-domain windows
partition by keys whose group sizes are bounded by construction
(cluster size, domain cap).  The one global-order structure --
within-shard position -- is per-shard, so parallelism equals
``n_shards``: size it to the cluster (1024+ in production), not to 8.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import ch
from . import text
from .dedup import dedup_clusters


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document: (id, term, score, rnk).

    Pinned formula: ``score = tf * (ln((N + 1) / (df + 1)) + 1)``
    (smoothed idf, sklearn's ``smooth_idf`` shape) rounded to 6dp;
    ties rank by term ascending.  Documents with no tokens are absent.

    Plan: explode -> two hash aggregates (per-doc tf, corpus df) ->
    shuffle join on term -> one per-doc window.  N joins in as a
    one-row broadcast, so nothing touches the driver.
    """
    terms = df.select(
        F.col(id_col).alias("id"), F.explode(text.tokens(text_col)).alias("term")
    )
    tf = terms.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = df.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            ch.round_to(
                F.col("tf")
                * (
                    F.log(
                        (F.col("n") + F.lit(1)).cast("double")
                        / (F.col("df") + F.lit(1)).cast("double")
                    )
                    + F.lit(1.0)
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .select(F.col("id").alias(id_col), "term", "score", "rnk")
    )


def bigram_lm_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document cross-entropy under a corpus-trained add-one
    bigram LM: (id, n_bigrams, xent).  The CCNet-style perplexity
    quality signal, self-trained so it is exactly reproducible (no
    external model): low xent = fluent-within-corpus, high = outlier.

    Pinned model: ``P(w2|w1) = (C(w1,w2) + 1) / (C(w1*) + |V|)`` with
    ``C(w1*)`` the corpus count of bigrams starting w1 and ``|V|`` the
    corpus distinct-token count; ``xent = avg(-ln P)`` over the
    document's bigram INSTANCES (repeats weigh), rounded to 6dp.
    Documents with < 2 tokens are absent.

    Plan: bigrams come from a map-side slice+zip (no window, no
    self-join); per-doc bigram counts then join the two corpus count
    tables on their natural keys; |V| rides a one-row broadcast.
    """
    toks = text.tokens(text_col)
    base = df.select(F.col(id_col).alias("id"), toks.alias("tk"))
    big = (
        base.where(F.size("tk") >= 2)
        .select(
            "id",
            F.explode(
                F.arrays_zip(
                    F.slice("tk", 1, F.size("tk") - 1),
                    F.slice("tk", 2, F.size("tk") - 1),
                )
            ).alias("bg"),
        )
        .select("id", F.col("bg.0").alias("w1"), F.col("bg.1").alias("w2"))
    )
    bd = big.groupBy("id", "w1", "w2").agg(F.count(F.lit(1)).alias("cnt"))
    c2 = bd.groupBy("w1", "w2").agg(F.sum("cnt").alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    vocab = (
        base.select(F.explode("tk").alias("w"))
        .agg(F.countDistinct("w").alias("v"))
    )
    nll = F.log(
        (F.col("c1") + F.col("v")).cast("double")
        / (F.col("c2") + F.lit(1)).cast("double")
    )
    return (
        bd.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .withColumn("nll", nll)
        .groupBy("id")
        .agg(
            F.sum("cnt").alias("n_bigrams"),
            ch.round_to(
                F.sum(F.col("cnt") * F.col("nll")) / F.sum("cnt"), 6
            ).alias("xent"),
        )
        .select(F.col("id").alias(id_col), "n_bigrams", "xent")
    )


def shard_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
    seed: str = "42",
) -> DataFrame:
    """Deterministic training-shard deal: (id, skey, shard, pos).

    ``skey = md5(seed || ':' || id)`` gives a seedable pseudo-random
    but fully reproducible order (the "global shuffle" every training
    run needs to be replayable); ``shard`` is the top 60 bits of skey
    (15 hex chars -- fits a signed int64 on every engine) mod
    ``n_shards``; ``pos`` is the 1-based rank within the shard by
    (skey, id).  Portable across engines: md5 is md5 everywhere.

    Scale: the per-shard rank means parallelism == n_shards -- size
    n_shards to the cluster (1024+), and writers should
    ``repartition(shard).sortWithinPartitions(skey)`` to materialize
    the same order without a window at all.
    """
    out = df.select(
        F.col(id_col),
        F.md5(
            F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))
        ).alias("skey"),
    ).withColumn(
        "shard",
        F.pmod(
            F.conv(F.substring("skey", 1, 15), 16, 10).cast("long"),
            F.lit(n_shards),
        ).cast("int"),
    )
    w = Window.partitionBy("shard").orderBy("skey", id_col)
    return out.withColumn("pos", F.row_number().over(w).cast("long"))


def domain_quota(
    df: DataFrame,
    domain_col: str,
    score: Column,
    cap: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """C4-style per-domain contribution cap: keep at most ``cap``
    documents per domain, best ``score`` first (ties: min id).
    Returns (id, domain, score, rnk) for the kept documents.

    One window over hash(domain); group sizes are whatever the
    domain histogram says -- for web-scale power-law domains compose
    with operators/skew.py salting or pre-filter by a score floor.
    """
    scored = df.select(F.col(id_col), F.col(domain_col), score.alias("score"))
    w = Window.partitionBy(domain_col).orderBy(F.desc("score"), F.asc(id_col))
    return scored.withColumn("rnk", F.row_number().over(w).cast("long")).where(
        F.col("rnk") <= cap
    )


def keep_best(
    df: DataFrame,
    pairs: DataFrame,
    score: Column,
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup cluster resolution that keeps the BEST document of
    each cluster instead of the smallest id: (id, component, score,
    keep).  ``keep`` marks the cluster member with the highest score
    (ties: min id); singletons keep themselves.  Compose after any
    pair miner (minhash/simhash/ngram/embedding).
    """
    clusters = dedup_clusters(df, pairs, id_col).drop("is_canonical")
    scored = df.select(F.col(id_col), score.alias("score"))
    w = Window.partitionBy("component").orderBy(F.desc("score"), F.asc(id_col))
    return (
        clusters.join(scored, id_col)
        .withColumn("rnk", F.row_number().over(w))
        .select(id_col, "component", "score", (F.col("rnk") == 1).alias("keep"))
    )
