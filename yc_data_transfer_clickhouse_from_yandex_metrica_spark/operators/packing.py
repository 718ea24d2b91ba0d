"""Sequence packing: assign documents to fixed-token-budget bins.

The step between curation and training: documents are concatenated
into training sequences of ~budget tokens.  Exact bin packing is
NP-hard and inherently sequential; the distributed form used in
practice is *streaming next-fit within shards*:

1. shard documents deterministically (hash of id -> ``nshards``);
2. order within the shard (by id: reproducible);
3. running token cumsum per shard -> bin = floor((cumsum - n) /
   budget) -- a document straddling a boundary goes to the bin its
   FIRST token falls in, so bins can overflow by at most one
   document (next-fit guarantee; no bin exceeds budget + max_doc).

One window shuffle on the shard key, no driver loop; shards are
independent so 1000 executors pack 1000 shards concurrently.  The
whole assignment is a deterministic function of (id, n_tokens) --
re-runs and retries agree, and the ANSI-SQL oracle reproduces it
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 2048,
    nshards: int = 16,
    shard_expr=None,
) -> DataFrame:
    """(id, shard, bin, offset): bin assignment + token offset of the
    doc inside its bin's concatenation stream.

    ``shard_expr`` overrides the shard function (default
    ``pmod(xxhash64(id), nshards)``; pass ``pmod(id, nshards)`` when a
    portable-SQL-reproducible assignment is needed, e.g. oracles).
    """
    if shard_expr is None:
        shard_expr = F.pmod(F.xxhash64(F.col(id_col)), F.lit(nshards))
    w = Window.partitionBy("shard").orderBy(id_col)
    start = F.sum(tokens_col).over(w) - F.col(tokens_col)
    # all input columns pass through, so downstream stages (stratum
    # labels, quality scores) ride the SAME plan instead of re-joining
    # and recomputing their lineage
    return (
        df.withColumn("shard", shard_expr)
        .withColumn("__start", start)
        .select(
            *df.columns,
            "shard",
            F.floor(F.col("__start") / F.lit(budget)).alias("bin"),
            F.pmod(F.col("__start"), F.lit(budget)).alias("offset"),
        )
    )
