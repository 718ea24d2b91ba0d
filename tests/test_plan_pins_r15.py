"""Executed-plan pins for the dedup/LSH family (r15 verdict task 3).

The r14 pattern (test_plan_pins_r14.py) applied to the remaining
100 TB-critical docstring claims, until now verified only by PLANS.md
hand probes:

- ``minhash_lsh_pairs``: the banded candidate join is a
  ShuffledHashJoin keyed (band, bh); the exchange feeding it carries
  ONLY [id, band, bh] (24-byte rows — shingle sets attach AFTER
  candidate pairing); the band frame is materialized ONCE and the
  other side is a ReusedExchange (the shuffle_hash-both-sides
  rationale: broadcast would compute the signature lineage twice);
  no CartesianProduct / nested-loop join anywhere.
- ``simhash_pairs``: pigeonhole blocking — the candidate join is a
  ShuffledHashJoin keyed (ci, cv); its exchange carries only
  [id, sim, ci, cv]; chunk frame reused, no cartesian.
- ``ngram_jaccard_pairs``: the inverted-index count-join is a
  ShuffledHashJoin keyed on the shingle hash (cold path) or
  (sh, ci, cj) grid cells (salted hot path); index exchanges carry
  only (id, nsh, key...) rows — never text or shingle-set arrays.
- ``connected_components`` / ``dedup_clusters``: localCheckpoint
  truncates lineage — the returned frame's executed plan is a
  CONSTANT-size checkpoint scan, independent of how many propagation
  rounds convergence took (without the checkpoint the plan would
  grow by two join trees per cycle).

All pins read the FINAL adaptive plan after ``collect()`` on
multi-partition inputs: AQE is legally allowed to re-plan at runtime
(and does — the small attach joins here become broadcasts), so only
an executed-plan check proves the shape that actually runs.  A Spark
upgrade or refactor that silently breaks one of these re-shuffles
payload-width rows or goes all-pairs at 100 TB; these pins turn that
into a CI failure.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import dedup

_FORBIDDEN = re.compile(r"CartesianProduct|BroadcastNestedLoopJoin")
# payload columns that must never ride a candidate-generation exchange
_PAYLOAD = re.compile(r"\b(text|shset|sh_a|sh_b|sa|sb)#")


def _formatted(df) -> str:
    """Formatted explain AFTER an action — reflects the AQE final plan
    (``isFinalPlan=true``); node details carry per-node Input/Output
    attribute lists, which the plain toString does not."""
    df.collect()
    jqe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    return jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        jqe, "formatted"
    )


def _final_tree(fmt: str) -> str:
    if "== Final Plan ==" in fmt:
        return fmt.split("== Final Plan ==")[1].split("== Initial Plan ==")[0]
    return fmt.split("== Physical Plan ==")[1]


def _final_nodes(fmt: str) -> dict[int, tuple[str, str]]:
    """{node_id: (node_name, detail_block)} for FINAL-plan nodes only
    (the detail section also describes the discarded initial plan)."""
    ids = {int(i) for i in re.findall(r"\((\d+)\)", _final_tree(fmt))}
    out: dict[int, tuple[str, str]] = {}
    for m in re.finditer(
        r"(?m)^\((\d+)\) (\S+).*\n((?:.+\n)*)", fmt
    ):
        nid = int(m.group(1))
        if nid in ids:
            out[nid] = (m.group(2), m.group(3))
    return out


def _shj_on(nodes: dict, key_cols: list[str]) -> list[tuple[str, str]]:
    """ShuffledHashJoin nodes whose left keys are exactly key_cols."""
    hits = []
    for name, block in nodes.values():
        if name != "ShuffledHashJoin":
            continue
        m = re.search(r"Left keys \[\d+\]: \[([^\]]*)\]", block)
        keys = [k.split("#")[0].strip() for k in m.group(1).split(",")]
        if keys == key_cols:
            hits.append((name, block))
    return hits


def _exchanges_on(nodes: dict, key_cols: list[str]) -> list[list[str]]:
    """Input column base-names of every hash Exchange keyed key_cols."""
    out = []
    for name, block in nodes.values():
        if name != "Exchange":
            continue
        m = re.search(r"hashpartitioning\(([^)]*)\)", block)
        if not m:
            continue
        keys = [
            k.split("#")[0].strip()
            for k in m.group(1).split(",")
            if "#" in k
        ]
        if keys != key_cols:
            continue
        im = re.search(r"Input \[\d+\]: \[([^\]]*)\]", block)
        out.append([c.split("#")[0].strip() for c in im.group(1).split(",")])
    return out


def _assert_no_forbidden(nodes: dict) -> None:
    bad = [n for n, _ in nodes.values() if _FORBIDDEN.search(n)]
    assert not bad, bad


def _docs(spark, n: int = 300):
    """7 near-dup templates x ~43 docs: dense true-pair volume so no
    stage is empty (AQE's empty-relation propagation would otherwise
    collapse the joins this file exists to inspect)."""
    words = [
        F.concat(F.lit("w"), ((F.col("id") % 7) * 31 + i) % 50)
        for i in range(30)
    ]
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *words).alias("text"),
    ).repartition(8)


def test_minhash_lsh_banded_join_shape(spark):
    out = dedup.minhash_lsh_pairs(_docs(spark), num_hashes=16, bands=4)
    fmt = _formatted(out)
    nodes = _final_nodes(fmt)
    _assert_no_forbidden(nodes)

    shj = _shj_on(nodes, ["band", "bh"])
    assert len(shj) == 1, fmt  # the hint survived AQE re-planning

    for cols in _exchanges_on(nodes, ["band", "bh"]):
        assert sorted(cols) == ["band", "bh", "id"], cols

    # one band exchange materialized, the self-join side reuses it
    assert "ReusedExchange" in _final_tree(fmt), fmt

    # payload never rides a shuffle: every hash exchange in the final
    # plan is payload-free (shingle sets travel only via the
    # AQE-chosen broadcast of the 300-row docs side)
    for name, block in nodes.values():
        if name == "Exchange" and "hashpartitioning" in block:
            im = re.search(r"Input \[\d+\]: \[([^\]]*)\]", block)
            assert not _PAYLOAD.search(im.group(1)), block


def test_simhash_pigeonhole_join_shape(spark):
    out = dedup.simhash_pairs(_docs(spark))
    fmt = _formatted(out)
    nodes = _final_nodes(fmt)
    _assert_no_forbidden(nodes)

    shj = _shj_on(nodes, ["ci", "cv"])
    assert len(shj) == 1, fmt

    for cols in _exchanges_on(nodes, ["ci", "cv"]):
        assert sorted(cols) == ["ci", "cv", "id", "sim"], cols

    assert "ReusedExchange" in _final_tree(fmt), fmt


def test_ngram_inverted_index_cold_path(spark):
    # default salt_df=256 > every df here (~43) -> pure cold path
    out = dedup.ngram_jaccard_pairs(_docs(spark))
    fmt = _formatted(out)
    nodes = _final_nodes(fmt)
    _assert_no_forbidden(nodes)

    shj = _shj_on(nodes, ["sh"])
    assert len(shj) == 1, fmt

    for cols in _exchanges_on(nodes, ["sh"]):
        assert sorted(cols) == ["id", "nsh", "sh"], cols

    for name, block in nodes.values():
        if name == "Exchange" and "hashpartitioning" in block:
            im = re.search(r"Input \[\d+\]: \[([^\]]*)\]", block)
            assert not _PAYLOAD.search(im.group(1)), block


def test_ngram_inverted_index_salted_hot_path(spark):
    # salt_df=4 <= every df -> every shingle goes through the grid
    # cells; the candidate join must be keyed (sh, ci, cj) and its
    # exchanges carry exactly the 5-column salted index rows
    out = dedup.ngram_jaccard_pairs(_docs(spark), salt_df=4)
    fmt = _formatted(out)
    nodes = _final_nodes(fmt)
    _assert_no_forbidden(nodes)

    shj = _shj_on(nodes, ["sh", "ci", "cj"])
    assert len(shj) == 1, fmt

    for cols in _exchanges_on(nodes, ["sh", "ci", "cj"]):
        assert sorted(cols) == ["ci", "cj", "id", "nsh", "sh"], cols


def _cc_plan_profile(spark, n_chain: int) -> tuple[int, str]:
    """(final-plan node count, formatted plan) of connected_components
    over an n-node path graph — diameter n-1, so convergence rounds
    grow with n while the RESULT plan must not."""
    pairs = spark.range(n_chain - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    ).repartition(4)
    lab = dedup.connected_components(pairs)
    fmt = _formatted(lab)
    nodes = _final_nodes(fmt)
    # correctness while we are here: a path graph is one component
    rows = lab.collect()
    assert {r["comp"] for r in rows} == {0}
    assert len(rows) == n_chain
    return len(nodes), fmt


def test_connected_components_checkpoint_truncates_lineage(spark):
    n_small, fmt_small = _cc_plan_profile(spark, 3)
    n_big, fmt_big = _cc_plan_profile(spark, 40)
    # lineage truncation: identical (tiny) plan size no matter how
    # many propagation cycles ran; without localCheckpoint the big
    # graph's plan would carry ~2 extra join trees per cycle
    assert n_small == n_big, (fmt_small, fmt_big)
    assert n_big <= 5, fmt_big
    # and the scan is the checkpoint RDD, zero exchanges downstream
    assert "ExistingRDD" in fmt_big
    assert "Exchange" not in _final_tree(fmt_big)


def test_dedup_clusters_bounded_exchanges(spark):
    docs = spark.range(60).select(F.col("id").alias("doc_id"))
    pairs = spark.range(10).select(
        (F.col("id") * 2).alias("id_a"), (F.col("id") * 2 + 1).alias("id_b")
    )
    out = dedup.dedup_clusters(docs, pairs)
    fmt = _formatted(out)
    nodes = _final_nodes(fmt)
    _assert_no_forbidden(nodes)
    # the assignment join over the checkpointed labels: at most the
    # join's own exchanges, never an iteration-count-dependent number
    n_ex = sum(1 for n, _ in nodes.values() if n == "Exchange")
    assert n_ex <= 3, fmt
