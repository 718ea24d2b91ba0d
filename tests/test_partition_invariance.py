"""CI-sized partition-invariance check: a curated subset of registry
entries re-runs under an adversarial physical conf (5 shuffle
partitions, 256 KB scan splits, AQE coalescing off) and must produce
identical rows — block order and task boundaries must never leak into
results (stray first()/any_value, limit-without-order, non-total
window orders).

The full sweep lives in tools/invariance_check.py; round 13 ran it
over all 104 entries at sf0.01: ALL INVARIANT.  This subset keeps the
property in CI at ~1 min, picking the entries whose shapes are most
at risk of order-dependence: collapse/latest-version (window pick),
ANY join (keep-one-per-key), LIMIT BY (per-key rank), heavy hitters
(global top-k ties), exact quantiles (rank selection), and the
chained-windows transitions entry.
"""

from __future__ import annotations

import decimal
import math
import os

import pytest

from yc_data_transfer_clickhouse_from_yandex_metrica_spark.queries import driver

SF = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")

ENTRIES = [
    "cdc_collapse",
    "latest_event_per_user",
    "chsql_final",
    "chsql_any_join",
    "orders_limit_by",
    "heavy_hitters_custkey",
    "quantiles_exact",
    "event_transitions",
    "last_significant_source",
    "chsql_distinct_on",
    # r14: tie resolution rides the union+window order
    "asof_enrich",
    # r14: deterministic next-fit packing must not depend on task
    # boundaries
    "pack_sequences",
]


def _norm(v):
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v))
    if isinstance(v, float):
        return ("f", "nan") if math.isnan(v) else ("f", round(v, 9))
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def _rowset(df):
    idx = sorted(range(len(df.columns)), key=lambda i: df.columns[i])
    return sorted(
        (tuple(_norm(r[i]) for i in idx) for r in df.collect()),
        key=lambda t: str(t),
    )


@pytest.mark.parametrize("name", ENTRIES)
def test_entry_rows_invariant_under_adversarial_layout(spark, name, monkeypatch):
    spec = driver.QUERIES[name]
    base = _rowset(spec.build(spark, SF))

    orig_tune = driver.tune

    def tiny_tune(s, shuffle_partitions=None):
        out = orig_tune(s, shuffle_partitions=5)
        out.conf.set("spark.sql.files.maxPartitionBytes", "262144")
        out.conf.set("spark.sql.files.openCostInBytes", "0")
        out.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        out.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
        return out

    monkeypatch.setattr(driver, "tune", tiny_tune)
    try:
        got = _rowset(spec.build(spark, SF))
    finally:
        monkeypatch.undo()
        orig_tune(spark)  # restore the tune-owned conf keys
        # and the adversarial keys tune does not own
        spark.conf.unset("spark.sql.files.openCostInBytes")
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
    assert got == base, name
