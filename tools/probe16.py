#!/usr/bin/env python
"""16x scale probe for the round-6 operator additions (PLANS.md
method): run each operator on its sf0.1 input and on the same input
unioned 16x with shifted keys, report warm wall time and the exchange
count of the FINAL adaptive plan at both scales.  A healthy operator
keeps the exchange count flat while wall time scales in the shuffled
bytes.

Usage: python tools/probe16.py [op ...]   (default: all)
"""

from __future__ import annotations

import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import DataFrame, functions as F

from yc_data_transfer_clickhouse_from_yandex_metrica_spark.functions import ch, chjson
from yc_data_transfer_clickhouse_from_yandex_metrica_spark.operators import corpus, funnel, maps, text
from yc_data_transfer_clickhouse_from_yandex_metrica_spark.queries.driver import t
from yc_data_transfer_clickhouse_from_yandex_metrica_spark.session import get_spark

SF = "/root/testdata/sf0.1"


def _steps():
    return [
        F.col("event_type") == "view",
        F.col("event_type") == "click",
        F.col("event_type") == "purchase",
    ]


def scale16(df: DataFrame, shift_cols: dict[str, int]) -> DataFrame:
    """Union 16 shifted copies: per-key structure is preserved, key
    cardinality and row count both grow 16x."""
    copies = []
    for i in range(16):
        c = df
        for col, step in shift_cols.items():
            c = c.withColumn(col, F.col(col) + F.lit(i * step))
        copies.append(c)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def build_funnel(ev: DataFrame) -> DataFrame:
    d = funnel.window_funnel(ev, "user_id", "ts", _steps(), window_seconds=86400)
    return d.groupBy("depth").agg(ch.count_one().alias("users"))


def build_seq(ev: DataFrame) -> DataFrame:
    return funnel.sequence_match(
        ev, "user_id", "ts", _steps(), max_gaps=[2 * 86400, 2 * 86400]
    )


def build_aggmap(li: DataFrame, o: DataFrame) -> DataFrame:
    per_order = (
        li.groupBy("l_orderkey")
        .agg(F.collect_list(F.struct("l_returnflag", "l_quantity")).alias("p"))
        .select(
            "l_orderkey",
            F.transform("p", lambda s: s["l_returnflag"]).alias("ks"),
            F.transform("p", lambda s: s["l_quantity"]).alias("vs"),
        )
    )
    joined = per_order.join(o, per_order["l_orderkey"] == o["o_orderkey"])
    return maps.sum_map(joined, ["o_orderpriority"], "ks", "vs")


def build_url(o: DataFrame) -> DataFrame:
    url = F.concat(
        F.lit("https://shop"), (F.col("o_custkey") % 5).cast("string"),
        F.lit(".example.com/cat/"), (F.col("o_orderkey") % 7).cast("string"),
        F.lit("/item?page="), (F.col("o_orderkey") % 3).cast("string"),
        F.lit("&src="), F.translate(F.col("o_orderpriority"), " ", "-"),
    )
    u = o.select("o_orderkey", url.alias("url"))
    return u.select(
        "o_orderkey",
        ch.url_protocol("url").alias("proto"),
        ch.url_domain("url").alias("host"),
        ch.url_top_level_domain("url").alias("tld"),
        ch.url_path("url").alias("path"),
        ch.url_query_string("url").alias("qs"),
        ch.extract_url_parameter("url", "page").alias("page"),
        ch.cut_query_string("url").alias("no_qs"),
    )


def build_json(ev: DataFrame) -> DataFrame:
    return ev.select(
        "event_id",
        chjson.json_extract_int("props", "k").alias("k_int"),
        chjson.json_has("props", "k").alias("has_k"),
        chjson.json_length("props").alias("n_keys"),
        chjson.json_type("props", "k").alias("t_k"),
        F.array_join(chjson.json_extract_keys("props"), ",").alias("keys"),
    )


def sign_ledger(ev: DataFrame) -> DataFrame:
    """The driver's _events_sign_ledger shape on an arbitrary events
    frame (probe needs the 16x variant, which the driver helper's
    (spark, sf_dir) signature can't produce)."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    versioned = ev.select(
        F.col("user_id").alias("VisitID"),
        F.col("ts").cast("date").alias("day"),
        F.row_number().over(w).alias("VisitVersion"),
    ).withColumn(
        "__maxv", F.max("VisitVersion").over(Window.partitionBy("VisitID"))
    )
    return versioned.select(
        "VisitID",
        "day",
        "VisitVersion",
        F.explode(
            F.when(
                F.col("VisitVersion") < F.col("__maxv"),
                F.array(F.lit(1), F.lit(-1)),
            ).otherwise(F.array(F.lit(1)))
        ).alias("Sign"),
    )


def build_chsql_final(spark, ledger: DataFrame) -> DataFrame:
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.plans import chsql

    return chsql.run_sql(
        spark,
        "SELECT toMonday(day) AS week, count(1) AS live_visits "
        "FROM visits FINAL GROUP BY week ORDER BY week",
        {"visits": ledger},
        table_meta={
            "visits": chsql.TableMeta(
                key=("VisitID",), version="VisitVersion", sign="Sign"
            )
        },
    )


def build_chsql_sample(spark, li: DataFrame) -> DataFrame:
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.plans import chsql

    return chsql.run_sql(
        spark,
        "SELECT l_linestatus, count(1) AS n, "
        "toInt64(sum(toInt64(l_quantity))) AS qty "
        "FROM lineitem SAMPLE 1/16 GROUP BY l_linestatus",
        {"lineitem": li},
        table_meta={"lineitem": chsql.TableMeta(sample_by="l_orderkey")},
    )


def build_chsql_asof(spark, ev: DataFrame) -> DataFrame:
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.plans import chjoin

    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    return chjoin.run_sql(
        spark,
        "SELECT event_id, user_id, "
        "floor(p.purchase_value * 100 + 0.5) / 100. AS purchase_value "
        "FROM clicks c ASOF LEFT JOIN purchases p "
        "ON c.user_id = p.user_id AND c.ts >= p.ts",
        {"clicks": clicks, "purchases": purchases},
    )


def build_chsql_any(spark, o: DataFrame, li: DataFrame) -> DataFrame:
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.plans import chjoin

    return chjoin.run_sql(
        spark,
        "SELECT l.l_returnflag AS flag, count(1) AS n, "
        "toInt64(sum(toInt64(l_quantity))) AS qty "
        "FROM orders o ANY INNER JOIN lineitem l "
        "ON o.o_orderkey = l.l_orderkey GROUP BY flag ORDER BY flag",
        {"orders": o, "lineitem": li},
    )


def build_chsql_summap(spark, li: DataFrame, o: DataFrame) -> DataFrame:
    """The r12 statement-level structural compile (chsql_summap entry
    shape): sumMap + topK + count(1) in one statement -- residual
    GROUP BY joined null-safely onto one chain per structural item."""
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.plans import chsql

    per_order = (
        li.groupBy("l_orderkey")
        .agg(F.collect_list(F.struct("l_returnflag", "l_quantity")).alias("p"))
        .select(
            "l_orderkey",
            F.transform("p", lambda s: s["l_returnflag"]).alias("ks"),
            F.transform("p", lambda s: s["l_quantity"]).alias("vs"),
        )
    )
    pairs = per_order.join(
        o, per_order["l_orderkey"] == o["o_orderkey"]
    ).withColumn("nitems", F.size("ks"))
    return chsql.run_sql(
        spark,
        "SELECT o_orderpriority, count(1) AS orders_n, "
        "sumMap(ks, vs) AS m, topK(2)(nitems) AS top_n "
        "FROM pairs GROUP BY o_orderpriority",
        {"pairs": pairs},
    )


def build_chsql_running(spark, ev: DataFrame) -> DataFrame:
    """The r12 runningDifference compile: a global-order window over
    the POST-AGGREGATION frame -- the boundedness claim is that the
    window input is |axis values| rows no matter how big the fact
    side grows (16x rows, same day axis)."""
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.plans import chsql

    return chsql.run_sql(
        spark,
        "SELECT toDate(ts) AS day, count(1) AS n, "
        "runningDifference(count(1)) AS delta "
        "FROM ev GROUP BY day ORDER BY day",
        {"ev": ev},
    )


def build_chsql_topk(spark, ev: DataFrame) -> DataFrame:
    """Grouped topK fast path: rank window over the REDUCED
    (group, distinct value) stream."""
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.plans import chsql

    cohorts = ev.select(
        "event_type", (F.col("user_id") % 1000).alias("cohort")
    )
    return chsql.run_sql(
        spark,
        "SELECT event_type, topK(3)(cohort) AS top_cohorts "
        "FROM ev GROUP BY event_type",
        {"ev": cohorts},
    )


def build_chsql_wf(spark, ev: DataFrame) -> DataFrame:
    """The r11 windowFunnel SQL compile (backward-DP window layers):
    the boundedness claim is ONE hash(user) exchange at both scales --
    all k-1 window layers share the partitioning."""
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.plans import chsql

    return chsql.run_sql(
        spark,
        "SELECT user_id, windowFunnel(86400)(ts, event_type = 'view', "
        "event_type = 'click', event_type = 'purchase') AS depth "
        "FROM ev GROUP BY user_id",
        {"ev": ev},
    )


def build_chsql_seqm(spark, ev: DataFrame) -> DataFrame:
    """The r11 sequenceMatch SQL compile with a gap constraint: k
    conditional window-mins over bounded RANGE frames, one exchange."""
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.plans import chsql

    return chsql.run_sql(
        spark,
        "SELECT user_id, sequenceMatch('(?1)(?t<=86400)(?2)')(ts, "
        "event_type = 'view', event_type = 'purchase') AS m "
        "FROM ev GROUP BY user_id",
        {"ev": ev},
    )


def build_chsql_sweeps(spark, ev: DataFrame) -> DataFrame:
    """The r11 interval sweep compiles: maxIntersections' explode is a
    plain 2-struct array (codegen'd Generate, not an HOF child), both
    sweeps one hash(user) exchange."""
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.plans import chsql

    us = F.unix_micros(F.col("ts").cast("timestamp"))
    start = (us / 1_000_000).cast("long")
    spans = ev.select(
        "user_id",
        start.alias("s"),
        (start + (F.abs(F.col("value")) * 60).cast("long")).alias("e"),
    )
    return chsql.run_sql(
        spark,
        "SELECT user_id, intervalLengthSum(s, e) AS covered, "
        "maxIntersections(s, e) AS peak FROM ev GROUP BY user_id",
        {"ev": spans},
    )


def measure(name: str, df: DataFrame) -> tuple[float, int, int]:
    """(warm wall sec, exchange count of final plan, rows)."""
    df.write.mode("overwrite").format("noop").save()  # warm
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    wall = time.perf_counter() - t0
    n = df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    ex = len(re.findall(r"\bExchange (hash|range|Single)", final))
    return wall, ex, n


def main(only: set[str]) -> None:
    spark = get_spark(app_name="probe16", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    ev = t(spark, SF, "events")
    li = t(spark, SF, "lineitem")
    o = t(spark, SF, "orders").select("o_orderkey", "o_custkey", "o_orderpriority")
    docs = t(spark, SF, "documents")
    docs16 = scale16(docs, {"doc_id": 10_000_000})
    ev16 = scale16(ev, {"user_id": 10_000_000, "event_id": 1_000_000_000})
    li16 = scale16(li, {"l_orderkey": 1_000_000_000})
    o16 = scale16(o, {"o_orderkey": 1_000_000_000, "o_custkey": 100_000_000})

    probes = {
        "window_funnel": (lambda: build_funnel(ev), lambda: build_funnel(ev16)),
        "sequence_match_gaps": (lambda: build_seq(ev), lambda: build_seq(ev16)),
        "agg_map": (
            lambda: build_aggmap(li, o.select("o_orderkey", "o_orderpriority")),
            lambda: build_aggmap(li16, o16.select("o_orderkey", "o_orderpriority")),
        ),
        "url_funcs": (lambda: build_url(o), lambda: build_url(o16)),
        "json_funcs": (lambda: build_json(ev), lambda: build_json(ev16)),
        "tfidf_top_terms": (
            lambda: corpus.tfidf_top_terms(docs, k=5),
            lambda: corpus.tfidf_top_terms(docs16, k=5),
        ),
        "bigram_lm_score": (
            lambda: corpus.bigram_lm_score(docs),
            lambda: corpus.bigram_lm_score(docs16),
        ),
        "shard_assign": (
            lambda: corpus.shard_assign(docs, n_shards=32),
            lambda: corpus.shard_assign(docs16, n_shards=32),
        ),
        "domain_quota": (
            lambda: corpus.domain_quota(
                docs, "source", ch.round_to(text.quality_score("text"), 4), cap=15
            ),
            lambda: corpus.domain_quota(
                docs16, "source", ch.round_to(text.quality_score("text"), 4), cap=15
            ),
        ),
        # round-11 probes: the r10 FINAL/SAMPLE compile shapes plus the
        # r11 chjoin ASOF/ANY shapes (full lineitem/orders frames so
        # the ANY dedup window sees the real column set)
        "chsql_final": (
            lambda: build_chsql_final(spark, sign_ledger(ev)),
            lambda: build_chsql_final(spark, sign_ledger(ev16)),
        ),
        "chsql_sample": (
            lambda: build_chsql_sample(spark, li),
            lambda: build_chsql_sample(spark, li16),
        ),
        "chsql_asof": (
            lambda: build_chsql_asof(spark, ev),
            lambda: build_chsql_asof(spark, ev16),
        ),
        "chsql_any_join": (
            lambda: build_chsql_any(
                spark, t(spark, SF, "orders"), li
            ),
            lambda: build_chsql_any(
                spark,
                scale16(
                    t(spark, SF, "orders"),
                    {"o_orderkey": 1_000_000_000, "o_custkey": 100_000_000},
                ),
                li16,
            ),
        ),
        # round-12 probes: the statement-level structural aggregate
        # compiles (sumMap residual-join mixed statement; grouped topK
        # rank window over the reduced distinct-value stream)
        "chsql_summap": (
            lambda: build_chsql_summap(
                spark, li, o.select("o_orderkey", "o_orderpriority")
            ),
            lambda: build_chsql_summap(
                spark, li16, o16.select("o_orderkey", "o_orderpriority")
            ),
        ),
        "chsql_topk": (
            lambda: build_chsql_topk(spark, ev),
            lambda: build_chsql_topk(spark, ev16),
        ),
        "chsql_running": (
            lambda: build_chsql_running(spark, ev),
            lambda: build_chsql_running(spark, ev16),
        ),
        # round-11 probes: the funnel/sequence/sweep SQL compiles
        "chsql_window_funnel": (
            lambda: build_chsql_wf(spark, ev),
            lambda: build_chsql_wf(spark, ev16),
        ),
        "chsql_sequence_match": (
            lambda: build_chsql_seqm(spark, ev),
            lambda: build_chsql_seqm(spark, ev16),
        ),
        "chsql_sweeps": (
            lambda: build_chsql_sweeps(spark, ev),
            lambda: build_chsql_sweeps(spark, ev16),
        ),
    }
    for name, (b1, b16) in probes.items():
        if only and name not in only:
            continue
        w1, e1, n1 = measure(name, b1())
        w16, e16, n16 = measure(name, b16())
        print(
            f"PROBE {name}: 1x {w1:.2f}s/{e1}ex/{n1}rows  "
            f"16x {w16:.2f}s/{e16}ex/{n16}rows  ratio {w16 / w1:.1f}x",
            flush=True,
        )


if __name__ == "__main__":
    main(set(sys.argv[1:]))
