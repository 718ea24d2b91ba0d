#!/usr/bin/env python
"""json_funcs cost-structure experiment (round 19 optimization).

Times isolated pieces of the variant battery at sf0.1 to find where
the 12.5 s goes: repeated try_parse_json? schema_of_variant?  rlike
gates?  the final sort?
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def timed(label, df, runs=3):
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        ts.append(time.perf_counter() - t0)
    print(f"{statistics.median(ts):8.3f}  {label}   runs={[round(x,2) for x in ts]}")


def main():
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.functions import chjson
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.queries.driver import (
        QUERIES,
        _JSON_EDGE_CASE,
        t,
    )
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.session import get_spark

    spark = get_spark(
        app_name="exp-json",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS) if CPUS.isdigit() else 32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id % 7)").write.mode("overwrite").format(
        "noop"
    ).save()

    e = t(spark, SF_DIR, "events").withColumn("__j", F.expr(_JSON_EDGE_CASE))

    # 0. scan only
    timed("scan+casegen only", e.select("event_id", "__j"))

    # 1. single parse -> to_json (1 parse per row)
    timed(
        "parse x1 (to_json)",
        e.select("event_id", F.to_json(F.try_parse_json("__j")).alias("a")),
    )

    # 2. 14 independent parses -> to_json (tests CSE of try_parse_json)
    timed(
        "parse x14 (to_json)",
        e.select(
            "event_id",
            *[
                F.to_json(F.try_parse_json("__j")).alias(f"a{i}")
                for i in range(14)
            ],
        ),
    )

    # 3. one parse + 14 variant_get(+schema_of_variant) pairs
    v = F.try_parse_json("__j")
    timed(
        "parse+vget x14",
        e.select(
            "event_id",
            *[
                F.variant_get(v, "$.n", "variant").cast("string").alias(f"a{i}")
                for i in range(14)
            ],
        ),
    )
    timed(
        "parse+vget+schema x14",
        e.select(
            "event_id",
            *[
                F.schema_of_variant(
                    F.variant_get(v, "$.n", "variant")
                ).alias(f"a{i}")
                for i in range(14)
            ],
        ),
    )

    # 4. full query, and without the final orderBy
    timed("full q_json_funcs", QUERIES["json_funcs"].build(spark, SF_DIR))

    q = QUERIES["json_funcs"].build(spark, SF_DIR)
    # rebuild without sort: select the same columns off the pre-sort child
    e2 = t(spark, SF_DIR, "events").withColumn("__j", F.expr(_JSON_EDGE_CASE))
    cols = [
        "event_id",
        chjson.json_extract_int("props", "k").alias("k_int"),
        chjson.json_has("props", "k").alias("has_k"),
        chjson.json_extract_string("__j", "s").alias("s_str"),
        chjson.json_extract_int("__j", "n").alias("n_int"),
        F.round(chjson.json_extract_float("__j", "n"), 6).alias("n_flt"),
        chjson.json_extract_bool("__j", "b").alias("b_int"),
        chjson.json_has("__j", "s").alias("has_s"),
        chjson.json_extract_int("__j", "big").alias("big_int"),
        chjson.json_extract_int("__j", "o", "a", "b").alias("oab"),
        F.round(chjson.json_extract_float("__j", "arr", 2), 6).alias("arr2"),
        chjson.json_extract_raw("__j", "o").alias("raw_o"),
        F.array_join(chjson.json_extract_array_raw("__j", "arr"), "|").alias(
            "arr_raw"
        ),
        F.array_join(chjson.json_extract_keys("__j"), ",").alias("keys"),
        chjson.json_length("__j").alias("obj_len"),
        chjson.json_length("__j", "arr").alias("arr_len"),
        chjson.json_type("__j", "n").alias("t_n"),
    ]
    timed("full minus orderBy", e2.select(*cols))

    # 5. single extraction families in isolation
    timed(
        "json_extract_int only (4x)",
        e2.select(
            "event_id",
            chjson.json_extract_int("props", "k").alias("k_int"),
            chjson.json_extract_int("__j", "n").alias("n_int"),
            chjson.json_extract_int("__j", "big").alias("big_int"),
            chjson.json_extract_int("__j", "o", "a", "b").alias("oab"),
        ),
    )
    timed(
        "json_type + json_length (3 cols)",
        e2.select(
            "event_id",
            chjson.json_length("__j").alias("obj_len"),
            chjson.json_length("__j", "arr").alias("arr_len"),
            chjson.json_type("__j", "n").alias("t_n"),
        ),
    )


if __name__ == "__main__":
    main()
