#!/usr/bin/env python
"""Round-19 optimization profiler.

Time individual registry queries through the same noop-sink
methodology as bench.py (plan+execute, medians), and dump
``explain("formatted")`` plans for the before/after evidence the
round requires (plans/r19/<query>_{before,after}.txt).

Usage:
  python tools/opt_profile.py time <query> [<query> ...] [--runs N]
  python tools/opt_profile.py plan <query> [--out plans/r19/x_before.txt]
  python tools/opt_profile.py jobs <query>      # count Spark jobs/stages

Honors $SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS like bench.py.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _spark():
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.session import get_spark

    spark = get_spark(
        app_name="ym-opt-profile",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS) if CPUS.isdigit() else 32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    # same uncounted warmup as bench.py
    spark.range(1_000_000).selectExpr("sum(id % 7)").write.mode("overwrite").format(
        "noop"
    ).save()

    def _identity(it):
        yield from it

    spark.range(1000).repartition(int(CPUS) if CPUS.isdigit() else 32).mapInPandas(
        _identity, schema="id long"
    ).write.mode("overwrite").format("noop").save()
    return spark


def _release(spark):
    try:
        jsc = spark.sparkContext._jsc.sc()
        it = jsc.getPersistentRDDs().values().iterator()
        while it.hasNext():
            it.next().unpersist(False)
    except Exception:
        pass


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["time", "plan", "jobs"])
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.queries.driver import (
        QUERIES,
    )

    spark = _spark()

    if args.mode == "time":
        runs: dict[str, list[float]] = {q: [] for q in args.queries}
        for _ in range(args.runs):
            for q in args.queries:
                spark.sparkContext.setJobDescription(f"opt: {q}")
                t0 = time.perf_counter()
                df = QUERIES[q].build(spark, SF_DIR)
                df.write.mode("overwrite").format("noop").save()
                runs[q].append(round(time.perf_counter() - t0, 3))
                _release(spark)
        for q, r in runs.items():
            print(f"{statistics.median(r):8.3f}  {q}  runs={r}")
    elif args.mode == "plan":
        for q in args.queries:
            df = QUERIES[q].build(spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            if args.out:
                with open(args.out, "w") as fh:
                    fh.write(txt)
                print(f"wrote {args.out} ({len(txt)} chars)")
            else:
                print(txt)
    elif args.mode == "jobs":
        st = spark.sparkContext.statusTracker()
        for q in args.queries:
            before_jobs = len(st.getJobIdsForGroup() or [])
            spark.sparkContext.setJobGroup(f"opt-{q}", q)
            t0 = time.perf_counter()
            df = QUERIES[q].build(spark, SF_DIR)
            df.write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            jobs = st.getJobIdsForGroup(f"opt-{q}") or []
            nstages = 0
            for j in jobs:
                ji = st.getJobInfo(j)
                if ji:
                    nstages += len(ji.stageIds)
            print(f"{q}: {dt:.3f}s  jobs={len(jobs)}  stages={nstages}")
            spark.sparkContext.setJobGroup(None, None)
            _release(spark)


if __name__ == "__main__":
    main()
