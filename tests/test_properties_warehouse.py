"""Property test for warehouse TTL tiering (S9) against a pure-Python
Monday-week model: for random row dates and a random cutoff date,

- the moved week list equals exactly the weeks STRICTLY older than
  monday(cutoff) (model: ``d - timedelta(days=d.weekday())``),
- the hot∪cold tiered read returns the original rows bit-for-bit
  (tiering is metadata-only — no row may be lost or duplicated),
- weeks at/after the cutoff week remain in the hot tier,
- a second apply_ttl is a no-op (idempotent),
- delete mode removes exactly the model's aged weeks.

The unit test (test_operators.py) pins hand cases; this derives the
week arithmetic independently so a ``to_monday`` or lexicographic-
comparison regression (the aged check compares ISO strings) surfaces
on random inputs.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from datetime import date, timedelta

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from yc_data_transfer_clickhouse_from_yandex_metrica_spark.sources import warehouse

_dates = st.dates(min_value=date(2022, 1, 1), max_value=date(2024, 12, 31))


def _monday(d: date) -> str:
    return (d - timedelta(days=d.weekday())).isoformat()


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(_dates, min_size=1, max_size=12),
    _dates,
    st.sampled_from(["move", "delete"]),
)
# every week ages out: the hot root keeps only the meta sidecar and
# the tiered read must degrade to the cold tier (r14 bug, fixed in
# read_table_tiered — pinned here so the case survives a cleared
# hypothesis database)
@example(
    row_dates=[date(2022, 1, 1)], cutoff=date(2022, 2, 1), action="move"
)
def test_apply_ttl_matches_monday_model(spark, row_dates, cutoff, action):
    base = tempfile.mkdtemp(prefix="ym_ttl_prop_")
    try:
        hot, cold = f"{base}/hot", f"{base}/cold"
        layout = warehouse.TableLayout(date_col="d", sort_by=["k"])
        rows = [(d, i) for i, d in enumerate(row_dates)]
        df = spark.createDataFrame(rows, "d date, k int")
        warehouse.write_table(df, hot, layout, mode="overwrite")

        cutoff_week = _monday(cutoff)
        all_weeks = sorted({_monday(d) for d in row_dates})
        aged = [w for w in all_weeks if w < cutoff_week]
        kept = [w for w in all_weeks if w >= cutoff_week]

        kwargs = {"cold_path": cold} if action == "move" else {}
        stats = warehouse.apply_ttl(
            spark, hot, cutoff.isoformat(), action=action, **kwargs
        )
        key = "moved" if action == "move" else "deleted"
        assert stats == {"cutoff_week": cutoff_week, key: aged}

        hot_weeks = sorted(
            n.split("=", 1)[1]
            for n in os.listdir(hot)
            if n.startswith("_week=")
        )
        assert hot_weeks == kept

        want = sorted((d.isoformat(), k) for d, k in rows)
        if action == "move":
            got = warehouse.read_table_tiered(spark, hot, cold)
            assert (
                sorted((r["d"].isoformat(), r["k"]) for r in got.collect())
                == want
            )
            # idempotent: second pass moves nothing
            again = warehouse.apply_ttl(
                spark, hot, cutoff.isoformat(), action="move", cold_path=cold
            )
            assert again[key] == []
        else:
            kept_rows = [
                (d.isoformat(), k)
                for d, k in rows
                if _monday(d) >= cutoff_week
            ]
            if kept:
                got = spark.read.parquet(hot)
                assert (
                    sorted((r["d"].isoformat(), r["k"]) for r in got.collect())
                    == sorted(kept_rows)
                )
            else:
                assert kept_rows == []
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_tiered_read_refuses_non_weekly_hot_root(spark):
    """ADVICE r14 #1: a hot root that exists and holds real entries
    but no _week= directories is outside the apply_ttl layout; with a
    populated cold tier the tiered read must ERROR, not silently serve
    cold-only (data would vanish from the union view).  A hot root
    holding only the meta sidecar stays the documented degrade-to-cold
    case."""
    base = tempfile.mkdtemp(prefix="ym_ttl_stray_")
    try:
        hot, cold = f"{base}/hot", f"{base}/cold"
        layout = warehouse.TableLayout(date_col="d", sort_by=["k"])
        df = spark.createDataFrame([(date(2022, 1, 3), 1)], "d date, k int")
        warehouse.write_table(df, hot, layout, mode="overwrite")
        # age out everything -> hot keeps only the meta sidecar
        warehouse.apply_ttl(
            spark, hot, "2023-01-01", action="move", cold_path=cold
        )
        got = warehouse.read_table_tiered(spark, hot, cold)
        assert got.count() == 1  # sidecar-only hot degrades to cold

        # now drop a stray non-weekly file into the hot root
        with open(os.path.join(hot, "stray.parquet"), "w") as f:
            f.write("not weekly layout")
        import pytest

        with pytest.raises(IOError, match="non-weekly"):
            warehouse.read_table_tiered(spark, hot, cold)

        # r15 review: the guard is two-sided and fires regardless of
        # the OTHER tier's state — stray hot with the cold tier gone,
        # and stray cold beside a populated hot, must both refuse
        # rather than silently serve one side
        shutil.rmtree(cold)
        with pytest.raises(IOError, match="hot tier .* non-weekly"):
            warehouse.read_table_tiered(spark, hot, cold)

        hot2, cold2 = f"{base}/hot2", f"{base}/cold2"
        warehouse.write_table(df, hot2, layout, mode="overwrite")
        os.makedirs(cold2)
        with open(os.path.join(cold2, "stray.parquet"), "w") as f:
            f.write("not weekly layout")
        with pytest.raises(IOError, match="cold tier .* non-weekly"):
            warehouse.read_table_tiered(spark, hot2, cold2)
    finally:
        shutil.rmtree(base, ignore_errors=True)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(st.integers(min_value=1, max_value=7), min_size=1, max_size=5),
    st.integers(min_value=1, max_value=5),
    st.integers(min_value=1, max_value=3),
)
def test_compact_partitions_matches_dirty_week_model(
    spark, frags_per_week, max_files, target
):
    """Property form of the compaction unit test: random week count,
    random fragmentation per week, random threshold AND random target
    (target 1 exercises the hash-salt path, target >= 2 the
    range-bucket path — both must honor at-most-target).  Model:
    dirty = weeks whose parquet-file count exceeds the threshold;
    compaction must list exactly those, leave every clean week's file
    names untouched, bring each dirty week to <= the target, and
    preserve the row multiset bit-for-bit."""
    base = tempfile.mkdtemp(prefix="ym_compact_prop_")
    try:
        path = f"{base}/tbl"
        layout = warehouse.TableLayout(date_col="d", sort_by=["k"])
        mondays = [date(2023, 10, 2) + timedelta(weeks=w)
                   for w in range(len(frags_per_week))]
        first = True
        for w, (monday, nfrag) in enumerate(zip(mondays, frags_per_week)):
            for j in range(nfrag):
                frag = spark.createDataFrame(
                    [(monday, 1000 * w + 10 * j + i) for i in range(5)],
                    "d date, k int",
                )
                warehouse.write_table(
                    frag, path, layout,
                    mode="overwrite" if first else "append",
                )
                first = False

        def files(wd):
            return sorted(
                f for f in os.listdir(os.path.join(path, wd))
                if f.endswith(".parquet")
            )

        week_dirs = sorted(
            d for d in os.listdir(path) if d.startswith("_week=")
        )
        before = {wd: files(wd) for wd in week_dirs}
        model_dirty = sorted(
            wd for wd, fl in before.items() if len(fl) > max_files
        )
        rows_before = sorted(
            (str(r["d"]), r["k"])
            for r in spark.read.parquet(path).collect()
        )

        stats = warehouse.compact_partitions(
            spark, path, max_files_per_week=max_files,
            target_files_per_week=target,
        )
        assert sorted(stats["files_before"]) == model_dirty
        for wd in week_dirs:
            if wd in model_dirty:
                assert stats["files_after"][wd] <= target
            else:
                assert files(wd) == before[wd], f"clean {wd} touched"
        rows_after = sorted(
            (str(r["d"]), r["k"])
            for r in spark.read.parquet(path).collect()
        )
        assert rows_after == rows_before
    finally:
        shutil.rmtree(base, ignore_errors=True)

def test_compact_rejects_nonpositive_target(spark):
    """ADVICE r15 #2: pmod/ntile by 0 would silently NULL every
    bucket and collapse each week to one file instead of failing —
    the degenerate input must refuse before touching any metadata."""
    import pytest

    for bad in (0, -1):
        with pytest.raises(ValueError, match="target_files_per_week"):
            warehouse.compact_partitions(
                spark, "/nonexistent/never/read",
                target_files_per_week=bad,
            )


def test_compact_target2_files_cover_disjoint_key_ranges(spark):
    """ADVICE r15 #1: at target > 1 the within-week split must be by
    leading-sort-key RANGE, so each output file covers a disjoint key
    range and file-level min/max skipping survives the split.  The
    fragments interleave keys across the full domain, so the old
    hash-salt layout would give every output file a near-full-domain
    span — overlapping ranges fail this test."""
    base = tempfile.mkdtemp(prefix="ym_compact_range_")
    try:
        path = f"{base}/tbl"
        layout = warehouse.TableLayout(date_col="d", sort_by=["k"])
        monday = date(2023, 10, 9)
        # 6 fragments, each spanning the whole key domain 0..599
        for j in range(6):
            frag = spark.createDataFrame(
                [(monday, j + 6 * i) for i in range(100)],
                "d date, k int",
            )
            warehouse.write_table(
                frag, path, layout,
                mode="overwrite" if j == 0 else "append",
            )
        wd = os.path.join(path, "_week=2023-10-09")
        assert len([f for f in os.listdir(wd) if f.endswith(".parquet")]) >= 6
        rows_before = sorted(
            r["k"] for r in spark.read.parquet(path).collect()
        )

        stats = warehouse.compact_partitions(
            spark, path, max_files_per_week=4, target_files_per_week=2,
        )
        assert 1 <= stats["files_after"]["_week=2023-10-09"] <= 2

        spans = []
        for f in os.listdir(wd):
            if not f.endswith(".parquet"):
                continue
            part = spark.read.parquet(os.path.join(wd, f))
            lo, hi = part.agg(F.min("k"), F.max("k")).first()
            spans.append((lo, hi))
        spans.sort()
        for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
            assert hi_prev < lo_next, f"overlapping file ranges: {spans}"

        rows_after = sorted(
            r["k"] for r in spark.read.parquet(path).collect()
        )
        assert rows_after == rows_before
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_tiered_read_refuses_stray_beside_week_dirs(spark):
    """ADVICE r15 #3: the stray-entry guard must fire even when the
    tier ALSO holds _week= directories — a mixed root (weekly layout
    beside a stray data file) hides the stray just as completely as a
    week-less root would."""
    import pytest

    base = tempfile.mkdtemp(prefix="ym_tiered_mixed_")
    try:
        hot, cold = f"{base}/hot", f"{base}/cold"
        layout = warehouse.TableLayout(date_col="d", sort_by=["k"])
        df = spark.createDataFrame(
            [(date(2022, 1, 3), 1), (date(2022, 3, 7), 2)], "d date, k int"
        )
        warehouse.write_table(df, hot, layout, mode="overwrite")
        warehouse.apply_ttl(
            spark, hot, "2022-02-01", action="move", cold_path=cold
        )
        # sanity: clean mixed-tier read serves both tiers
        assert warehouse.read_table_tiered(spark, hot, cold).count() == 2

        # stray file BESIDE the hot tier's week dirs -> refuse
        with open(os.path.join(hot, "stray.parquet"), "w") as f:
            f.write("not weekly layout")
        with pytest.raises(IOError, match="hot tier .* non-weekly"):
            warehouse.read_table_tiered(spark, hot, cold)
        os.remove(os.path.join(hot, "stray.parquet"))

        # stray file BESIDE the cold tier's week dirs -> refuse
        with open(os.path.join(cold, "stray.csv"), "w") as f:
            f.write("not weekly layout")
        with pytest.raises(IOError, match="cold tier .* non-weekly"):
            warehouse.read_table_tiered(spark, hot, cold)
    finally:
        shutil.rmtree(base, ignore_errors=True)

def test_compact_target2_constant_key_week(spark):
    """Degenerate key distribution: a dirty week whose leading sort
    key is one constant value.  All quantile boundaries equal that
    value, every row buckets to 0, and the week compacts to ONE file
    (<= target, trivially disjoint) with rows intact — the skew case
    the quantile split must not mishandle."""
    base = tempfile.mkdtemp(prefix="ym_compact_const_")
    try:
        path = f"{base}/tbl"
        layout = warehouse.TableLayout(date_col="d", sort_by=["k"])
        monday = date(2023, 10, 9)
        for j in range(6):
            frag = spark.createDataFrame(
                [(monday, 7) for _ in range(20)], "d date, k int"
            )
            warehouse.write_table(
                frag, path, layout,
                mode="overwrite" if j == 0 else "append",
            )
        stats = warehouse.compact_partitions(
            spark, path, max_files_per_week=4, target_files_per_week=2,
        )
        assert stats["files_after"]["_week=2023-10-09"] == 1
        assert spark.read.parquet(path).count() == 120
    finally:
        shutil.rmtree(base, ignore_errors=True)

def test_compact_target2_date_leading_key(spark):
    """DATE leading sort key takes the quantile range-bucket path via
    unix_date (epoch-day proxy): files <= target with disjoint date
    ranges, rows intact — covers the non-int branch of _quantile_ok
    (the unit-range test pins the int branch)."""
    base = tempfile.mkdtemp(prefix="ym_compact_datekey_")
    try:
        path = f"{base}/tbl"
        layout = warehouse.TableLayout(date_col="d", sort_by=["d2"])
        monday = date(2023, 10, 9)
        for j in range(6):
            frag = spark.createDataFrame(
                [(monday, date(2024, 1, 1) + timedelta(days=j + 6 * i))
                 for i in range(40)],
                "d date, d2 date",
            )
            warehouse.write_table(
                frag, path, layout,
                mode="overwrite" if j == 0 else "append",
            )
        stats = warehouse.compact_partitions(
            spark, path, max_files_per_week=4, target_files_per_week=2,
        )
        assert 1 <= stats["files_after"]["_week=2023-10-09"] <= 2
        wd = os.path.join(path, "_week=2023-10-09")
        spans = []
        for f in os.listdir(wd):
            if f.endswith(".parquet"):
                part = spark.read.parquet(os.path.join(wd, f))
                spans.append(tuple(part.agg(F.min("d2"), F.max("d2")).first()))
        spans.sort()
        for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
            assert hi_prev < lo_next, spans
        assert spark.read.parquet(path).count() == 240
    finally:
        shutil.rmtree(base, ignore_errors=True)

def test_compact_target2_timestamp_and_decimal_keys(spark):
    """The remaining _quantile_ok branches: TIMESTAMP leading key
    (unix_micros proxy) and DECIMAL leading key (native quantiles) —
    both must honor at-most-target with rows intact."""
    from datetime import datetime

    for schema, mk in (
        (
            "d date, ts timestamp",
            lambda j, i: datetime(2024, 1, 1 + (j + 6 * i) % 27, (j + i) % 24),
        ),
        (
            "d date, amt decimal(10,2)",
            lambda j, i: __import__("decimal").Decimal(j + 6 * i) / 4,
        ),
    ):
        key = schema.split(",")[1].split()[0]
        base = tempfile.mkdtemp(prefix=f"ym_compact_{key}_")
        try:
            path = f"{base}/tbl"
            layout = warehouse.TableLayout(date_col="d", sort_by=[key])
            monday = date(2023, 10, 9)
            for j in range(6):
                frag = spark.createDataFrame(
                    [(monday, mk(j, i)) for i in range(30)], schema
                )
                warehouse.write_table(
                    frag, path, layout,
                    mode="overwrite" if j == 0 else "append",
                )
            stats = warehouse.compact_partitions(
                spark, path, max_files_per_week=4, target_files_per_week=2,
            )
            assert 1 <= stats["files_after"]["_week=2023-10-09"] <= 2, key
            assert spark.read.parquet(path).count() == 180, key
        finally:
            shutil.rmtree(base, ignore_errors=True)
