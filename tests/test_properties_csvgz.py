"""Property tests for the CSV-gz export/read pair (S3/S4): random
typed rows with adversarial string content survive the
``insert_csv`` → ``read_csv`` roundtrip under the declared schema.

Adversarial content: commas, double quotes, backslashes, unicode,
leading/trailing spaces, and (second test) embedded newlines — the
cases where CSV quoting/escaping does real work.  One documented
CSV-format lossiness is pinned explicitly rather than hidden: Spark's
CSV sink writes both NULL and '' as an empty field, so '' reads back
as NULL (ClickHouse CSVWithNames has the same empty-is-default
behavior for non-quoted empties).

Also pinned: the ClickHouse file-per-insert naming sequence
(``base.csv.gz``, ``base.1.csv.gz``, ...) and the ``_file`` virtual
column matching the basename of the file each row landed in.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from datetime import date

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from yc_data_transfer_clickhouse_from_yandex_metrica_spark.sources import csvgz

_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("s", T.StringType()),
        T.StructField("x", T.DoubleType()),
        T.StructField("d", T.DateType()),
        T.StructField("b", T.BooleanType()),
    ]
)

_texts = st.one_of(
    st.none(),
    st.text(
        alphabet='ab,"\\\'; éж🙂 \t-',
        min_size=0,
        max_size=12,
    ),
)

_rows = st.lists(
    st.tuples(
        st.integers(min_value=-(2**62), max_value=2**62),
        _texts,
        st.one_of(
            st.none(),
            st.floats(
                allow_nan=False, allow_infinity=False, width=32
            ).map(float),
        ),
        st.one_of(
            st.none(),
            st.dates(min_value=date(1970, 1, 2), max_value=date(2100, 1, 1)),
        ),
        st.one_of(st.none(), st.booleans()),
    ),
    min_size=1,
    max_size=10,
)


def _norm(rows):
    # the documented CSV lossiness: '' lands as an empty field and
    # reads back as NULL
    return sorted(
        (
            (i, None if s == "" else s, x, d, b)
            for i, s, x, d, b in rows
        ),
        key=lambda t: tuple((v is None, str(v)) for v in t),
    )


def _collect(df):
    return sorted(
        ((r["id"], r["s"], r["x"], r["d"], r["b"]) for r in df.collect()),
        key=lambda t: tuple((v is None, str(v)) for v in t),
    )


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_rows)
def test_insert_read_roundtrip(spark, rows):
    base = tempfile.mkdtemp(prefix="ym_csv_prop_")
    try:
        df = spark.createDataFrame(rows, _SCHEMA)
        path = csvgz.insert_csv(df, base, "t")
        assert os.path.basename(path) == "t.csv.gz"
        got = csvgz.read_csv(spark, f"{base}/t*.csv.gz", _SCHEMA)
        assert _collect(got) == _norm(rows), rows
        # every row's _file is the single landed basename
        assert {
            r["_file"] for r in got.select("_file").collect()
        } == {"t.csv.gz"}

        # second insert: ClickHouse file-per-insert naming, glob unions
        path2 = csvgz.insert_csv(df, base, "t")
        assert os.path.basename(path2) == "t.1.csv.gz"
        got2 = csvgz.read_csv(spark, f"{base}/t*.csv.gz", _SCHEMA)
        assert _collect(got2) == sorted(
            _norm(rows) + _norm(rows),
            key=lambda t: tuple((v is None, str(v)) for v in t),
        )
        assert {
            r["_file"] for r in got2.select("_file").collect()
        } == {"t.csv.gz", "t.1.csv.gz"}
    finally:
        shutil.rmtree(base, ignore_errors=True)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=100),
            st.text(alphabet='a,"\n\r é', min_size=1, max_size=10).filter(
                lambda s: s.strip("\n\r") != ""
            ),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_embedded_newlines_roundtrip_with_multiline(spark, rows):
    """Embedded newlines are quoted by the writer and need the
    multiLine reader option — the documented schema-on-read contract
    for ClickHouse exports containing raw text."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("s", T.StringType()),
        ]
    )
    base = tempfile.mkdtemp(prefix="ym_csv_nl_")
    try:
        df = spark.createDataFrame(
            [(int(i), s) for i, s in rows], schema
        )
        csvgz.insert_csv(df, base, "nl")
        got = csvgz.read_csv(
            spark, f"{base}/nl*.csv.gz", schema, multiLine=True
        )
        want = sorted((int(i), s) for i, s in rows)
        assert sorted(
            (r["id"], r["s"]) for r in got.collect()
        ) == want, rows
    finally:
        shutil.rmtree(base, ignore_errors=True)
