"""Property test for the CH JSON family (functions/chjson.py) against
a pure-Python model over RANDOM documents.

The driver entry (`json_funcs`) pins a 17-column battery on fixed
corpus text; this derives the documented semantics independently on
hypothesis-generated nested JSON — objects with identifier keys,
arrays, strings (including numeric-looking ones: '42' must NOT
coerce), Int64-range ints, doubles, bools, nulls — and random paths
into (and off) the structure:

- json_has: 1 iff the path resolves (a JSON null counts);
- json_extract_string: strict — the value itself only when it IS a
  string, else '' (numbers/bools never stringify);
- json_extract_int: ints exact over the full generated range, floats
  truncate toward zero, strings/bools/containers -> 0;
- json_extract_float: ints+floats as double, everything else 0.0;
- json_extract_bool: JSON true/false -> 1/0, everything else 0;
- json_length: array element count / object key count, else 0;
- json_extract_keys: sorted keys (documented deviation) or [];
- json_type: the CH type-name table;
- json_extract_raw / json_extract_array_raw: compared by RE-PARSING
  (json.loads) so engine float/escape formatting differences cannot
  flake — the value must round-trip, '' / [] when missing.
"""

from __future__ import annotations

import json
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from yc_data_transfer_clickhouse_from_yandex_metrica_spark.functions import chjson

_keys = st.sampled_from(["a", "b", "cc", "d_1", "x"])
_strings = st.one_of(
    st.sampled_from(["42", "1.5", "-7", "true", "null", ""]),
    st.text(alphabet='ab é🙂"\\\n,:{}[]', max_size=8),
)
_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**62), max_value=2**62),
    st.floats(
        allow_nan=False,
        allow_infinity=False,
        min_value=-1e15,
        max_value=1e15,
    ),
    _strings,
)
_json_vals = st.recursive(
    _scalars,
    lambda inner: st.one_of(
        st.lists(inner, max_size=4),
        st.dictionaries(_keys, inner, max_size=4),
    ),
    max_leaves=8,
)


def _pick_path(doc, seeds):
    """Walk the doc by the seed list; returns (ch_path, value, found).
    A seed walking off a scalar or an empty container makes the path
    missing."""
    path, cur = [], doc
    for s in seeds:
        if isinstance(cur, dict):
            if not cur:
                path.append("zz")
                return path, None, False
            if s % 3 == 0:  # sometimes a missing key
                path.append("zz")
                return path, None, False
            k = sorted(cur)[s % len(cur)]
            path.append(k)
            cur = cur[k]
        elif isinstance(cur, list):
            if not cur:
                path.append(1)
                return path, None, False
            i = s % len(cur)
            path.append(i + 1)  # CH 1-based
            cur = cur[i]
        else:
            path.append("zz")
            return path, None, False
    return path, cur, True


def _model(value, found):
    if not found:
        return {
            "has": 0, "s": "", "i": 0, "f": 0.0, "b": 0,
            "n": 0, "keys": [], "t": "",
        }
    out = {"has": 1, "s": "", "i": 0, "f": 0.0, "b": 0, "n": 0, "keys": []}
    if value is None:
        out["t"] = "Null"
    elif isinstance(value, bool):
        out["t"] = "Bool"
        out["b"] = int(value)
    elif isinstance(value, int):
        out["t"] = "Int64"
        out["i"] = value
        out["f"] = float(value)
    elif isinstance(value, float):
        out["t"] = "Double"
        out["i"] = math.trunc(value)
        out["f"] = value
    elif isinstance(value, str):
        out["t"] = "String"
        out["s"] = value
    elif isinstance(value, list):
        out["t"] = "Array"
        out["n"] = len(value)
    else:
        out["t"] = "Object"
        out["n"] = len(value)
        out["keys"] = sorted(value)
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(_json_vals, st.lists(st.integers(0, 10), max_size=3)),
        min_size=1,
        max_size=6,
    )
)
def test_json_family_matches_python_model(spark, cases):
    rows, models, paths = [], [], []
    for i, (doc, seeds) in enumerate(cases):
        path, value, found = _pick_path(doc, seeds)
        rows.append((i, json.dumps(doc)))
        models.append((doc, path, value, found, _model(value, found)))
        paths.append(path)
    df = spark.createDataFrame(rows, "i long, j string")

    for i, (doc, path, value, found, m) in enumerate(models):
        row = df.where(F.col("i") == i).select(
            chjson.json_has("j", *path).alias("has"),
            chjson.json_extract_string("j", *path).alias("s"),
            chjson.json_extract_int("j", *path).alias("ii"),
            chjson.json_extract_float("j", *path).alias("f"),
            chjson.json_extract_bool("j", *path).alias("b"),
            chjson.json_length("j", *path).alias("n"),
            chjson.json_extract_keys("j", *path).alias("keys"),
            chjson.json_type("j", *path).alias("t"),
            chjson.json_extract_raw("j", *path).alias("raw"),
            chjson.json_extract_array_raw("j", *path).alias("araw"),
        ).collect()[0]
        ctx = (doc, path, value)
        assert row["has"] == m["has"], ctx
        assert row["s"] == m["s"], ctx
        assert row["ii"] == m["i"], ctx
        assert math.isclose(row["f"], m["f"], rel_tol=1e-12), ctx
        assert row["b"] == m["b"], ctx
        assert row["n"] == m["n"], ctx
        assert list(row["keys"]) == m["keys"], ctx
        assert row["t"] == m["t"], ctx
        # raw: round-trip compare (engine float/escape formatting may
        # legally differ)
        if found:
            assert json.loads(row["raw"]) == value, ctx
        else:
            assert row["raw"] == "", ctx
        if found and isinstance(value, list):
            assert [json.loads(x) for x in row["araw"]] == value, ctx
        else:
            assert list(row["araw"]) == [], ctx
