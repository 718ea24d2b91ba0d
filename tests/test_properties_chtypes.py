"""Property tests for the CH↔Spark type grid (sources/chtypes.py).

tests/test_operators.py pins a hand-written golden grid; these tests
generate random NESTED ClickHouse type strings and check:

1. canonical roundtrip — on the canonical subset (the spellings
   ``spark_to_ch`` itself emits), ``spark_to_ch(ch_to_spark(t)) == t``
   for arbitrarily deep Array/Map/Tuple/Nullable compositions;
2. wrapper transparency — ``LowCardinality(T)`` and
   ``SimpleAggregateFunction(f, T)`` map exactly like ``T``;
3. quote-aware argument splitting — ``Enum8/16`` with names
   containing commas, parens, and both quote kinds still map to
   String (the ``_split_args`` quote/depth state machine);
4. totality — random garbage type strings either map or raise
   ``UnsupportedCHType``/``ValueError``, never anything else.

The canonical subset excludes ``Decimal(20, 0)`` (it reads back as
the UInt64 carrier by design — pinned separately below).
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from yc_data_transfer_clickhouse_from_yandex_metrica_spark.sources import chtypes

# scalars exactly as spark_to_ch spells them (canonical roundtrip set)
_scalars = st.one_of(
    st.sampled_from(
        [
            "Int8", "Int16", "Int32", "Int64",
            "Float32", "Float64", "String", "Bool", "Date",
            "DateTime64(6)", "UInt64",
        ]
    ),
    st.tuples(
        st.integers(min_value=1, max_value=38),
        st.integers(min_value=0, max_value=38),
    )
    .filter(lambda ps: ps[1] <= ps[0] and ps != (20, 0))
    .map(lambda ps: f"Decimal({ps[0]}, {ps[1]})"),
)

_names = st.text(alphabet="abcdefgh", min_size=1, max_size=5)


def _nullable_scalar(t):
    # CH forbids Nullable composites; scalar-only wrapping
    return f"Nullable({t})"


_canonical = st.recursive(
    st.one_of(_scalars, _scalars.map(_nullable_scalar)),
    lambda inner: st.one_of(
        inner.map(lambda t: f"Array({t})"),
        st.tuples(_scalars, inner).map(
            lambda kv: f"Map({kv[0]}, {kv[1]})"
        ),
        st.lists(
            st.tuples(_names, inner), min_size=1, max_size=3
        ).map(
            lambda fs: "Tuple("
            + ", ".join(f"{n} {t}" for n, t in fs)
            + ")"
        ),
    ),
    max_leaves=6,
)


@settings(max_examples=200, deadline=None)
@given(_canonical)
def test_canonical_roundtrip(ch):
    dt, nullable = chtypes.ch_to_spark(ch)
    # composites never come back Nullable at the top (CH forbids it);
    # scalar nullability is carried in the flag
    back = chtypes.spark_to_ch(dt, nullable)
    assert back == ch, (ch, dt, back)


def test_decimal_20_0_reads_back_as_uint64():
    dt, nullable = chtypes.ch_to_spark("Decimal(20, 0)")
    assert chtypes.spark_to_ch(dt, nullable) == "UInt64"


@settings(max_examples=100, deadline=None)
@given(_canonical, st.booleans())
def test_wrapper_transparency(ch, simple_agg):
    wrapped = (
        f"SimpleAggregateFunction(max, {ch})"
        if simple_agg
        else f"LowCardinality({ch})"
    )
    assert chtypes.ch_to_spark(wrapped) == chtypes.ch_to_spark(ch), wrapped


# enum NAMES may contain commas, parens, equals signs, and the other
# quote character — the _split_args quote state machine must not
# split or nest on any of them
_enum_name = st.text(
    alphabet="ab,()= \t-x", min_size=0, max_size=8
)


@settings(max_examples=100, deadline=None)
@given(
    st.sampled_from(["Enum8", "Enum16"]),
    st.lists(
        st.tuples(_enum_name, st.integers(min_value=-128, max_value=127)),
        min_size=1,
        max_size=4,
    ),
    st.sampled_from(["'", '"']),
)
def test_enum_adversarial_names_map_to_string(base, items, q):
    other = '"' if q == "'" else "'"
    body = ", ".join(
        f"{q}{name.replace(q, other)}{q} = {val}" for name, val in items
    )
    ch = f"{base}({body})"
    from pyspark.sql import types as T

    assert chtypes.ch_to_spark(ch) == (T.StringType(), False), ch
    # and nested under Nullable/Array the quote handling still holds
    assert chtypes.ch_to_spark(f"Nullable({ch})") == (T.StringType(), True)
    assert chtypes.ch_to_spark(f"Array({ch})")[0].elementType == T.StringType()


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="AbNulayMpT(),'8 ", max_size=30))
def test_totality_map_or_typed_error(s):
    """Garbage either maps or raises ValueError (UnsupportedCHType is
    a subclass) — never IndexError/KeyError/AttributeError: the string
    typically arrives from external DDL text, so crash-class escapes
    are bugs (missing-argument forms like ``Nullable()`` raised bare
    IndexError before r14)."""
    try:
        chtypes.ch_to_spark(s)
    except ValueError:
        pass
    except Exception as e:  # pragma: no cover
        pytest.fail(f"non-ValueError escape for {s!r}: {type(e).__name__} {e}")


def test_missing_arguments_raise_typed():
    for bad in ("Nullable()", "Array()", "Map(Int8)", "Decimal32()",
                "LowCardinality()", "Nullable"):
        with pytest.raises(chtypes.UnsupportedCHType, match="missing type"):
            chtypes.ch_to_spark(bad)
