"""ClickHouse <-> Spark type mapping for the JDBC gateway (S2/S6).

The reference warehouse speaks the ClickHouse type system
(/root/reference/ddl/visits.sql, ddl/hits.sql: UInt8..UInt64,
FixedString(2|16), Date/DateTime, Array(...) incl. nested arrays,
Nullable(...) wrappers); this module pins the engine's documented
policy for moving those columns through a JDBC boundary in both
directions, based on the PUBLIC clickhouse-jdbc type grid (the driver
surfaces UInt64 as java.math.BigInteger/NUMERIC, FixedString and
Enum/UUID/IPv4/IPv6 as String, DateTime64 as Timestamp, Array via
java.sql.Array).

Read policy highlights:

- ``UInt64``: full range does not fit a signed 64-bit long.  Default
  is DECIMAL(20,0) (lossless, matches the driver's BigInteger).  The
  Metrica ids (UserID, CounterUserIDHash...) genuinely use the full
  hash range, so the alternative ``uint64="long"`` policy -- a
  two's-complement reinterpretation, the approach the full-schema
  transcription (schemas_full.py) uses -- is only safe when the
  column is an opaque id: equality/grouping/joins are preserved
  under reinterpretation, ordering and arithmetic are NOT.
- ``FixedString(n)``: StringType (the JDBC driver yields String; the
  length is not representable in Spark and is dropped).
- ``DateTime64(p)``: TimestampType; precision > 6 is truncated to
  Spark's microseconds.
- ``LowCardinality(T)`` / ``SimpleAggregateFunction(f, T)`` are
  transparent codecs/states over T and map to T's mapping.
- ``Nullable(T)`` toggles field nullability; bare columns arrive
  non-nullable, matching ClickHouse semantics.

Write policy (``spark_to_ch`` / ``create_table_types``): the exact
inverse, emitting DDL fragments for spark.write.jdbc's
``createTableColumnTypes`` or an explicit CREATE TABLE.  Composite
types (Array/Map/Tuple) are never wrapped in Nullable -- ClickHouse
forbids Nullable(Array(...)); nullability applies to the innermost
scalar instead.
"""

from __future__ import annotations

from pyspark.sql import types as T

_SIMPLE: dict[str, T.DataType] = {
    "Int8": T.ByteType(),
    "Int16": T.ShortType(),
    "Int32": T.IntegerType(),
    "Int64": T.LongType(),
    "UInt8": T.ShortType(),
    "UInt16": T.IntegerType(),
    "UInt32": T.LongType(),
    "UInt64": T.DecimalType(20, 0),
    "Float32": T.FloatType(),
    "Float64": T.DoubleType(),
    "String": T.StringType(),
    "UUID": T.StringType(),
    "IPv4": T.StringType(),
    "IPv6": T.StringType(),
    "Bool": T.BooleanType(),
    "Date": T.DateType(),
    "Date32": T.DateType(),
    "DateTime": T.TimestampType(),
}

# Decimal32/64/128(S) are fixed-precision shorthands (CH docs)
_DECIMAL_SHORTHAND = {"Decimal32": 9, "Decimal64": 18, "Decimal128": 38}

# Types this gateway REFUSES rather than silently mis-reads:
# - 128/256-bit integers exceed Spark's Decimal(38,0) range
#   (Int128 max ~1.70e38 >= 10^38); under non-ANSI mode the overflow
#   would surface as silent NULLs, breaking the module's "lossless
#   carriers" contract.  Cast to Decimal/String in the CH query.
# - AggregateFunction(...) is opaque merge state, not a value; read
#   it through finalizeAggregation()/-Merge combinators CH-side.
_REJECT = {
    "Int128": "exceeds Decimal(38,0); cast to Decimal or String in the CH query",
    "Int256": "exceeds Decimal(38,0); cast to Decimal or String in the CH query",
    "UInt128": "exceeds Decimal(38,0); cast to Decimal or String in the CH query",
    "UInt256": "exceeds Decimal(38,0); cast to Decimal or String in the CH query",
    "AggregateFunction": (
        "opaque aggregate state; apply finalizeAggregation()/"
        "the -Merge combinator in the ClickHouse query instead"
    ),
}


class UnsupportedCHType(ValueError):
    pass


def _split_args(s: str) -> list[str]:
    """Split a CH type argument list on top-level commas (quotes and
    nested parens respected)."""
    parts: list[str] = []
    depth, quote, cur = 0, None, []
    for c in s:
        if quote:
            cur.append(c)
            if c == quote:
                quote = None
            continue
        if c in "'\"":
            quote = c
            cur.append(c)
        elif c == "(":
            depth += 1
            cur.append(c)
        elif c == ")":
            depth -= 1
            cur.append(c)
        elif c == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(c)
    if cur:
        parts.append("".join(cur).strip())
    return parts


def _parse(s: str) -> tuple[str, list[str]]:
    s = s.strip()
    if "(" in s and s.endswith(")"):
        base, _, rest = s.partition("(")
        return base.strip(), _split_args(rest[:-1])
    return s, []


def ch_to_spark(ch_type: str, uint64: str = "decimal") -> tuple[T.DataType, bool]:
    """(Spark DataType, nullable) for a ClickHouse column type string.

    ``uint64``: "decimal" (default, lossless DECIMAL(20,0)) or "long"
    (two's-complement reinterpretation -- id columns only, see module
    docstring).
    """
    if uint64 not in ("decimal", "long"):
        raise ValueError(f"uint64 policy must be 'decimal' or 'long', got {uint64!r}")
    try:
        return _ch_to_spark(ch_type, uint64)
    except IndexError:
        # a parametric base with missing arguments (Nullable(),
        # Decimal32(), Map(Int8)): typed refusal, not a crash — this
        # string typically arrives from external DDL text
        raise UnsupportedCHType(
            f"malformed ClickHouse type {ch_type!r}: missing type arguments"
        ) from None


def _ch_to_spark(ch_type: str, uint64: str) -> tuple[T.DataType, bool]:
    base, args = _parse(ch_type)
    if base in _REJECT:
        raise UnsupportedCHType(f"ClickHouse type {ch_type!r}: {_REJECT[base]}")
    if base == "Nullable":
        inner, _ = ch_to_spark(args[0], uint64)
        return inner, True
    if base in ("LowCardinality", "SimpleAggregateFunction"):
        # transparent over the payload type (last arg for SAF)
        return ch_to_spark(args[-1], uint64)
    if base == "UInt64":
        return (T.LongType() if uint64 == "long" else T.DecimalType(20, 0)), False
    if base in _SIMPLE and not args:
        return _SIMPLE[base], False
    if base == "FixedString":
        return T.StringType(), False
    if base == "DateTime":  # DateTime('tz')
        return T.TimestampType(), False
    if base == "DateTime64":  # DateTime64(p[, 'tz']); p>6 truncates to micros
        return T.TimestampType(), False
    if base == "Decimal":
        p, s = int(args[0]), int(args[1])
        return T.DecimalType(p, s), False
    if base in _DECIMAL_SHORTHAND:
        return T.DecimalType(_DECIMAL_SHORTHAND[base], int(args[0])), False
    if base in ("Enum8", "Enum16"):
        return T.StringType(), False
    if base == "Array":
        el, el_null = ch_to_spark(args[0], uint64)
        return T.ArrayType(el, containsNull=el_null), False
    if base == "Map":
        k, _ = ch_to_spark(args[0], uint64)
        v, v_null = ch_to_spark(args[1], uint64)
        return T.MapType(k, v, valueContainsNull=v_null), False
    if base == "Tuple":
        fields = []
        for i, a in enumerate(args, start=1):
            # named tuple element: "name Type"
            name, _, rest = a.partition(" ")
            if rest and "(" not in name:
                ft, fn = ch_to_spark(rest, uint64)
                fields.append(T.StructField(name, ft, fn))
            else:
                ft, fn = ch_to_spark(a, uint64)
                fields.append(T.StructField(f"_{i}", ft, fn))
        return T.StructType(fields), False
    raise UnsupportedCHType(f"no Spark mapping for ClickHouse type {ch_type!r}")


def ch_schema_to_spark(
    cols: list[tuple[str, str]], uint64: str = "decimal"
) -> T.StructType:
    """StructType for a list of (column name, CH type string)."""
    out = []
    for name, ch in cols:
        dt, nullable = ch_to_spark(ch, uint64)
        out.append(T.StructField(name, dt, nullable))
    return T.StructType(out)


def spark_to_ch(dt: T.DataType, nullable: bool = False) -> str:
    """ClickHouse DDL type for a Spark type (inverse policy).  Scalar
    nullability becomes Nullable(...); composites are never Nullable
    (ClickHouse forbids it) -- element nullability recurses inward."""
    if isinstance(dt, T.ArrayType):
        return f"Array({spark_to_ch(dt.elementType, dt.containsNull)})"
    if isinstance(dt, T.MapType):
        # CH Map keys cannot be Nullable
        return (
            f"Map({spark_to_ch(dt.keyType, False)}, "
            f"{spark_to_ch(dt.valueType, dt.valueContainsNull)})"
        )
    if isinstance(dt, T.StructType):
        inner = ", ".join(
            f"{f.name} {spark_to_ch(f.dataType, f.nullable)}" for f in dt.fields
        )
        return f"Tuple({inner})"
    base = _spark_scalar_to_ch(dt)
    return f"Nullable({base})" if nullable else base


def _spark_scalar_to_ch(dt: T.DataType) -> str:
    if isinstance(dt, T.DecimalType):
        if (dt.precision, dt.scale) == (20, 0):
            return "UInt64"  # the read policy's lossless carrier, inverted
        return f"Decimal({dt.precision}, {dt.scale})"
    mapping = {
        T.ByteType: "Int8",
        T.ShortType: "Int16",
        T.IntegerType: "Int32",
        T.LongType: "Int64",
        T.FloatType: "Float32",
        T.DoubleType: "Float64",
        T.StringType: "String",
        T.BinaryType: "String",
        T.BooleanType: "Bool",
        T.DateType: "Date",
        T.TimestampType: "DateTime64(6)",
        T.TimestampNTZType: "DateTime64(6)",
    }
    for k, v in mapping.items():
        if isinstance(dt, k):
            return v
    raise UnsupportedCHType(f"no ClickHouse mapping for Spark type {dt!r}")


def create_table_types(schema: T.StructType) -> str:
    """The ``createTableColumnTypes``-style DDL fragment for a Spark
    schema headed to a ClickHouse sink: "c1 Int64, c2 Nullable(String)"."""
    return ", ".join(
        f"{f.name} {spark_to_ch(f.dataType, f.nullable)}" for f in schema.fields
    )
