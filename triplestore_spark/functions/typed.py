"""Typed views over literal columns (reference dsl.go:144-174 ParseX).

The reference parses lexical forms into native values with a strict
type check ('literal is not an X but Y'). Column equivalent:
`parse_typed_col(value, typ, expected)` returns the cast value where
the datatype tag matches and NULL where it doesn't;
`strict_parse_typed(df, ...)` raises on mismatches like the Go API.

Casts run JVM-side; xsd:dateTime uses to_timestamp on the RFC3339
lexical form (session timezone is UTC).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from triplestore_spark import schema as S

# expected tag -> spark cast type
_CASTS = {
    S.XSD_BOOLEAN: "boolean",
    S.XSD_INTEGER: "long",
    S.XSD_BYTE: "tinyint",
    S.XSD_SHORT: "smallint",
    S.XSD_UINTEGER: "long",
    S.XSD_UNSIGNED_BYTE: "smallint",
    S.XSD_UNSIGNED_SHORT: "int",
    S.XSD_DOUBLE: "double",
    S.XSD_FLOAT: "float",
    S.XSD_STRING: "string",
}


def parse_typed_col(
    value: Column | str,
    typ: Column | str,
    expected: str,
) -> Column:
    """Typed view: cast `value` where `typ == expected`, NULL
    elsewhere. The NT parser stores tags verbatim, so the long
    XMLSchema form of the same type is accepted too."""
    value = F.col(value) if isinstance(value, str) else value
    typ = F.col(typ) if isinstance(typ, str) else typ
    long_form = expected
    if expected.startswith("xsd:"):
        long_form = f"{S.XML_SCHEMA_NAMESPACE}#{expected[4:]}"
    matches = (typ == expected) | (typ == long_form)
    if expected == S.XSD_DATETIME:
        return F.when(matches, F.to_timestamp(value))
    cast_to = _CASTS.get(expected)
    if cast_to is None:
        raise ValueError(f"unknown literal type: {expected}")
    return F.when(matches, value.cast(cast_to))


def strict_parse_typed(df: DataFrame, expected: str) -> DataFrame:
    """Go-strict variant over a triple DataFrame: raises when any
    literal row carries a different tag (reference error text
    'literal is not an X but Y')."""
    bad = (
        df.where(F.col("object_kind") == S.KIND_LITERAL)
        .where(F.col("object_type") != expected)
        .select("object_type")
        .first()
    )
    if bad is not None:
        raise ValueError(
            f"literal is not an {expected} but {bad['object_type']}"
        )
    return df.withColumn(
        "typed_value",
        parse_typed_col(F.col("object_value"), F.col("object_type"), expected),
    )
