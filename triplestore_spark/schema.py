"""Canonical schemas for the engine.

The triple schema is the flat-column realization of the reference's
row model (reference rdf.go:27-32, rdf.go:84-88, rdf.go:135-138):
flat string columns beat a nested struct for Parquet column pruning,
min/max skipping and sort layouts.

Conventions (important for Catalyst `concat` behavior, which returns
NULL on any NULL input): `object_type` and `object_lang` are always
non-null, '' meaning "absent". `object_kind` is one of 'res' | 'lit'
| 'bnode'.
"""

from pyspark.sql import types as T

# object kinds
KIND_RESOURCE = "res"
KIND_LITERAL = "lit"
KIND_BNODE = "bnode"

# The 11 XSD type tags of the reference type system (reference types.go:8-33).
# Stored verbatim as open strings — custom datatypes are allowed
# (reference ntparser_test.go:59-64 parses "2"^^<myinteger>).
XSD_STRING = "xsd:string"
XSD_BOOLEAN = "xsd:boolean"
XSD_DATETIME = "xsd:dateTime"
XSD_DOUBLE = "xsd:double"
XSD_FLOAT = "xsd:float"
XSD_INTEGER = "xsd:integer"
XSD_BYTE = "xsd:byte"
XSD_SHORT = "xsd:short"
XSD_UINTEGER = "xsd:unsignedInt"
XSD_UNSIGNED_BYTE = "xsd:unsignedByte"
XSD_UNSIGNED_SHORT = "xsd:unsignedShort"

XML_SCHEMA_NAMESPACE = "http://www.w3.org/2001/XMLSchema"

TRIPLE_FIELDS = [
    "subject",
    "subject_is_bnode",
    "predicate",
    "object_kind",
    "object_value",
    "object_type",
    "object_lang",
]

TRIPLE_SCHEMA = T.StructType(
    [
        T.StructField("subject", T.StringType(), False),
        T.StructField("subject_is_bnode", T.BooleanType(), False),
        T.StructField("predicate", T.StringType(), False),
        T.StructField("object_kind", T.StringType(), False),
        T.StructField("object_value", T.StringType(), False),
        T.StructField("object_type", T.StringType(), False),
        T.StructField("object_lang", T.StringType(), False),
    ]
)

# Triple schema with the derived identity keys appended (okey per
# reference rdf.go:102-113, tkey per reference rdf.go:46-58).
TRIPLE_SCHEMA_KEYED = T.StructType(
    TRIPLE_SCHEMA.fields
    + [
        T.StructField("okey", T.StringType(), False),
        T.StructField("tkey", T.StringType(), False),
    ]
)

# Pipeline input: interleaved text + media documents
# (BASELINE.json input_hint).
SPAN_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("offset", T.IntegerType(), False),
    ]
)

DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN_SCHEMA, False), False),
    ]
)
