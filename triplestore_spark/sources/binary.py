"""Binary triple codec.

Wire format (reference encode.go:100-142, decode.go:150-239):

    bool  isSubBnode            (1 byte, 0/1)
    u32be len + subject bytes
    u32be len + predicate bytes
    u8    objType: 0=resource 1=literal 2=bnode 3=literal+lang
    [u32be len + (datatype | langtag) bytes]   (absent for res/bnode)
    u32be len + value bytes

String-typed literal values are escaped on encode and unescaped on
decode (encode.go:124-128, decode.go:210-214); lang literals decode
with an empty datatype tag (decode.go:192-198) — identity is
unaffected since lang keys omit the type.

Spark integration: decode reads `binaryFile` rows and cursor-decodes
each blob inside `mapInPandas` (one file -> many triples); encode
produces a BinaryType column per triple via mapInPandas, with a
driver-side concatenator for golden tests and a per-partition file
sink for scale.
"""

from __future__ import annotations

import struct
from typing import Iterator, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from triplestore_spark import schema as S
from triplestore_spark.functions.keys import with_keys
from triplestore_spark.sources.ntriples import (
    escape_string_literal,
    unescape_string_literal,
)

RESOURCE_TAG = 0
LITERAL_TAG = 1
BNODE_TAG = 2
LITERAL_LANG_TAG = 3


def encode_triple_bytes(row: tuple) -> bytes:
    sub, is_bnode, pred, kind, value, typ, lang = row
    out = bytearray()
    out.append(1 if is_bnode else 0)
    sb = sub.encode("utf-8")
    out += struct.pack(">I", len(sb)) + sb
    pb = pred.encode("utf-8")
    out += struct.pack(">I", len(pb)) + pb
    if kind == S.KIND_LITERAL:
        if lang:
            out.append(LITERAL_LANG_TAG)
            lb = lang.encode("utf-8")
            out += struct.pack(">I", len(lb)) + lb
        else:
            out.append(LITERAL_TAG)
            tb = typ.encode("utf-8")
            out += struct.pack(">I", len(tb)) + tb
        v = escape_string_literal(value) if typ == S.XSD_STRING else value
        vb = v.encode("utf-8")
        out += struct.pack(">I", len(vb)) + vb
    elif kind == S.KIND_BNODE:
        out.append(BNODE_TAG)
        vb = value.encode("utf-8")
        out += struct.pack(">I", len(vb)) + vb
    else:
        out.append(RESOURCE_TAG)
        vb = value.encode("utf-8")
        out += struct.pack(">I", len(vb)) + vb
    return bytes(out)


class BinaryDecodeError(ValueError):
    pass


def decode_binary_bytes(blob: bytes) -> list[tuple]:
    """Decode a whole binary document into TRIPLE_FIELDS tuples."""
    out = []
    pos = 0
    n = len(blob)

    def word():
        nonlocal pos
        if pos + 4 > n:
            raise BinaryDecodeError("truncated word length")
        (ln,) = struct.unpack_from(">I", blob, pos)
        pos += 4
        if pos + ln > n:
            raise BinaryDecodeError(f"cannot decode word of length {ln}")
        w = blob[pos : pos + ln].decode("utf-8")
        pos += ln
        return w

    while pos < n:
        is_bnode = blob[pos] != 0
        pos += 1
        sub = word()
        pred = word()
        if pos >= n:
            raise BinaryDecodeError("truncated object type")
        obj_type = blob[pos]
        pos += 1
        if obj_type == RESOURCE_TAG:
            out.append((sub, is_bnode, pred, S.KIND_RESOURCE, word(), "", ""))
        elif obj_type == BNODE_TAG:
            out.append((sub, is_bnode, pred, S.KIND_BNODE, word(), "", ""))
        elif obj_type == LITERAL_LANG_TAG:
            lang = word()
            val = unescape_string_literal(word())
            # decoded lang literal keeps an empty datatype
            # (reference decode.go:192-198)
            out.append((sub, is_bnode, pred, S.KIND_LITERAL, val, "", lang))
        elif obj_type == LITERAL_TAG:
            typ = word()
            val = word()
            if typ == S.XSD_STRING:
                val = unescape_string_literal(val)
            out.append((sub, is_bnode, pred, S.KIND_LITERAL, val, typ, ""))
        else:
            raise BinaryDecodeError(f"unknown object tag {obj_type}")
    return out


def read_binary(spark: SparkSession, path: str) -> DataFrame:
    """binaryFile scan -> per-file cursor decode in Arrow batches.

    Parallelism cap: the wire format is a self-delimiting byte stream
    with no sync markers (reference encode.go:100-142), so a file can
    only be cursor-decoded start-to-end — binaryFile gives one task
    per file and one 1 TB file would be one task. This matches the
    reference's one-goroutine-per-reader model (decode.go:241-295);
    at scale, shard binary datasets into many files (the CLI and the
    encode sink already write per-partition files)."""
    files = spark.read.format("binaryFile").load(path)
    return decode_binary_blobs_df(files, col="content")


def decode_binary_blobs_df(df: DataFrame, col: str = "bin") -> DataFrame:
    """Decode a BinaryType column of binary-codec documents (one or
    many triples per blob) into keyed triples — the DataFrame-to-
    DataFrame round-trip counterpart of read_binary (reference
    decode.go:150-225), used by the bin_roundtrip gate."""

    def _decode(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            rows = []
            for blob in pdf[col]:
                rows.extend(decode_binary_bytes(bytes(blob)))
            yield pd.DataFrame(rows, columns=S.TRIPLE_FIELDS)

    return with_keys(df.select(col).mapInPandas(_decode, schema=S.TRIPLE_SCHEMA))


def encode_binary_df(df: DataFrame) -> DataFrame:
    """Triples -> one BinaryType blob per triple."""

    def _encode(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            blobs = [
                encode_triple_bytes(row)
                for row in zip(
                    pdf["subject"],
                    pdf["subject_is_bnode"],
                    pdf["predicate"],
                    pdf["object_kind"],
                    pdf["object_value"],
                    pdf["object_type"],
                    pdf["object_lang"],
                )
            ]
            yield pd.DataFrame({"bin": blobs})

    out_schema = T.StructType([T.StructField("bin", T.BinaryType())])
    return df.select(*S.TRIPLE_FIELDS).mapInPandas(_encode, out_schema)


def encode_binary_triples(df: DataFrame) -> bytes:
    """Driver-side concatenated binary document (golden tests / CLI),
    sorted by tkey descending for determinism."""
    from pyspark.sql import functions as F

    rows = (
        with_keys(df.select(*S.TRIPLE_FIELDS))
        .orderBy(F.desc("tkey"))
        .select(*S.TRIPLE_FIELDS)
        .collect()
    )
    return b"".join(encode_triple_bytes(tuple(r)) for r in rows)


def is_nt_format(head: bytes) -> bool:
    """Format auto-detection: first byte '<' => NTriples
    (reference decode.go:40-47)."""
    return head[:1] == b"<"


def read_auto(spark: SparkSession, path: str) -> DataFrame:
    """Auto-dispatch decode per file head byte (reference decode.go:29-35).

    Reads each file once via binaryFile; NT files are split into lines
    inside the decode UDF.
    """
    files = spark.read.format("binaryFile").load(path).select("content")

    def _decode(it: Iterator) -> Iterator:
        import pandas as pd

        from triplestore_spark.sources.ntriples import parse_nt_text

        for pdf in it:
            rows = []
            for blob in pdf["content"]:
                blob = bytes(blob)
                if is_nt_format(blob):
                    rows.extend(parse_nt_text(blob.decode("utf-8")))
                else:
                    rows.extend(decode_binary_bytes(blob))
            yield pd.DataFrame(rows, columns=S.TRIPLE_FIELDS)

    return with_keys(files.mapInPandas(_decode, schema=S.TRIPLE_SCHEMA))
