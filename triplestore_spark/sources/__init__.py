from triplestore_spark.sources.ntriples import (
    parse_nt_line,
    parse_nt_text,
    read_ntriples,
    nt_encode_expr,
    encode_triples,
)
from triplestore_spark.sources.binary import (
    encode_binary_triples,
    decode_binary_bytes,
    read_binary,
)

__all__ = [
    "parse_nt_line",
    "parse_nt_text",
    "read_ntriples",
    "nt_encode_expr",
    "encode_triples",
    "encode_binary_triples",
    "decode_binary_bytes",
    "read_binary",
]
