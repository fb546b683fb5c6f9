from triplestore_spark.operators.bgp import (
    bgp_construct,
    bgp_match,
    bgp_match_sql,
    parse_bgp,
    parse_node_key,
    property_path,
    strip_node_key,
)
from triplestore_spark.operators.graph import RDFGraph, TripleSource

__all__ = [
    "RDFGraph",
    "TripleSource",
    "bgp_construct",
    "bgp_match",
    "bgp_match_sql",
    "parse_bgp",
    "parse_node_key",
    "property_path",
    "strip_node_key",
]
