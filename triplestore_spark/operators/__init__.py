from triplestore_spark.operators.bgp import (
    PathExpr,
    bgp_construct,
    bgp_match,
    bgp_match_sql,
    compile_binding_filter,
    parse_bgp,
    parse_node_key,
    property_path,
    property_path_sql,
    strip_node_key,
)
from triplestore_spark.operators.graph import RDFGraph, TripleSource
from triplestore_spark.operators.sparql import (
    SparqlParseError,
    parse_sparql,
    parse_sparql_update,
    sparql_query,
    sparql_update,
)

__all__ = [
    "PathExpr",
    "RDFGraph",
    "TripleSource",
    "bgp_construct",
    "compile_binding_filter",
    "property_path_sql",
    "bgp_match",
    "bgp_match_sql",
    "parse_bgp",
    "parse_node_key",
    "property_path",
    "strip_node_key",
    "SparqlParseError",
    "parse_sparql",
    "parse_sparql_update",
    "sparql_query",
    "sparql_update",
]
