"""SHACL-lite validation: Spark report == DuckDB compiled twin over a
hand graph with one planted violation per constraint kind, plus a
conformant-graph empty report and validation errors."""

import pytest

from triplestore_spark import schema as S
from triplestore_spark.operators.graph import RDFGraph
from triplestore_spark.operators.shacl import validate, validate_sql


def _duck(rows):
    import duckdb
    import pandas as pd

    con = duckdb.connect()
    con.register("triples", pd.DataFrame(rows, columns=S.TRIPLE_FIELDS))
    return con


def _spark_rows(df):
    return sorted(tuple(r) for r in df.collect())


def _duck_rows(con, sql):
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


# docs typed kg:Document; planted violations:
#  doc:1 conformant
#  doc:2 missing kg:source            -> min_count
#  doc:3 two kg:source                -> max_count
#  doc:4 nchars mistagged xsd:string  -> datatype + min_inclusive
#  doc:5 nchars negative              -> min_inclusive
#  doc:6 mentions a literal           -> node_kind + class
#  doc:7 mentions an untyped resource -> class
#  doc:8 source outside the allowlist -> in
#  doc:9 title too long               -> pattern
SHACL_HAND = [
    ("doc:1", False, "rdf:type", "res", "kg:Document", "", ""),
    ("doc:1", False, "kg:source", "res", "src:web", "", ""),
    ("doc:1", False, "kg:nchars", "lit", "120", "xsd:integer", ""),
    ("doc:1", False, "kg:mentions", "res", "e:ok", "", ""),
    ("doc:1", False, "kg:title", "lit", "short", "xsd:string", ""),
    ("doc:2", False, "rdf:type", "res", "kg:Document", "", ""),
    ("doc:2", False, "kg:nchars", "lit", "10", "xsd:integer", ""),
    ("doc:3", False, "rdf:type", "res", "kg:Document", "", ""),
    ("doc:3", False, "kg:source", "res", "src:web", "", ""),
    ("doc:3", False, "kg:source", "res", "src:feed", "", ""),
    ("doc:3", False, "kg:nchars", "lit", "5", "xsd:integer", ""),
    ("doc:4", False, "rdf:type", "res", "kg:Document", "", ""),
    ("doc:4", False, "kg:source", "res", "src:web", "", ""),
    ("doc:4", False, "kg:nchars", "lit", "77", "xsd:string", ""),
    ("doc:5", False, "rdf:type", "res", "kg:Document", "", ""),
    ("doc:5", False, "kg:source", "res", "src:web", "", ""),
    ("doc:5", False, "kg:nchars", "lit", "-3", "xsd:integer", ""),
    ("doc:6", False, "rdf:type", "res", "kg:Document", "", ""),
    ("doc:6", False, "kg:source", "res", "src:web", "", ""),
    ("doc:6", False, "kg:nchars", "lit", "8", "xsd:integer", ""),
    ("doc:6", False, "kg:mentions", "lit", "oops", "xsd:string", ""),
    ("doc:7", False, "rdf:type", "res", "kg:Document", "", ""),
    ("doc:7", False, "kg:source", "res", "src:web", "", ""),
    ("doc:7", False, "kg:nchars", "lit", "9", "xsd:integer", ""),
    ("doc:7", False, "kg:mentions", "res", "e:untyped", "", ""),
    ("doc:8", False, "rdf:type", "res", "kg:Document", "", ""),
    ("doc:8", False, "kg:source", "res", "src:shady", "", ""),
    ("doc:8", False, "kg:nchars", "lit", "4", "xsd:integer", ""),
    ("doc:9", False, "rdf:type", "res", "kg:Document", "", ""),
    ("doc:9", False, "kg:source", "res", "src:web", "", ""),
    ("doc:9", False, "kg:nchars", "lit", "6", "xsd:integer", ""),
    ("doc:9", False, "kg:title", "lit", "x" * 30, "xsd:string", ""),
    # entity typing for the class constraint
    ("e:ok", False, "rdf:type", "res", "kg:Entity", "", ""),
    # a non-Document subject: must be OUTSIDE every focus set
    ("other:1", False, "kg:source", "res", "src:shady", "", ""),
]

DOC_SHAPE = {
    "name": "DocShape",
    "target_class": "kg:Document",
    "properties": [
        {"path": "kg:source", "min_count": 1, "max_count": 1,
         "in": ["src:web", "src:feed"]},
        {"path": "kg:nchars", "datatype": "xsd:integer",
         "min_inclusive": 0, "max_inclusive": 10_000},
        {"path": "kg:mentions", "node_kind": "IRI", "class": "kg:Entity"},
        {"path": "kg:title", "pattern": "^.{1,20}$"},
    ],
}


@pytest.fixture(scope="module")
def shacl_graph(spark):
    return RDFGraph(
        spark.createDataFrame(SHACL_HAND, S.TRIPLE_SCHEMA), cache=False
    )


@pytest.fixture(scope="module")
def shacl_con():
    return _duck(SHACL_HAND)


def test_report_matches_duckdb_twin(shacl_graph, shacl_con):
    got = _spark_rows(validate(shacl_graph, [DOC_SHAPE]))
    want = _duck_rows(shacl_con, validate_sql([DOC_SHAPE]))
    assert got == want and len(got) > 0


def test_each_planted_violation_caught(shacl_graph):
    rows = validate(shacl_graph, [DOC_SHAPE]).collect()
    by = {(r["focus"], r["constraint"]) for r in rows}
    assert ("doc:2", "min_count") in by
    assert ("doc:3", "max_count") in by
    assert ("doc:4", "datatype") in by
    assert ("doc:4", "min_inclusive") in by  # mistag decodes to NULL
    assert ("doc:5", "min_inclusive") in by
    assert ("doc:6", "node_kind") in by
    assert ("doc:6", "class") in by
    assert ("doc:7", "class") in by
    assert ("doc:8", "in") in by
    assert ("doc:9", "pattern") in by
    # the conformant doc and the out-of-target subject never appear
    assert all(r["focus"] not in ("doc:1", "other:1") for r in rows)


def test_conformant_graph_empty_report(spark):
    rows = [
        ("d", False, "rdf:type", "res", "kg:Document", "", ""),
        ("d", False, "kg:source", "res", "src:web", "", ""),
        ("d", False, "kg:nchars", "lit", "1", "xsd:integer", ""),
    ]
    g = RDFGraph(spark.createDataFrame(rows, S.TRIPLE_SCHEMA), cache=False)
    assert validate(g, [DOC_SHAPE]).count() == 0
    con = _duck(rows)
    assert _duck_rows(con, validate_sql([DOC_SHAPE])) == []


def test_target_subjects_of(spark):
    """Alternative targeting: every subject of kg:source, typed or
    not — other:1 now IS in scope and violates the allowlist."""
    shape = {
        "name": "SourceShape",
        "target_subjects_of": "kg:source",
        "properties": [{"path": "kg:source", "in": ["src:web", "src:feed"]}],
    }
    g = RDFGraph(
        spark.createDataFrame(SHACL_HAND, S.TRIPLE_SCHEMA), cache=False
    )
    got = _spark_rows(validate(g, [shape]))
    assert got == _duck_rows(_duck(SHACL_HAND), validate_sql([shape]))
    assert any(r[1] == "other:1" for r in got)


def test_shape_validations(shacl_graph):
    with pytest.raises(ValueError, match="name"):
        validate(shacl_graph, [{"target_class": "kg:Document"}])
    with pytest.raises(ValueError, match="exactly one of"):
        validate(shacl_graph, [{"name": "X"}])
    with pytest.raises(ValueError, match="exactly one of"):
        validate(
            shacl_graph,
            [{"name": "X", "target_class": "a", "target_subjects_of": "b"}],
        )
    with pytest.raises(ValueError, match="needs an explicit 'datatype'"):
        validate(
            shacl_graph,
            [{"name": "X", "target_class": "kg:Document",
              "properties": [{"path": "p", "min_inclusive": 0}]}],
        )
    with pytest.raises(ValueError, match="no shapes"):
        validate(shacl_graph, [])
    with pytest.raises(ValueError, match="node_kind"):
        validate(
            shacl_graph,
            [{"name": "X", "target_class": "kg:Document",
              "properties": [{"path": "p", "node_kind": "Iri"}]}],
        )
