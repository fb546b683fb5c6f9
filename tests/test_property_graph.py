"""RDF -> property-graph projection: exact expected output on a hand
graph (multi-valued literals, bnodes, typed vertices), closure
invariants, and a DuckDB twin for the edge/label/prop relations."""

import pytest

from triplestore_spark import schema as S
from triplestore_spark.operators.graph import RDFGraph
from triplestore_spark.operators.property_graph import to_property_graph

HAND = [
    ("e:a", False, "rdf:type", "res", "kg:Engine", "", ""),
    ("e:a", False, "rdf:type", "res", "kg:Tool", "", ""),
    ("e:a", False, "kg:name", "lit", "Spark", "xsd:string", ""),
    ("e:a", False, "kg:name", "lit", "Etincelle", "", "fr"),
    ("e:a", False, "kg:year", "lit", "2014", "xsd:integer", ""),
    ("e:a", False, "kg:uses", "res", "e:b", "", ""),
    ("e:b", False, "kg:uses", "res", "e:a", "", ""),
    ("b0", True, "kg:uses", "res", "e:a", "", ""),
    ("e:a", False, "kg:draft", "bnode", "b0", "", ""),
]


@pytest.fixture(scope="module")
def hand_pg(spark):
    g = RDFGraph(spark.createDataFrame(HAND, S.TRIPLE_SCHEMA), cache=False)
    v, e = to_property_graph(g)
    return v.collect(), e.collect()


def test_edges_exact(hand_pg):
    _, e = hand_pg
    got = sorted(tuple(r) for r in e)
    assert got == [
        ("b0", "kg:uses", "e:a"),
        ("e:a", "kg:draft", "b0"),
        ("e:a", "kg:uses", "e:b"),
        ("e:b", "kg:uses", "e:a"),
    ]


def test_vertices_exact(hand_pg):
    v, _ = hand_pg
    by_id = {r["id"]: r for r in v}
    assert set(by_id) == {"e:a", "e:b", "b0"}
    a = by_id["e:a"]
    assert a["labels"] == ["kg:Engine", "kg:Tool"]
    assert dict(a["props"]) == {
        "kg:name": ["Etincelle", "Spark"],  # multi-valued, sorted
        "kg:year": ["2014"],
    }
    assert not a["is_bnode"]
    b = by_id["e:b"]
    assert b["labels"] == [] and dict(b["props"]) == {}
    bn = by_id["b0"]
    assert bn["is_bnode"] and bn["labels"] == []


def test_every_edge_endpoint_is_a_vertex(spark):
    """Closure invariant on the flagship KG: edge src/dst ⊆ vertex
    ids, and type triples never appear as edges."""
    from triplestore_spark.queries import _pipeline_canonical

    g = RDFGraph(
        _pipeline_canonical(spark, "/root/testdata/sf0.001"), cache=False
    )
    v, e = to_property_graph(g)
    ids = {r["id"] for r in v.collect()}
    erows = e.collect()
    assert erows and all(
        r["src"] in ids and r["dst"] in ids for r in erows
    )
    assert all(r["label"] != "rdf:type" for r in erows)


def test_duckdb_twin_relations(spark):
    """Edges / labels / flattened props match DuckDB aggregations over
    the same component columns."""
    import duckdb
    import pandas as pd

    con = duckdb.connect()
    con.register("t", pd.DataFrame(HAND, columns=S.TRIPLE_FIELDS))
    g = RDFGraph(spark.createDataFrame(HAND, S.TRIPLE_SCHEMA), cache=False)
    v, e = to_property_graph(g)
    got_e = sorted(tuple(r) for r in e.collect())
    want_e = sorted(
        tuple(r)
        for r in con.execute(
            "SELECT subject, predicate, object_value FROM t "
            "WHERE object_kind IN ('res','bnode') AND "
            "predicate <> 'rdf:type'"
        ).fetchall()
    )
    assert got_e == want_e
    got_props = sorted(
        (r["id"], k, tuple(vs))
        for r in v.collect()
        for k, vs in r["props"].items()
    )
    want_props = sorted(
        (s, p, tuple(vs))
        for s, p, vs in con.execute(
            "SELECT subject, predicate, "
            "list_sort(list(object_value)) FROM t "
            "WHERE object_kind = 'lit' GROUP BY subject, predicate"
        ).fetchall()
    )
    assert got_props == want_props
