"""VoID statistics (operators/stats.py) vs an independent DuckDB
twin and pure-Python sets."""

import duckdb
import pytest

from triplestore_spark import schema as S
from triplestore_spark.dsl import (
    Obj,
    Triple,
    lit_int,
    lit_string,
    triples_to_df,
)
from triplestore_spark.operators.stats import (
    class_partition,
    property_partition,
    void_summary,
)

ROWS = [
    Triple("e:a", "rdf:type", Obj(S.KIND_RESOURCE, "e:Doc")),
    Triple("e:a", "rdf:type", Obj(S.KIND_RESOURCE, "e:Doc")),  # dup triple
    Triple("e:a", "rdf:type", Obj(S.KIND_RESOURCE, "e:Thing")),
    Triple("e:b", "rdf:type", Obj(S.KIND_RESOURCE, "e:Doc")),
    Triple("e:a", "kg:title", lit_string("hello")),
    Triple("e:b", "kg:title", lit_string("hello")),  # same okey
    Triple("e:b", "kg:words", lit_int(5)),
    Triple("e:c", "kg:ref", Obj(S.KIND_BNODE, "x")),
    # full-IRI type spelling counts too
    Triple(
        "e:d",
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
        Obj(S.KIND_RESOURCE, "e:Doc"),
    ),
    # a literal object of rdf:type is NOT a class
    Triple("e:e", "rdf:type", lit_string("notaclass")),
]


@pytest.fixture()
def g(spark):
    return triples_to_df(spark, ROWS)


def _duck(rows):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t(s VARCHAR, p VARCHAR, okey VARCHAR, "
        "kind VARCHAR, oval VARCHAR)"
    )
    for t in rows:
        con.execute(
            "INSERT INTO t VALUES (?, ?, ?, ?, ?)",
            [t.subject, t.predicate, t.obj.okey(), t.obj.kind, t.obj.value],
        )
    return con


def test_void_summary_exact(g):
    [row] = void_summary(g).collect()
    con = _duck(ROWS)
    want = con.execute(
        "SELECT count(*), count(DISTINCT s), count(DISTINCT p), "
        "count(DISTINCT okey), count(DISTINCT CASE WHEN p IN "
        "('rdf:type', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type')"
        " AND kind = 'res' THEN oval END) FROM t"
    ).fetchone()
    assert (
        row["n_triples"],
        row["n_subjects"],
        row["n_predicates"],
        row["n_objects"],
        row["n_classes"],
    ) == want
    assert row["n_classes"] == 2  # e:Doc, e:Thing


def test_void_summary_approx_runs(g):
    [row] = void_summary(g, exact=False).collect()
    # HLL on 10 rows is exact in practice; assert sane bounds anyway
    assert row["n_triples"] == len(ROWS)
    assert 0 < row["n_subjects"] <= len(ROWS)


def test_property_partition(g):
    got = {
        r["predicate"]: (r["n_triples"], r["n_subjects"], r["n_objects"])
        for r in property_partition(g).collect()
    }
    con = _duck(ROWS)
    want = {
        p: (n, s, o)
        for p, n, s, o in con.execute(
            "SELECT p, count(*), count(DISTINCT s), count(DISTINCT okey) "
            "FROM t GROUP BY p"
        ).fetchall()
    }
    assert got == want
    assert got["kg:title"] == (2, 2, 1)  # same literal okey


def test_class_partition_dedups_entities(g):
    got = {r["cls"]: r["n_entities"] for r in class_partition(g).collect()}
    # e:a's duplicate (a, type, Doc) counts once; literal object ignored
    assert got == {"e:Doc": 3, "e:Thing": 1}
