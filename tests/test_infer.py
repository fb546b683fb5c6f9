"""RDFS-lite inference (operators/infer.py) vs DuckDB recursive-CTE
oracles, on a hand ontology (chain + diamond + cycle) and seeded
random schema/data graphs. The expansion must be one BROADCAST join —
plan-asserted — because the schema side is closed driver-side."""

import random

import pytest

from triplestore_spark import schema as S
from triplestore_spark.operators.infer import (
    rdfs_expand_properties,
    rdfs_expand_types,
)

# chain: C1 < C2 < C3; diamond: D < L, D < R, L < T, R < T;
# cycle: X < Y, Y < X (members are mutual subclasses)
HAND = [
    ("c:C1", False, "rdfs:subClassOf", "res", "c:C2", "", ""),
    ("c:C2", False, "rdfs:subClassOf", "res", "c:C3", "", ""),
    ("c:D", False, "rdfs:subClassOf", "res", "c:L", "", ""),
    ("c:D", False, "rdfs:subClassOf", "res", "c:R", "", ""),
    ("c:L", False, "rdfs:subClassOf", "res", "c:T", "", ""),
    ("c:R", False, "rdfs:subClassOf", "res", "c:T", "", ""),
    ("c:X", False, "rdfs:subClassOf", "res", "c:Y", "", ""),
    ("c:Y", False, "rdfs:subClassOf", "res", "c:X", "", ""),
    ("i:a", False, "rdf:type", "res", "c:C1", "", ""),
    ("i:b", False, "rdf:type", "res", "c:D", "", ""),
    ("i:c", False, "rdf:type", "res", "c:X", "", ""),
    ("i:d", False, "rdf:type", "res", "c:T", "", ""),
    ("i:a", False, "kg:name", "lit", "a", "xsd:string", ""),
]

_CLOSURE_CTE = """
WITH RECURSIVE closure(cls, supercls) AS (
  SELECT subject, object_value FROM triples
  WHERE predicate = '{pred}' AND object_kind = 'res'
    AND NOT subject_is_bnode
  UNION
  SELECT c.cls, t.object_value FROM closure c
  JOIN triples t ON t.subject = c.supercls
  WHERE t.predicate = '{pred}' AND t.object_kind = 'res'
    AND NOT t.subject_is_bnode
)
"""

_TYPE_ORACLE = _CLOSURE_CTE.format(pred="rdfs:subClassOf") + """
SELECT DISTINCT subject, predicate, object_value FROM (
  SELECT subject, predicate, object_value FROM triples
  UNION ALL
  SELECT t.subject, 'rdf:type', c.supercls
  FROM triples t JOIN closure c ON t.object_value = c.cls
  WHERE t.predicate = 'rdf:type' AND t.object_kind = 'res'
)
"""

_PROP_ORACLE = _CLOSURE_CTE.format(pred="rdfs:subPropertyOf") + """
SELECT DISTINCT subject, predicate, object_value FROM (
  SELECT subject, predicate, object_value FROM triples
  UNION ALL
  SELECT t.subject, c.supercls, t.object_value
  FROM triples t JOIN closure c ON t.predicate = c.cls
)
"""


def _duck(rows):
    import duckdb
    import pandas as pd

    con = duckdb.connect()
    con.register("triples", pd.DataFrame(rows, columns=S.TRIPLE_FIELDS))
    return con


def _norm(df):
    return sorted(
        (r["subject"], r["predicate"], r["object_value"])
        for r in df.select("subject", "predicate", "object_value").collect()
    )


def test_rdfs_types_hand_graph(spark):
    g = spark.createDataFrame(HAND, S.TRIPLE_SCHEMA)
    got = _norm(rdfs_expand_types(g))
    want = sorted(map(tuple, _duck(HAND).execute(_TYPE_ORACLE).fetchall()))
    assert got == want
    trip = set(got)
    assert ("i:a", "rdf:type", "c:C3") in trip          # chain, 2 hops
    assert ("i:b", "rdf:type", "c:T") in trip           # diamond join
    assert ("i:c", "rdf:type", "c:Y") in trip           # cycle member
    assert ("i:c", "rdf:type", "c:X") in trip           # asserted kept
    assert ("i:d", "rdf:type", "c:C3") not in trip      # no cross-talk


def test_rdfs_types_expansion_is_broadcast(spark):
    g = spark.createDataFrame(HAND, S.TRIPLE_SCHEMA)
    plan = (
        rdfs_expand_types(g)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


@pytest.mark.parametrize("seed", [3, 19])
def test_rdfs_randomized_differential(spark, seed):
    """Random DAG-ish schema (incl. planted cycles) over random typed
    individuals: Spark == DuckDB recursive CTE for both rules."""
    rng = random.Random(seed)
    rows = []
    for _ in range(25):
        a, b = rng.randrange(12), rng.randrange(12)
        rows.append(
            (f"c:{a}", False, "rdfs:subClassOf", "res", f"c:{b}", "", "")
        )
        p, q = rng.randrange(6), rng.randrange(6)
        rows.append(
            (f"p:{p}", False, "rdfs:subPropertyOf", "res", f"p:{q}", "", "")
        )
    for i in range(120):
        rows.append(
            (f"i:{i}", False, "rdf:type", "res",
             f"c:{rng.randrange(12)}", "", "")
        )
        rows.append(
            (f"i:{i}", False, f"p:{rng.randrange(6)}", "res",
             f"i:{rng.randrange(120)}", "", "")
        )
    rows = sorted(set(rows))
    g = spark.createDataFrame(rows, S.TRIPLE_SCHEMA)
    con = _duck(rows)
    assert _norm(rdfs_expand_types(g)) == sorted(
        map(tuple, con.execute(_TYPE_ORACLE).fetchall())
    )
    assert _norm(rdfs_expand_properties(g)) == sorted(
        map(tuple, con.execute(_PROP_ORACLE).fetchall())
    )


def test_schema_guard_refuses_oversized(spark):
    rows = [
        (f"c:{i}", False, "rdfs:subClassOf", "res", f"c:{i+1}", "", "")
        for i in range(40)
    ]
    g = spark.createDataFrame(rows, S.TRIPLE_SCHEMA)
    with pytest.raises(ValueError, match="max_schema_edges"):
        rdfs_expand_types(g, max_schema_edges=10)


def test_closure_pair_cap_refuses_quadratic_blowup(spark, monkeypatch):
    """ADVICE r5: the edge-count guard alone admits a deep chain whose
    closure is quadratic in edges — the PAIR cap must trip before the
    driver builds it."""
    from triplestore_spark.operators import infer as I

    monkeypatch.setattr(I, "_MAX_CLOSURE_PAIRS", 50)
    rows = [
        (f"c:{i}", False, "rdfs:subClassOf", "res", f"c:{i+1}", "", "")
        for i in range(20)  # chain of 20 edges -> 210 closure pairs
    ]
    g = spark.createDataFrame(rows, S.TRIPLE_SCHEMA)
    with pytest.raises(ValueError, match="pairs"):
        rdfs_expand_types(g)
