"""BGP matching + property paths: Spark==DuckDB differentials.

The DataFrame plan (operators/bgp.bgp_match) and the generated ANSI
self-join SQL (bgp_match_sql) are structurally independent renderings
of the same semantics; DuckDB executes the SQL as the oracle, exactly
the redact_pii / dedup_lines_corpus evidence pattern.
"""

import random

import pytest

from triplestore_spark import schema as S
from triplestore_spark.dsl import Obj
from triplestore_spark.operators.bgp import (
    bgp_match,
    bgp_match_sql,
    property_path,
    strip_node_key,
)
from triplestore_spark.operators.graph import RDFGraph


def _duck(rows):
    import duckdb
    import pandas as pd

    con = duckdb.connect()
    con.register(
        "triples", pd.DataFrame(rows, columns=S.TRIPLE_FIELDS)
    )
    return con


def _spark_rows(df):
    return sorted(tuple(r) for r in df.collect())


def _duck_rows(con, sql):
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


# -- hand graph: docs mention entities, entities typed, one bnode ----

HAND = [
    ("doc:1", False, "kg:mentions", "res", "e:spark", "", ""),
    ("doc:1", False, "kg:source", "res", "src:web", "", ""),
    ("doc:2", False, "kg:mentions", "res", "e:spark", "", ""),
    ("doc:2", False, "kg:mentions", "res", "e:duck", "", ""),
    ("doc:2", False, "kg:source", "res", "src:book", "", ""),
    ("doc:3", False, "kg:mentions", "res", "e:duck", "", ""),
    ("e:spark", False, "rdf:type", "res", "kg:Engine", "", ""),
    ("e:duck", False, "rdf:type", "res", "kg:Engine", "", ""),
    ("e:spark", False, "kg:name", "lit", "Spark", "xsd:string", ""),
    ("e:spark", False, "kg:name", "lit", "Etincelle", "", "fr"),
    ("b0", True, "kg:mentions", "res", "e:spark", "", ""),
    ("b0", True, "rdf:type", "res", "kg:Draft", "", ""),
]


@pytest.fixture(scope="module")
def hand_graph(spark):
    return RDFGraph(
        spark.createDataFrame(HAND, S.TRIPLE_SCHEMA), cache=False
    )


def test_bgp_two_hop_join(hand_graph):
    """?d mentions ?e . ?e rdf:type kg:Engine — the canonical
    conjunctive query; exact expected set plus the DuckDB twin."""
    pats = [
        ("?d", "kg:mentions", "?e"),
        ("?e", "rdf:type", "kg:Engine"),
    ]
    got = _spark_rows(bgp_match(hand_graph, pats))
    assert got == [
        ("<doc:1>", "<e:spark>"),
        ("<doc:2>", "<e:duck>"),
        ("<doc:2>", "<e:spark>"),
        ("<doc:3>", "<e:duck>"),
        ("_:b0", "<e:spark>"),
    ]
    con = _duck(HAND)
    assert got == _duck_rows(con, bgp_match_sql(pats))


def test_bgp_object_literal_and_lang_identity(hand_graph):
    """Literal constants: typed literal matches on (value, type); a
    lang-tagged constant ignores the datatype (okey identity rule)."""
    got = _spark_rows(
        bgp_match(
            hand_graph,
            [("?e", "kg:name", Obj("lit", "Spark", "xsd:string", ""))],
        )
    )
    assert got == [("<e:spark>",)]
    # lang-tagged: type omitted from identity
    got = _spark_rows(
        bgp_match(
            hand_graph,
            [("?e", "kg:name", Obj("lit", "Etincelle", "IGNORED", "fr"))],
        )
    )
    assert got == [("<e:spark>",)]


def test_bgp_predicate_variable_and_gate(hand_graph):
    """Predicate variable enumerates edges; a constant-only pattern is
    an existence gate (present -> no-op, absent -> empty)."""
    pats = [("doc:2", "?p", "?o")]
    got = _spark_rows(bgp_match(hand_graph, pats))
    con = _duck(HAND)
    assert got == _duck_rows(con, bgp_match_sql(pats))
    assert ("<kg:mentions>", "<e:duck>") in got

    present = [
        ("?d", "kg:mentions", "?e"),
        ("e:spark", "rdf:type", "kg:Engine"),
    ]
    absent = [
        ("?d", "kg:mentions", "?e"),
        ("e:spark", "rdf:type", "kg:Banana"),
    ]
    base = _spark_rows(bgp_match(hand_graph, [("?d", "kg:mentions", "?e")]))
    assert _spark_rows(bgp_match(hand_graph, present)) == base
    assert _spark_rows(bgp_match(hand_graph, absent)) == []
    assert base == _duck_rows(con, bgp_match_sql(present))
    assert [] == _duck_rows(con, bgp_match_sql(absent))


def test_bgp_disconnected_refused(hand_graph):
    pats = [("?a", "kg:mentions", "?b"), ("?x", "rdf:type", "?y")]
    with pytest.raises(ValueError, match="cartesian"):
        bgp_match(hand_graph, pats)
    prod = bgp_match(hand_graph, pats, allow_product=True)
    n_mentions = 5  # 4 doc mentions + bnode mention
    n_types = 3
    assert prod.count() == n_mentions * n_types


def test_strip_node_key(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("<e:spark>",), ("_:b0",), ('"Spark"^^<xsd:string>',)], "k string"
    )
    got = [r[0] for r in df.select(strip_node_key("k")).collect()]
    assert got == ["e:spark", "b0", '"Spark"^^<xsd:string>']


def _random_rows(seed, n=400):
    """Dense little graph: resource objects reuse the subject id space
    so multi-hop joins actually hit; literals/bnodes mixed in."""
    rng = random.Random(seed)
    rows = []
    for _ in range(n):
        if rng.random() < 0.15:
            subj, isb = f"b{rng.randrange(6)}", True
        else:
            subj, isb = f"e{rng.randrange(12)}", False
        pred = f"p{rng.randrange(4)}"
        r = rng.random()
        if r < 0.55:
            obj = ("res", f"e{rng.randrange(12)}", "", "")
        elif r < 0.7:
            obj = ("bnode", f"b{rng.randrange(6)}", "", "")
        elif r < 0.85:
            obj = ("lit", f"w{rng.randrange(8)}", "xsd:string", "")
        else:
            obj = ("lit", f"w{rng.randrange(8)}", "", "en")
        rows.append((subj, isb, pred) + obj)
    return sorted(set(rows))


PATTERN_SETS = [
    [("?x", "p0", "?y"), ("?y", "p1", "?z")],  # chain (obj->subj join)
    [("?x", "p0", "?y"), ("?x", "p1", "?z")],  # star
    [("?x", "?p", "?y")],  # predicate variable
    [("?x", "p2", Obj("lit", "w3", "xsd:string", ""))],  # literal const
    [("?x", "p0", "?x")],  # intra-pattern repeated var (self-loop)
    [
        ("?x", "p0", "?y"),
        ("?y", "p1", "?z"),
        ("?z", "p2", "?w"),
        ("?x", "p3", "?w"),  # cycle: two shared vars at the last join
    ],
]


@pytest.mark.parametrize("seed", [7, 23])
def test_bgp_randomized_differential(spark, seed):
    rows = _random_rows(seed)
    g = spark.createDataFrame(rows, S.TRIPLE_SCHEMA)
    con = _duck(rows)
    sizes = []
    for pats in PATTERN_SETS:
        for distinct in (True, False):
            a = _spark_rows(bgp_match(g, pats, distinct=distinct))
            b = _duck_rows(con, bgp_match_sql(pats, distinct=distinct))
            assert a == b, (pats, distinct)
        sizes.append(len(a))
    # chain, star, pred-var and the 4-pattern cycle must be non-vacuous
    assert sizes[0] > 0 and sizes[1] > 0 and sizes[2] > 0 and sizes[5] > 0


def test_property_path_differential(spark):
    rows = _random_rows(11)
    g = spark.createDataFrame(rows, S.TRIPLE_SCHEMA)
    con = _duck(rows)
    got = _spark_rows(property_path(g, ["p0", "p1"]))
    sql = bgp_match_sql(
        [("?src", "p0", "?h0"), ("?h0", "p1", "?dst")], distinct=False
    )
    want = _duck_rows(con, f"SELECT DISTINCT src, dst FROM ({sql})")
    assert got == want and len(got) > 0
    # pinned start: subset of the unpinned result with that src
    some_src = next(s for s, _ in want if s.startswith("<"))
    pinned = _spark_rows(
        property_path(g, ["p0", "p1"], start=some_src[1:-1])
    )
    assert pinned == sorted({(d,) for s, d in want if s == some_src})


def test_property_path_one_hop_matches_tree_edges(hand_graph):
    """1-hop path over a resource predicate == the Tree edge view
    (modulo node-key rendering)."""
    from triplestore_spark.operators.tree import Tree

    edges = sorted(
        (f"<{r['parent']}>", f"<{r['child']}>")
        for r in Tree(hand_graph, "rdf:type").edges().collect()
        if True
    )
    # tree edges include the bnode subject rendered raw; re-render
    edges = sorted(
        (
            ("_:" + p[1:-1]) if p == "<b0>" else p,
            c,
        )
        for p, c in edges
    )
    got = _spark_rows(property_path(hand_graph, ["rdf:type"]))
    assert got == edges


def test_bgp_pushdown_on_parquet_layout(spark, tmp_path):
    """A constant-subject pattern over a parquet-backed layout reaches
    the scan as a PushedFilter — the WithX lookups' scale contract
    extends to BGP scans."""
    path = str(tmp_path / "triples")
    spark.createDataFrame(HAND, S.TRIPLE_SCHEMA).write.parquet(path)
    g = spark.read.parquet(path)
    df = bgp_match(g, [("doc:2", "kg:mentions", "?e")])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters")[1][:200]
    assert "subject" in pushed and "predicate" in pushed
