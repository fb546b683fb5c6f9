"""owl:sameAs canonicalization (operators/sameas.py): exact hand
cases, a DuckDB recursive-CTE differential on seeded random
equivalence graphs, and the operator invariants (idempotence,
class-count conservation, no dangling aliases)."""

import random

import pytest
from pyspark.sql import functions as F

from triplestore_spark import schema as S
from triplestore_spark.operators.graph import RDFGraph
from triplestore_spark.operators.sameas import (
    equivalence_classes,
    merge_equivalents,
)

HAND = [
    ("e:a", False, "kg:name", "lit", "A", "xsd:string", ""),
    ("e:b", False, "kg:name", "lit", "B", "xsd:string", ""),
    ("e:c", False, "kg:pop", "lit", "5", "xsd:integer", ""),
    ("doc:1", False, "kg:mentions", "res", "e:b", "", ""),
    ("doc:1", False, "kg:mentions", "res", "e:x", "", ""),
    ("e:a", False, "owl:sameAs", "res", "e:b", "", ""),
    ("e:b", False, "owl:sameAs", "res", "e:c", "", ""),   # chain a=b=c
    ("z0", True, "owl:sameAs", "res", "e:x", "", ""),     # bnode = IRI
    ("z0", True, "kg:name", "lit", "X", "xsd:string", ""),
]


def _rows(df):
    return sorted(tuple(r) for r in df.select(*S.TRIPLE_FIELDS).collect())


def test_merge_hand_case(spark):
    df = spark.createDataFrame(HAND, S.TRIPLE_SCHEMA)
    cls = sorted(tuple(r) for r in equivalence_classes(df).collect())
    # component minimum is the representative; '<' < '_' so IRIs win
    # over bnodes inside a mixed class
    assert cls == [
        ("<e:b>", "<e:a>"), ("<e:c>", "<e:a>"), ("_:z0", "<e:x>")
    ]
    out = _rows(merge_equivalents(df))
    assert out == [
        ("doc:1", False, "kg:mentions", "res", "e:a", "", ""),
        ("doc:1", False, "kg:mentions", "res", "e:x", "", ""),
        ("e:a", False, "kg:name", "lit", "A", "xsd:string", ""),
        ("e:a", False, "kg:name", "lit", "B", "xsd:string", ""),
        ("e:a", False, "kg:pop", "lit", "5", "xsd:integer", ""),
        ("e:x", False, "kg:name", "lit", "X", "xsd:string", ""),
    ]


def test_merge_idempotent_and_front_door(spark):
    df = spark.createDataFrame(HAND, S.TRIPLE_SCHEMA)
    g1 = RDFGraph(df, cache=False).merge_equivalents()
    g2 = g1.merge_equivalents()
    assert _rows(g1.df) == _rows(g2.df)
    # no alias survives as a subject or object
    merged = set()
    for r in _rows(g1.df):
        merged.add(r[0])
        if r[3] != "lit":
            merged.add(r[4])
    assert not {"e:b", "e:c", "z0"} & merged


def test_merge_keep_links(spark):
    df = spark.createDataFrame(HAND, S.TRIPLE_SCHEMA)
    out = _rows(merge_equivalents(df, keep_links=True))
    # rewritten links collapse to reflexive rep->rep and are dropped;
    # nothing else references owl:sameAs
    assert not any(r[2] == "owl:sameAs" for r in out)


def test_merge_literal_object_refused(spark):
    rows = HAND + [("e:a", False, "owl:sameAs", "lit", "A", "", "")]
    df = spark.createDataFrame(rows, S.TRIPLE_SCHEMA)
    with pytest.raises(ValueError, match="literal"):
        merge_equivalents(df)


def _random_kg(seed, n_entities=40, n_facts=150, n_links=25):
    """Random facts + random equivalence links (chains, stars, and
    cross-links arise naturally)."""
    rng = random.Random(seed)
    rows = []
    for _ in range(n_facts):
        s = f"e{rng.randrange(n_entities)}"
        kind = rng.choice(["res", "lit"])
        if kind == "res":
            rows.append(
                (s, False, f"p{rng.randrange(4)}", "res",
                 f"e{rng.randrange(n_entities)}", "", "")
            )
        else:
            rows.append(
                (s, False, f"p{rng.randrange(4)}", "lit",
                 f"v{rng.randrange(10)}", "xsd:string", "")
            )
    for _ in range(n_links):
        a, b = rng.randrange(n_entities), rng.randrange(n_entities)
        if a != b:
            rows.append(
                (f"e{a}", False, "owl:sameAs", "res", f"e{b}", "", "")
            )
    return rows


def _duck_merged(rows):
    """Independent oracle: recursive-CTE reachability gives each node
    its component-min key; facts rewrite through it and dedup."""
    import duckdb
    import pandas as pd

    con = duckdb.connect()
    con.register("triples", pd.DataFrame(rows, columns=S.TRIPLE_FIELDS))
    sql = """
    WITH RECURSIVE
    e AS (
      SELECT subject AS a, object_value AS b FROM triples
      WHERE predicate = 'owl:sameAs'
    ),
    u AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
    reach(n, m) AS (
      SELECT a, a FROM u UNION SELECT b, b FROM u
      UNION
      SELECT r.n, u.b FROM reach r JOIN u ON r.m = u.a
    ),
    -- min over NODE KEYS, matching the engine ('<e10>' < '<e1>'
    -- because '0' < '>'; raw-name order would disagree)
    rep AS (
      SELECT n,
             SUBSTRING(MIN('<' || m || '>'),
                       2, LENGTH(MIN('<' || m || '>')) - 2) AS rep
      FROM reach GROUP BY n
    )
    SELECT DISTINCT
      COALESCE(rs.rep, t.subject) AS subject,
      t.subject_is_bnode, t.predicate, t.object_kind,
      CASE WHEN t.object_kind = 'res'
           THEN COALESCE(ro.rep, t.object_value)
           ELSE t.object_value END AS object_value,
      t.object_type, t.object_lang
    FROM triples t
    LEFT JOIN rep rs ON t.subject = rs.n
    LEFT JOIN rep ro ON t.object_kind = 'res' AND t.object_value = ro.n
    WHERE t.predicate <> 'owl:sameAs'
    """
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


@pytest.mark.parametrize("seed", [7, 19, 43])
def test_merge_differential_vs_recursive_cte(spark, seed):
    """IRI-only random graphs: Spark star-CC merge == DuckDB
    recursive-CTE reachability merge (component-min NODE KEY as the
    representative on both sides)."""
    rows = _random_kg(seed)
    df = spark.createDataFrame(rows, S.TRIPLE_SCHEMA)
    got = _rows(merge_equivalents(df))
    want = _duck_merged(rows)
    assert got == want
    assert len(got) > 0
    # the merge is a contraction: never more rows than the input facts
    n_facts = sum(1 for r in rows if r[2] != "owl:sameAs")
    assert len(got) <= n_facts
