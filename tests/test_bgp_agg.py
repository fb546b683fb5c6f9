"""SPARQL aggregation + UNION over BGP bindings: Spark==DuckDB
differentials (operators/bgp_agg vs its generated SQL twins), same
evidence pattern as test_bgp.py."""

import random

import pytest

from triplestore_spark import schema as S
from triplestore_spark.operators.bgp_agg import (
    bgp_select,
    bgp_select_sql,
    bgp_union,
    bgp_union_sql,
)
from triplestore_spark.operators.graph import RDFGraph


def _duck(rows):
    import duckdb
    import pandas as pd

    con = duckdb.connect()
    con.register("triples", pd.DataFrame(rows, columns=S.TRIPLE_FIELDS))
    return con


def _none_last(t):
    # UNION arms NULL-pad unbound variables; None < str is a TypeError
    return tuple((x is None, x) for x in t)


def _spark_rows(df):
    return sorted((tuple(r) for r in df.collect()), key=_none_last)


def _duck_rows(con, sql):
    return sorted(
        (tuple(r) for r in con.execute(sql).fetchall()), key=_none_last
    )


# docs mention entities; docs carry typed nchars literals (one doc has
# a WRONG tag to exercise decode-NULL); one lang literal; one bnode
AGG_HAND = [
    ("doc:1", False, "kg:mentions", "res", "e:spark", "", ""),
    ("doc:1", False, "kg:mentions", "res", "e:duck", "", ""),
    ("doc:1", False, "kg:nchars", "lit", "120", "xsd:integer", ""),
    ("doc:2", False, "kg:mentions", "res", "e:spark", "", ""),
    ("doc:2", False, "kg:nchars", "lit", "80", "xsd:integer", ""),
    ("doc:3", False, "kg:mentions", "res", "e:duck", "", ""),
    ("doc:3", False, "kg:mentions", "res", "e:flink", "", ""),
    ("doc:3", False, "kg:mentions", "res", "e:spark", "", ""),
    # wrong tag: decodes to NULL under xsd:integer aggregates
    ("doc:3", False, "kg:nchars", "lit", "999", "xsd:string", ""),
    ("doc:4", False, "kg:mentions", "res", "e:spark", "", ""),
    ("doc:4", False, "kg:nchars", "lit", "40", "xsd:integer", ""),
    ("doc:4", False, "kg:lang", "lit", "fr", "", "fr"),
    ("e:spark", False, "rdf:type", "res", "kg:Engine", "", ""),
    ("e:duck", False, "rdf:type", "res", "kg:Engine", "", ""),
    ("e:flink", False, "rdf:type", "res", "kg:Stream", "", ""),
    ("b0", True, "kg:mentions", "res", "e:duck", "", ""),
]


@pytest.fixture(scope="module")
def agg_graph(spark):
    return RDFGraph(
        spark.createDataFrame(AGG_HAND, S.TRIPLE_SCHEMA), cache=False
    )


@pytest.fixture(scope="module")
def agg_con():
    return _duck(AGG_HAND)


MENTIONS = [("?d", "kg:mentions", "?e")]
MENTIONS_NCHARS = [
    ("?d", "kg:mentions", "?e"),
    ("?d", "kg:nchars", "?n"),
]


def test_count_per_group(agg_graph, agg_con):
    """COUNT(*) per ?d over the mention multiset — and the exact
    expected values, bag semantics (doc:3 has 3 mentions)."""
    spec = dict(group_by=["?d"], aggregates={"n": ("count", "*")})
    got = _spark_rows(bgp_select(agg_graph, MENTIONS, **spec))
    assert got == [
        ("<doc:1>", 2),
        ("<doc:2>", 1),
        ("<doc:3>", 3),
        ("<doc:4>", 1),
        ("_:b0", 1),
    ]
    assert got == _duck_rows(agg_con, bgp_select_sql(MENTIONS, **spec))


def test_typed_sum_min_max_avg(agg_graph, agg_con):
    """Typed aggregates decode the literal; the xsd:string-tagged 999
    decodes to NULL and is excluded (SPARQL error-as-unbound)."""
    spec = dict(
        aggregates={
            "total": ("sum", "?n", "xsd:integer"),
            "lo": ("min", "?n", "xsd:integer"),
            "hi": ("max", "?n", "xsd:integer"),
            "mean": ("avg", "?n", "xsd:integer"),
            "rows": ("count", "*"),
        }
    )
    pats = [("?d", "kg:nchars", "?n")]
    got = _spark_rows(bgp_select(agg_graph, pats, **spec))
    assert got == [(240, 40, 120, 80.0, 4)]
    assert got == _duck_rows(agg_con, bgp_select_sql(pats, **spec))


def test_having_order_limit(agg_graph, agg_con):
    """HAVING over the aggregate, ORDER BY desc, LIMIT — top-1 doc by
    mention count."""
    spec = dict(
        group_by=["?d"],
        aggregates={"n": ("count", "*")},
        having=[("n", ">=", 2)],
        order_by=[("n", "desc"), ("?d", "asc")],
        limit=1,
    )
    got = [tuple(r) for r in bgp_select(agg_graph, MENTIONS, **spec).collect()]
    assert got == [("<doc:3>", 3)]
    assert got == [
        tuple(r)
        for r in agg_con.execute(
            bgp_select_sql(MENTIONS, **spec)
        ).fetchall()
    ]


def test_count_distinct_sample_group_concat(agg_graph, agg_con):
    spec = dict(
        group_by=["?e"],
        aggregates={
            "docs": ("count_distinct", "?d"),
            "one": ("sample", "?d"),
            "all": ("group_concat", "?d", "|"),
        },
        order_by=["?e"],
    )
    got = [tuple(r) for r in bgp_select(agg_graph, MENTIONS, **spec).collect()]
    assert got == [
        ("<e:duck>", 3, "<doc:1>", "<doc:1>|<doc:3>|_:b0"),
        ("<e:flink>", 1, "<doc:3>", "<doc:3>"),
        ("<e:spark>", 4, "<doc:1>", "<doc:1>|<doc:2>|<doc:3>|<doc:4>"),
    ]
    assert got == [
        tuple(r)
        for r in agg_con.execute(bgp_select_sql(MENTIONS, **spec)).fetchall()
    ]


def test_group_by_without_aggregates_is_distinct(agg_graph, agg_con):
    spec = dict(group_by=["?e"])
    got = _spark_rows(bgp_select(agg_graph, MENTIONS, **spec))
    assert got == [("<e:duck>",), ("<e:flink>",), ("<e:spark>",)]
    assert got == _duck_rows(agg_con, bgp_select_sql(MENTIONS, **spec))


def test_modifiers_without_aggregation(agg_graph, agg_con):
    """order_by+limit over a plain (distinct) BGP — SELECT modifiers
    alone, routed through the same front."""
    spec = dict(order_by=[("?d", "desc")], limit=3)
    pats = [("?d", "kg:nchars", "?n")]
    got = [
        tuple(r) for r in bgp_select(agg_graph, pats, **spec).collect()
    ]
    assert [r[0] for r in got] == ["<doc:4>", "<doc:3>", "<doc:2>"]
    assert got == [
        tuple(r)
        for r in agg_con.execute(bgp_select_sql(pats, **spec)).fetchall()
    ]


def test_agg_over_two_pattern_bindings(agg_graph, agg_con):
    """Aggregation over a JOINed BGP: per-doc mention count weighted
    by the join with nchars (bag semantics on the joined multiset)."""
    spec = dict(
        group_by=["?d"],
        aggregates={
            "n": ("count", "*"),
            "chars": ("max", "?n", "xsd:integer"),
        },
    )
    got = _spark_rows(bgp_select(agg_graph, MENTIONS_NCHARS, **spec))
    assert got == _duck_rows(
        agg_con, bgp_select_sql(MENTIONS_NCHARS, **spec)
    )
    # doc:3's nchars is mistagged -> max decodes NULL, count still 3
    assert ("<doc:3>", 3, None) in got


def test_agg_with_optional_counts_nulls_out(agg_graph, agg_con):
    """COUNT(?n) over an OPTIONAL binding counts only matched rows —
    the null-skipping COUNT(var) vs COUNT(*) distinction."""
    spec = dict(
        group_by=["?d"],
        aggregates={"with_n": ("count", "?n"), "rows": ("count", "*")},
        optional=[[("?d", "kg:nchars", "?n")]],
    )
    got = _spark_rows(bgp_select(agg_graph, MENTIONS, **spec))
    assert got == _duck_rows(agg_con, bgp_select_sql(MENTIONS, **spec))
    assert ("_:b0", 0, 1) in got


def test_select_validations(agg_graph):
    with pytest.raises(ValueError, match="needs an xsd type"):
        bgp_select(
            agg_graph, MENTIONS, aggregates={"s": ("sum", "?e")}
        )
    with pytest.raises(ValueError, match="unknown function"):
        bgp_select(
            agg_graph, MENTIONS, aggregates={"s": ("median", "?e")}
        )
    with pytest.raises(ValueError, match="not an aggregate"):
        bgp_select(
            agg_graph,
            MENTIONS,
            group_by=["?d"],
            aggregates={"n": ("count", "*")},
            having=[("m", ">", 1)],
        )
    with pytest.raises(ValueError, match="bad direction"):
        bgp_select(agg_graph, MENTIONS, order_by=[("?d", "sideways")])
    with pytest.raises(ValueError, match="not an aggregate"):
        bgp_select_sql(
            MENTIONS,
            group_by=["?d"],
            aggregates={"n": ("count", "*")},
            having=[("m", ">", 1)],
        )


def test_union_null_pads_missing_vars(agg_graph, agg_con):
    """UNION arms bind different variables; each arm NULL-pads the
    other's — and distinct dedupes across arms."""
    groups = [
        [("?x", "rdf:type", "kg:Engine")],
        [("?x", "kg:mentions", "?e"), ("?e", "rdf:type", "kg:Stream")],
    ]
    got = _spark_rows(bgp_union(agg_graph, groups))
    assert got == _duck_rows(agg_con, bgp_union_sql(groups))
    assert ("<e:duck>", None) in got
    assert ("<doc:3>", "<e:flink>") in got


def test_union_arm_joins_vars_projected(spark, agg_graph):
    """A joins= DataFrame in a union arm can bind variables no triple
    pattern mentions; those columns must appear in the union output
    (NULL-padded in other arms), not be silently dropped
    (ADVICE r6, low)."""
    side = spark.createDataFrame(
        [("<doc:1>", "alpha"), ("<doc:2>", "beta")], ["d", "tag"]
    )
    groups = [
        {"patterns": [("?d", "kg:mentions", "?e")], "joins": [side]},
        [("?d", "kg:nchars", "?n")],
    ]
    out = bgp_union(agg_graph, groups)
    assert "tag" in out.columns
    got = _spark_rows(out)
    assert any(t[out.columns.index("tag")] == "alpha" for t in got)
    # arm 2 NULL-pads tag
    assert any(t[out.columns.index("tag")] is None for t in got)


def test_union_bag_vs_set(agg_graph, agg_con):
    """The same arm twice: set mode collapses, bag mode doubles."""
    groups = [MENTIONS, MENTIONS]
    set_rows = _spark_rows(bgp_union(agg_graph, groups, distinct=True))
    bag_rows = _spark_rows(bgp_union(agg_graph, groups, distinct=False))
    assert len(bag_rows) == 2 * len(set_rows)
    assert set_rows == _duck_rows(
        agg_con, bgp_union_sql(groups, distinct=True)
    )
    assert bag_rows == _duck_rows(
        agg_con, bgp_union_sql(groups, distinct=False)
    )


def _obj_fr():
    from triplestore_spark.dsl import Obj

    return Obj(S.KIND_LITERAL, "fr", lang="fr")


def test_union_arm_with_anti(agg_graph, agg_con):
    """Arms carry their own anti group; the SQL twin mirrors it."""
    groups = [
        {
            "patterns": [("?d", "kg:mentions", "?e")],
            "anti": [[("?d", "kg:nchars", "?k")]],
        },
        [("?d", "kg:lang", _obj_fr())],
    ]
    got = _spark_rows(bgp_union(agg_graph, groups))
    assert got == _duck_rows(agg_con, bgp_union_sql(groups))
    # only b0 lacks kg:nchars, so arm 1 contributes just the bnode
    # row; arm 2 binds ?d alone and NULL-pads ?e
    assert all(r[0] == "_:b0" or r[1] is None for r in got)


def test_union_sql_refuses_arm_filters(agg_graph):
    groups = [
        {
            "patterns": [("?d", "kg:nchars", "?n")],
            "filters": [("?n", ">", 50, "xsd:integer")],
        }
    ]
    # Spark side accepts arm filters ...
    assert bgp_union(agg_graph, groups).columns == ["d", "n"]
    # ... the SQL twin refuses rather than silently dropping them
    with pytest.raises(ValueError, match="filters have no SQL twin"):
        bgp_union_sql(groups)


def test_union_validations(agg_graph):
    with pytest.raises(ValueError, match="no arms"):
        bgp_union(agg_graph, [])
    with pytest.raises(ValueError, match="patterns"):
        bgp_union(agg_graph, [{"anti": []}])


def test_front_door_routing(agg_graph):
    """RDFGraph.query with SELECT kwargs == bgp_select directly;
    RDFGraph.union == bgp_union."""
    spec = dict(group_by=["?d"], aggregates={"n": ("count", "*")})
    a = _spark_rows(agg_graph.query(MENTIONS, **spec))
    b = _spark_rows(bgp_select(agg_graph, MENTIONS, **spec))
    assert a == b and len(a) > 0
    groups = [MENTIONS, [("?d", "kg:nchars", "?v")]]
    c = _spark_rows(agg_graph.union(groups))
    d = _spark_rows(bgp_union(agg_graph, groups))
    assert c == d and len(c) > 0


def _rand_graph(rng, n_docs=8, n_ents=4):
    rows = []
    for d in range(n_docs):
        for e in range(n_ents):
            if rng.random() < 0.45:
                rows.append(
                    (f"doc:{d}", False, "kg:mentions", "res",
                     f"e:{e}", "", "")
                )
        if rng.random() < 0.7:
            rows.append(
                (f"doc:{d}", False, "kg:nchars", "lit",
                 str(rng.randrange(1, 500)),
                 "xsd:integer" if rng.random() < 0.8 else "xsd:string",
                 "")
            )
    rows.append(("doc:0", False, "kg:mentions", "res", "e:0", "", ""))
    return rows


def test_randomized_differential(spark):
    """Random graphs x random agg specs: Spark == DuckDB on every
    draw (seeded, 5 rounds)."""
    rng = random.Random(20260818)
    for round_i in range(5):
        rows = _rand_graph(rng)
        g = RDFGraph(
            spark.createDataFrame(rows, S.TRIPLE_SCHEMA), cache=False
        )
        con = _duck(rows)
        spec = dict(
            group_by=["?d"],
            aggregates={
                "n": ("count", "*"),
                "ents": ("count_distinct", "?e"),
                "cat": ("group_concat", "?e", ","),
            },
        )
        got = _spark_rows(bgp_select(g, MENTIONS, **spec))
        want = _duck_rows(con, bgp_select_sql(MENTIONS, **spec))
        assert got == want, f"round {round_i} mismatch"
        spec2 = dict(
            group_by=["?d"],
            aggregates={"hi": ("max", "?n", "xsd:integer")},
            optional=[[("?d", "kg:nchars", "?n")]],
        )
        got2 = _spark_rows(bgp_select(g, MENTIONS, **spec2))
        want2 = _duck_rows(con, bgp_select_sql(MENTIONS, **spec2))
        assert got2 == want2, f"round {round_i} typed mismatch"


def test_typed_order_by_topk(agg_graph, agg_con):
    """Typed ORDER BY + LIMIT: the top-k is chosen by the DECODED
    integer (lexicographic order would rank '80' above '120'); a
    wrong-tag key decodes NULL and sorts last under desc. Pinned
    expected rows AND the DuckDB twin."""
    spec = dict(
        patterns=[
            ("?d", "kg:mentions", "?e"),
            ("?d", "kg:nchars", "?n"),
        ],
        group_by=["?d"],
        aggregates={"mentions": ("count", "*"),
                    "n1": ("sample", "?n")},
        order_by=[("n1", "desc", "xsd:integer"), "?d"],
        limit=2,
    )
    got = [tuple(r) for r in bgp_select(agg_graph, **spec).collect()]
    # 120 > 80 numerically (lexicographically '120' < '80')
    assert [r[0] for r in got] == ["<doc:1>", "<doc:2>"]
    want = [
        tuple(r)
        for r in agg_con.execute(
            bgp_select_sql(table="triples", **spec)
        ).fetchall()
    ]
    assert got == want
    with pytest.raises(ValueError, match="direction"):
        bgp_select(
            agg_graph, spec["patterns"], order_by=[("?d", "sideways")]
        )


# -- aggregation over UNION --------------------------------------------


def test_union_aggregation_differential(agg_graph, agg_con):
    """GROUP BY + aggregates over the unioned solution MULTISET (bag
    union feeding one hash aggregation) == the generated DuckDB twin,
    including typed sums that decode-NULL the wrong-tagged literal."""
    groups = [
        [("?d", "kg:mentions", "?e"), ("?e", "rdf:type", "kg:Engine")],
        [("?d", "kg:mentions", "?e"), ("?e", "rdf:type", "kg:Stream")],
    ]
    spec = dict(
        group_by=["?e"],
        aggregates={
            "n_docs": ("count", "?d"),
            "n_distinct": ("count_distinct", "?d"),
        },
        order_by=["?e"],
    )
    got = _spark_rows(bgp_union(agg_graph, groups, **spec))
    assert got == _duck_rows(agg_con, bgp_union_sql(groups, **spec))
    assert ("<e:spark>", 4, 4) in got
    # bag semantics: duplicating an arm doubles every count
    got2 = _spark_rows(bgp_union(agg_graph, groups + groups, **spec))
    assert ("<e:spark>", 8, 4) in got2


def test_union_aggregation_typed_sum_and_having(agg_graph, agg_con):
    groups = [
        [("?d", "kg:mentions", "?e"), ("?d", "kg:nchars", "?n")],
        [("?d", "kg:lang", "?l"), ("?d", "kg:nchars", "?n")],
    ]
    spec = dict(
        group_by=["?d"],
        aggregates={"tot": ("sum", "?n", "xsd:integer")},
        having=[("tot", ">", 50)],
        order_by=["?d"],
    )
    got = _spark_rows(bgp_union(agg_graph, groups, **spec))
    assert got == _duck_rows(agg_con, bgp_union_sql(groups, **spec))
    # doc:4 appears in BOTH arms (40 + 40 = 80 > 50): bag semantics
    assert ("<doc:4>", 80) in got
    # doc:3's nchars literal is wrong-tagged -> decodes NULL -> no row
    assert not any(r[0] == "<doc:3>" for r in got)


def test_union_aggregation_validations(agg_graph):
    with pytest.raises(ValueError, match="having requires aggregates"):
        bgp_union(agg_graph, [MENTIONS], having=[("n", ">", 1)])
    with pytest.raises(ValueError, match="having requires aggregates"):
        bgp_union_sql([MENTIONS], having=[("n", ">", 1)])
