"""Canonical key goldens — the identity contract.

The 16 expected tkey strings are ported from the reference's
TestTripleKey (reference rdf_test.go:46-71) plus the equality matrix
(rdf_test.go:7-44). Everything downstream (dedup, Contains, set
equality, P/R) depends on these being byte-exact.
"""

import pytest

from triplestore_spark.dsl import bnode_pred, subj_pred

KEY_GOLDENS = [
    (subj_pred("", "").resource(""), "<><><>"),
    (subj_pred("", "").string_literal(""), '<><>""^^<xsd:string>'),
    (subj_pred("sub", "pred").resource("Bonobo"), "<sub><pred><Bonobo>"),
    (subj_pred("su<b", "pr>ed").resource("Bonobo"), "<su<b><pr>ed><Bonobo>"),
    (
        subj_pred("sub", "pred").string_literal("Bonobo"),
        '<sub><pred>"Bonobo"^^<xsd:string>',
    ),
    (
        subj_pred("sub", "pred").boolean_literal(True),
        '<sub><pred>"true"^^<xsd:boolean>',
    ),
    (
        subj_pred("sub", "pred").string_literal("true"),
        '<sub><pred>"true"^^<xsd:string>',
    ),
    (subj_pred("sub", "pred").integer_literal(42), '<sub><pred>"42"^^<xsd:integer>'),
    (subj_pred("sub", "pred").string_literal("42"), '<sub><pred>"42"^^<xsd:string>'),
    (bnode_pred("", "").resource(""), "_:<><>"),
    (bnode_pred("", "").string_literal(""), '_:<>""^^<xsd:string>'),
    (bnode_pred("sub", "pred").resource("Bonobo"), "_:sub<pred><Bonobo>"),
    (subj_pred("", "").bnode(""), "<><>_:"),
    (subj_pred("", "").bnode("any"), "<><>_:any"),
    (
        subj_pred("sub", "pred").string_literal_with_lang("obj", "en"),
        '<sub><pred>"obj"@en',
    ),
]


@pytest.mark.parametrize("triple,expected", KEY_GOLDENS)
def test_triple_key_goldens(triple, expected):
    assert triple.tkey() == expected


EQUALITY_CASES = [
    (subj_pred("", "").resource(""), subj_pred("", "").resource(""), True),
    (
        subj_pred("sub", "pred").resource("Bonobo"),
        subj_pred("sub", "pred").resource("Bonobo"),
        True,
    ),
    (
        subj_pred("sub", "pred").resource("Bonobo"),
        subj_pred("sub", "pred").resource("Banaba"),
        False,
    ),
    (
        subj_pred("sub", "pred").resource("Bonobo"),
        subj_pred("sub", "newpred").resource("Bonobo"),
        False,
    ),
    (
        subj_pred("sub", "pred").resource("Bonobo"),
        subj_pred("newsub", "pred").resource("Bonobo"),
        False,
    ),
    (
        subj_pred("sub", "pred").string_literal("Bonobo"),
        subj_pred("sub", "pred").string_literal("Bonobo"),
        True,
    ),
    (
        subj_pred("sub", "pred").boolean_literal(True),
        subj_pred("sub", "pred").boolean_literal(True),
        True,
    ),
    (
        subj_pred("sub", "pred").integer_literal(42),
        subj_pred("sub", "pred").integer_literal(42),
        True,
    ),
    (subj_pred("", "").string_literal(""), subj_pred("", "").string_literal(""), True),
    (
        subj_pred("sub", "pred").resource("Bonobo"),
        subj_pred("sub", "pred").string_literal("Bonobo"),
        False,
    ),
    (
        subj_pred("sub", "pred").string_literal("true"),
        subj_pred("sub", "pred").boolean_literal(True),
        False,
    ),
    (
        subj_pred("sub", "pred").string_literal("2"),
        subj_pred("sub", "pred").integer_literal(2),
        False,
    ),
    (
        subj_pred("sub", "pred").string_literal_with_lang("obj", "en"),
        subj_pred("sub", "pred").string_literal_with_lang("obj", "fr"),
        False,
    ),
    (
        subj_pred("sub", "pred").string_literal_with_lang("obj", "en"),
        subj_pred("sub", "pred").string_literal_with_lang("obj", "en"),
        True,
    ),
]


@pytest.mark.parametrize("one,other,expected", EQUALITY_CASES)
def test_equality(one, other, expected):
    assert one.equal(other) is expected
    assert other.equal(one) is expected


def test_catalyst_keys_match_python_mirror(spark):
    """The Catalyst tkey/okey expressions must agree byte-for-byte
    with the driver-side mirror on every golden."""
    from triplestore_spark.dsl import triples_to_df

    triples = [t for t, _ in KEY_GOLDENS]
    df = triples_to_df(spark, triples)
    got = {r["tkey"] for r in df.select("tkey").collect()}
    want = {exp for _, exp in KEY_GOLDENS}
    assert got == want
