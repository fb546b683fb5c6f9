"""Struct melt — mirrors reference struct_test.go shapes."""

from triplestore_spark.dsl import Obj
from triplestore_spark.operators.struct_melt import triples_from_mapping


def keyset(triples):
    return {t.tkey() for t in triples}


def test_flat_mapping_melt():
    # struct_test.go basic shape: one triple per tagged field
    out = triples_from_mapping(
        "me", {"name": "donald", "age": 32, "size": 186.0, "male": True}
    )
    assert keyset(out) == {
        '<me><name>"donald"^^<xsd:string>',
        '<me><age>"32"^^<xsd:integer>',
        '<me><size>"186"^^<xsd:double>',
        '<me><male>"true"^^<xsd:boolean>',
    }


def test_slice_field_one_triple_per_element():
    # struct_test.go:124-129: []string -> one triple per element
    out = triples_from_mapping("me", {"nick": ["donald", "donie", "don"]})
    assert keyset(out) == {
        '<me><nick>"donald"^^<xsd:string>',
        '<me><nick>"donie"^^<xsd:string>',
        '<me><nick>"don"^^<xsd:string>',
    }


def test_embedded_mapping_becomes_bnode():
    # struct_test.go:109-141: embedded struct with named bnode
    out = triples_from_mapping(
        "me", {"address": {"@bnode": "addr1", "city": "Paris", "zip": 75015}}
    )
    assert keyset(out) == {
        "<me><address>_:addr1",
        '_:addr1<city>"Paris"^^<xsd:string>',
        '_:addr1<zip>"75015"^^<xsd:integer>',
    }


def test_unnamed_bnode_deterministic():
    # reference uses rand.Uint32 (struct.go:61); we substitute a
    # content hash — shape identical, names reproducible
    a = triples_from_mapping("me", {"address": {"city": "Paris"}})
    b = triples_from_mapping("me", {"address": {"city": "Paris"}})
    assert keyset(a) == keyset(b)
    assert len(a) == 2


def test_none_skipped():
    # nil-pointer fields are skipped (struct.go:47-50)
    out = triples_from_mapping("me", {"name": "x", "ghost": None})
    assert len(out) == 1


def test_obj_passthrough():
    out = triples_from_mapping("me", {"knows": Obj("res", "you")})
    assert keyset(out) == {"<me><knows><you>"}


def test_melt_df_spark(spark):
    from pyspark.sql import functions as F

    from triplestore_spark.operators.struct_melt import MeltField, melt_df

    df = spark.createDataFrame(
        [(1, "a", ["x", "y"]), (2, "b", ["z"])], "id long, name string, tags array<string>"
    )
    out = melt_df(
        df,
        F.concat(F.lit("row:"), F.col("id")),
        [
            MeltField("kg:name", F.col("name"), typ="xsd:string"),
            MeltField(
                "kg:tag", F.col("tags"), typ="xsd:string", explode_array=True
            ),
        ],
    )
    rows = {
        (r["subject"], r["predicate"], r["object_value"])
        for r in out.collect()
    }
    assert rows == {
        ("row:1", "kg:name", "a"),
        ("row:1", "kg:tag", "x"),
        ("row:1", "kg:tag", "y"),
        ("row:2", "kg:name", "b"),
        ("row:2", "kg:tag", "z"),
    }
