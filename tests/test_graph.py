"""Source/RDFGraph semantics — mirrors reference source_test.go."""

import pytest

from triplestore_spark.dsl import resource, subj_pred
from triplestore_spark.operators.graph import RDFGraph, TripleSource


@pytest.fixture(scope="module")
def snap(spark):
    # dataset shaped like reference source_test.go:46-94
    src = TripleSource(spark)
    src.add(
        subj_pred("one", "two").integer_literal(3),
        subj_pred("one", "two").integer_literal(4),
        subj_pred("four", "two").integer_literal(42),
        subj_pred("one", "six").resource("seven"),
        subj_pred("eight", "six").resource("seven"),
    )
    return src.snapshot()


def test_count(snap):
    assert snap.count() == 5


def test_with_subject(snap):
    assert snap.with_subject("one").count() == 3
    assert snap.with_subject("missing").count() == 0


def test_with_predicate(snap):
    assert snap.with_predicate("two").count() == 3
    assert snap.with_predicate("six").count() == 2


def test_with_object(snap):
    assert snap.with_object(resource("seven")).count() == 2
    from triplestore_spark.dsl import lit_int

    assert snap.with_object(lit_int(42)).count() == 1


def test_with_subj_pred(snap):
    assert snap.with_subj_pred("one", "two").count() == 2
    assert snap.with_subj_pred("one", "six").count() == 1
    assert snap.with_subj_pred("one", "missing").count() == 0


def test_with_subj_obj(snap):
    assert snap.with_subj_obj("one", resource("seven")).count() == 1


def test_with_pred_obj(snap):
    assert snap.with_pred_obj("six", resource("seven")).count() == 2


def test_contains(snap):
    assert snap.contains(subj_pred("one", "two").integer_literal(3))
    assert not snap.contains(subj_pred("one", "two").integer_literal(5))


def test_add_dedup(spark):
    # reference source_test.go:96-117: 4 adds -> 3 triples
    src = TripleSource(spark)
    src.add(
        subj_pred("one", "two").integer_literal(3),
        subj_pred("one", "two").integer_literal(3),
        subj_pred("one", "two").integer_literal(4),
        subj_pred("four", "two").integer_literal(42),
    )
    assert src.snapshot().count() == 3


def test_remove(spark):
    src = TripleSource(spark)
    t1 = subj_pred("one", "two").integer_literal(3)
    t2 = subj_pred("one", "two").integer_literal(4)
    src.add(t1, t2)
    src.remove(t1)
    snap = src.snapshot()
    assert snap.count() == 1
    assert not snap.contains(t1)
    assert snap.contains(t2)


def test_add_after_remove_restores(spark):
    src = TripleSource(spark)
    t = subj_pred("a", "b").resource("c")
    src.add(t)
    src.remove(t)
    src.add(t)
    assert src.snapshot().contains(t)


def test_snapshot_immutability_and_memoization(spark):
    src = TripleSource(spark)
    t1 = subj_pred("one", "two").integer_literal(3)
    src.add(t1)
    snap1 = src.snapshot()
    assert src.snapshot() is snap1  # memoized while clean
    t2 = subj_pred("x", "y").resource("z")
    src.add(t2)
    snap2 = src.snapshot()
    assert snap2 is not snap1
    assert snap1.count() == 1  # old snapshot unchanged
    assert snap2.count() == 2


def test_set_equality(spark):
    a = TripleSource(spark)
    b = TripleSource(spark)
    t1 = subj_pred("one", "two").integer_literal(3)
    t2 = subj_pred("four", "five").resource("six")
    a.add(t1, t2)
    b.add(t2)
    b.add(t1)  # different batch order, same set
    assert a.snapshot().equal(b.snapshot())
    b.add(subj_pred("extra", "p").resource("o"))
    assert not a.snapshot().equal(b.snapshot())


def test_contains_batch(spark, snap):
    from triplestore_spark.dsl import triples_to_df

    probe = triples_to_df(
        spark,
        [
            subj_pred("one", "two").integer_literal(3),
            subj_pred("nope", "nope").integer_literal(0),
        ],
    )
    assert snap.contains_batch(probe).count() == 1


def test_materialized_layouts(spark, tmp_path, snap):
    from triplestore_spark.operators.materialize import (
        MaterializedGraph,
        materialize_graph,
    )

    path = str(tmp_path / "graph")
    m1 = materialize_graph(snap.df, path, num_partitions=2)
    # memoized: same fingerprint -> second call is a no-op
    m2 = materialize_graph(snap.df, path, num_partitions=2)
    assert m1["fingerprint"] == m2["fingerprint"]

    g = MaterializedGraph(spark, path)
    assert g.count() == 5
    assert g.with_subject("one").count() == 3
    assert g.with_predicate("two").count() == 3
    assert g.with_object(resource("seven")).count() == 2
    assert g.with_subj_pred("one", "six").count() == 1
    assert g.with_pred_obj("six", resource("seven")).count() == 2
    assert g.contains(subj_pred("four", "two").integer_literal(42))
    # equal to the in-memory snapshot
    assert g.equal(snap)


def test_snapshot_at_time_travel(spark):
    """snapshot_at(n) reconstructs the graph after the first n ops of
    the log: 0 = empty, len = snapshot(), removes respected mid-log,
    and later ops don't leak backwards."""
    import pytest

    src = TripleSource(spark)
    t1 = subj_pred("one", "two").integer_literal(3)
    t2 = subj_pred("one", "two").integer_literal(4)
    t3 = subj_pred("four", "two").integer_literal(42)
    src.add(t1, t2)   # op 0
    src.remove(t1)    # op 1
    src.add(t3)       # op 2
    assert len(src) == 3
    assert src.snapshot_at(0).count() == 0
    g1 = src.snapshot_at(1)
    assert g1.count() == 2 and g1.contains(t1) and g1.contains(t2)
    g2 = src.snapshot_at(2)
    assert g2.count() == 1 and not g2.contains(t1)
    g3 = src.snapshot_at(3)
    assert g3.count() == 2 and g3.contains(t3)
    assert g3.equal(src.snapshot())
    with pytest.raises(ValueError, match="n_ops"):
        src.snapshot_at(4)
    with pytest.raises(ValueError, match="n_ops"):
        src.snapshot_at(-1)
