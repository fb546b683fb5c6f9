"""Layered neighborhood sampling: Spark == DuckDB exact-row
differentials (the twin ranks with the SAME md5 expression, so both
engines must draw the SAME sample), fanout/invariant checks, and the
rank-limited-window plan assertion (hub safety)."""

import random

import pytest

from triplestore_spark.operators.graph_sample import (
    sample_neighborhoods,
    sample_neighborhoods_sql,
)


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _duck_rows(pairs, sql):
    import duckdb
    import pandas as pd

    con = duckdb.connect()
    con.register("edges", pd.DataFrame(pairs, columns=["src", "dst"]))
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


def _spark_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_sample_differential_random_graphs(spark):
    """Seeded G(n,p) digraphs x fanout shapes x salts: exact row-set
    equality between engines on every draw."""
    rng = random.Random(20260818)
    for round_i in range(3):
        pairs = sorted(
            {
                (f"v{rng.randrange(20)}", f"v{rng.randrange(20)}")
                for _ in range(90)
            }
        )
        pairs = [(a, b) for a, b in pairs if a != b]
        seeds = sorted({f"v{rng.randrange(20)}" for _ in range(3)})
        fanouts = rng.choice([[2], [3, 2], [2, 2, 1]])
        salt = str(round_i)
        got = _spark_rows(
            sample_neighborhoods(
                _edges_df(spark, pairs), seeds, fanouts, salt=salt
            )
        )
        want = _duck_rows(
            pairs, sample_neighborhoods_sql(seeds, fanouts, salt=salt)
        )
        assert got == want and len(got) > 0, (round_i, fanouts)


def test_sample_fanout_and_frontier_invariants(spark):
    """Per (seed, layer, src) at most fanout dsts; layer i+1 srcs are
    exactly layer i's sampled dsts; layer 0 srcs are the seeds."""
    rng = random.Random(7)
    pairs = sorted(
        {
            (f"v{rng.randrange(12)}", f"v{rng.randrange(12)}")
            for _ in range(70)
        }
    )
    pairs = [(a, b) for a, b in pairs if a != b]
    fanouts = [3, 2]
    out = sample_neighborhoods(
        _edges_df(spark, pairs), ["v0", "v1"], fanouts
    ).collect()
    by_layer: dict[int, list] = {}
    for r in out:
        by_layer.setdefault(r["layer"], []).append(r)
    for layer, rows in by_layer.items():
        counts: dict[tuple, int] = {}
        for r in rows:
            k = (r["seed"], r["src"])
            counts[k] = counts.get(k, 0) + 1
        assert max(counts.values()) <= fanouts[layer], layer
    assert {r["src"] for r in by_layer[0]} <= {"v0", "v1"}
    if 1 in by_layer:
        l0_dst = {(r["seed"], r["dst"]) for r in by_layer[0]}
        l1_src = {(r["seed"], r["src"]) for r in by_layer[1]}
        assert l1_src <= l0_dst


def test_sample_deterministic_and_salt_sensitive(spark):
    """Same salt -> identical sample across runs; different salt ->
    a different draw (on a graph with enough choice)."""
    pairs = [(f"hub", f"s{i}") for i in range(30)]
    e = _edges_df(spark, pairs)
    a = _spark_rows(sample_neighborhoods(e, ["hub"], [5], salt="a"))
    a2 = _spark_rows(sample_neighborhoods(e, ["hub"], [5], salt="a"))
    b = _spark_rows(sample_neighborhoods(e, ["hub"], [5], salt="b"))
    assert a == a2 and len(a) == 5
    assert a != b


def test_sample_shared_draw_across_seeds(spark):
    """The per-node draw is shared: two seeds reaching the same node
    at the same layer sample the same neighbors."""
    pairs = [("a", "x"), ("b", "x")] + [(f"x", f"t{i}") for i in range(10)]
    out = sample_neighborhoods(
        _edges_df(spark, pairs), ["a", "b"], [1, 3]
    ).collect()
    per_seed = {}
    for r in out:
        if r["layer"] == 1 and r["src"] == "x":
            per_seed.setdefault(r["seed"], set()).add(r["dst"])
    assert per_seed["a"] == per_seed["b"] and len(per_seed["a"]) == 3


def test_sample_rank_limited_window_plan(spark, tmp_path):
    """Hub safety: the per-node top-fanout runs as a rank-LIMITED
    window (WindowGroupLimit), not a full sort of each adjacency."""
    path = str(tmp_path / "edges")
    pairs = [("hub", f"s{i}") for i in range(50)]
    _edges_df(spark, pairs).write.parquet(path)
    df = sample_neighborhoods(spark.read.parquet(path), ["hub"], [3])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan


def test_sample_validations(spark):
    e = _edges_df(spark, [("a", "b")])
    with pytest.raises(ValueError, match="fanouts"):
        sample_neighborhoods(e, ["a"], [])
    with pytest.raises(ValueError, match="fanouts"):
        sample_neighborhoods(e, ["a"], [2, 0])


# -- deterministic random walks ---------------------------------------


def test_walks_differential_random_graphs(spark):
    """Seeded digraphs x lengths x salts: DuckDB draws the SAME walks
    (identical hash32 step choice)."""
    from triplestore_spark.operators.graph_sample import (
        random_walks,
        random_walks_sql,
    )

    rng = random.Random(11)
    for round_i in range(3):
        pairs = sorted(
            {
                (f"v{rng.randrange(15)}", f"v{rng.randrange(15)}")
                for _ in range(60)
            }
        )
        pairs = [(a, b) for a, b in pairs if a != b]
        seeds = sorted({f"v{rng.randrange(15)}" for _ in range(2)})
        got = _spark_rows(
            random_walks(
                _edges_df(spark, pairs), seeds,
                walk_length=5, walks_per_seed=2, salt=str(round_i),
            )
        )
        want = _duck_rows(
            pairs,
            random_walks_sql(
                seeds, walk_length=5, walks_per_seed=2,
                salt=str(round_i),
            ),
        )
        assert got == want and len(got) > len(seeds), round_i


def test_walks_follow_edges_and_truncate(spark):
    """Every consecutive (node, next) is a real edge; walks stop at
    the dangling node; step 0 is the seed."""
    from triplestore_spark.operators.graph_sample import random_walks

    pairs = [("a", "b"), ("b", "c"), ("b", "d")]  # c, d dangling
    rows = random_walks(
        _edges_df(spark, pairs), ["a"], walk_length=5, walks_per_seed=3
    ).collect()
    eset = set(pairs)
    by_walk: dict[str, dict[int, str]] = {}
    for r in rows:
        by_walk.setdefault(r["walk"], {})[r["step"]] = r["node"]
    assert len(by_walk) == 3
    for steps in by_walk.values():
        assert steps[0] == "a"
        for t in range(1, max(steps) + 1):
            assert (steps[t - 1], steps[t]) in eset
        assert steps[max(steps)] in ("c", "d")  # truncated at dangling


def test_walks_deterministic_and_distinct_per_walk(spark):
    """Same salt reproduces byte-identical walks; different walk ids
    explore differently on a branching graph."""
    from triplestore_spark.operators.graph_sample import random_walks

    pairs = [("r", f"m{i}") for i in range(8)]
    pairs += [(f"m{i}", f"t{i}{j}") for i in range(8) for j in range(3)]
    e = _edges_df(spark, pairs)
    a = _spark_rows(
        random_walks(e, ["r"], walk_length=2, walks_per_seed=6, salt="s")
    )
    a2 = _spark_rows(
        random_walks(e, ["r"], walk_length=2, walks_per_seed=6, salt="s")
    )
    assert a == a2
    firsts = {
        r[3] for r in a if r[2] == 1
    }
    assert len(firsts) > 1  # 6 walks don't all pick the same branch


def test_walks_validations(spark):
    from triplestore_spark.operators.graph_sample import random_walks

    e = _edges_df(spark, [("a", "b")])
    with pytest.raises(ValueError, match="walk_length"):
        random_walks(e, ["a"], walk_length=0)


def test_skipgrams_differential_and_shape(spark):
    """Skip-gram pairs: bag-mode multiset equality with the DuckDB
    twin on deterministic walks; window/symmetry semantics."""
    from triplestore_spark.operators.graph_sample import (
        random_walks,
        walks_to_skipgrams,
        walks_to_skipgrams_sql,
    )
    import duckdb

    pairs = [(f"v{i}", f"v{(i + 1) % 9}") for i in range(9)]
    pairs += [(f"v{i}", f"v{(i + 3) % 9}") for i in range(9)]
    walks = random_walks(
        _edges_df(spark, pairs), ["v0", "v4"],
        walk_length=6, walks_per_seed=2,
    ).cache()
    wrows = [tuple(r) for r in walks.collect()]
    con = duckdb.connect()
    import pandas as pd

    con.register(
        "walks",
        pd.DataFrame(wrows, columns=["walk", "seed", "step", "node"]),
    )
    for symmetric in (True, False):
        got = sorted(
            tuple(r)
            for r in walks_to_skipgrams(
                walks, window=2, symmetric=symmetric
            ).collect()
        )
        want = sorted(
            tuple(r)
            for r in con.execute(
                walks_to_skipgrams_sql(window=2, symmetric=symmetric)
            ).fetchall()
        )
        assert got == want and len(got) > 0, symmetric
    # symmetric doubles the forward pairs (every (c, x) has (x, c))
    sym = walks_to_skipgrams(walks, window=2).count()
    fwd = walks_to_skipgrams(walks, window=2, symmetric=False).count()
    assert sym == 2 * fwd
    walks.unpersist()
    with pytest.raises(ValueError, match="window"):
        walks_to_skipgrams(walks, window=0)
