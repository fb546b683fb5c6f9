"""Full-text search (operators/text_search.py): BM25 against an
independent pure-Python oracle, determinism, graph-literal indexing,
and the plan properties that make it scale (text never shuffles past
tokenization; the query side broadcasts)."""

import math
import random

import pytest
from pyspark.sql import functions as F

from triplestore_spark import schema as S
from triplestore_spark.dsl import Obj, Triple, lit_string, triples_to_df
from triplestore_spark.operators.text_search import (
    bm25_score_py,
    bm25_search,
    build_text_index,
    graph_text_index,
    terms_col,
)

DOCS = {
    "d1": "the quick brown fox jumps over the lazy dog",
    "d2": "a quick brown dog outpaces a quick fox",
    "d3": "lorem ipsum dolor sit amet",
    "d4": "the dog sat on the mat; the dog barked",
    "d5": "Foxes and Dogs: a QUICK study",
    "d6": "",
}


def _index(spark, docs=DOCS):
    df = spark.createDataFrame(
        list(docs.items()), "doc_id string, text string"
    )
    return build_text_index(df)


def test_tokenizer_case_fold_and_punct(spark):
    df = spark.createDataFrame(
        [("x", "Hello, WORLD!! 42 foo-bar")], "id string, text string"
    )
    [row] = df.select(terms_col("text").alias("t")).collect()
    assert row["t"] == ["hello", "world", "42", "foo", "bar"]


def test_index_stats(spark):
    idx = _index(spark)
    # d6 is empty but still a document (dl = 0)
    assert idx.n_docs == 6
    lens = {r["id"]: r["dl"] for r in
            idx.postings.select("id", "dl").distinct().collect()}
    assert lens["d1"] == 9 and "d6" not in lens  # no postings for empty
    df_map = {r["term"]: r["df"] for r in idx.term_stats.collect()}
    assert df_map["quick"] == 3  # d1, d2, d5
    assert df_map["dog"] == 3    # d1, d2, d4 ('dogs' in d5 is a term of its own)
    # avgdl counts the empty doc's 0 length
    total = sum(lens.values())
    assert idx.avgdl == pytest.approx(total / 6)


def test_bm25_matches_pure_python_oracle(spark):
    idx = _index(spark)
    for query in ["quick fox", "the dog", "lorem", "QUICK Study dogs"]:
        got = {
            (r["qid"], r["id"]): r["score"]
            for r in bm25_search(idx, [query], k=10).collect()
        }
        want = bm25_score_py(DOCS, query)
        assert set(k[1] for k in got) == set(want)
        for (qid, i), s in got.items():
            assert qid == "0"
            assert s == pytest.approx(want[i], rel=1e-9)


def test_bm25_randomized_differential(spark):
    rng = random.Random(20260818)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    docs = {
        f"d{i}": " ".join(rng.choices(vocab, k=rng.randint(1, 30)))
        for i in range(25)
    }
    idx = _index(spark, docs)
    queries = {
        f"q{j}": " ".join(rng.sample(vocab, k=rng.randint(1, 3)))
        for j in range(5)
    }
    got = bm25_search(idx, queries, k=100).collect()
    by_q: dict[str, dict[str, float]] = {}
    for r in got:
        by_q.setdefault(r["qid"], {})[r["id"]] = r["score"]
    for qid, qtext in queries.items():
        want = bm25_score_py(docs, qtext)
        have = by_q.get(qid, {})
        assert set(have) == set(want), qid
        for i in want:
            assert have[i] == pytest.approx(want[i], rel=1e-9)


def test_topk_rank_and_deterministic_ties(spark):
    # two identical docs -> identical scores; tie breaks on id asc
    docs = {"b": "same words here", "a": "same words here",
            "c": "unrelated stuff"}
    idx = _index(spark, docs)
    rows = bm25_search(idx, ["same words"], k=2).collect()
    assert [(r["id"], r["rank"]) for r in
            sorted(rows, key=lambda r: r["rank"])] == [("a", 1), ("b", 2)]


def test_query_term_multiplicity_ignored(spark):
    idx = _index(spark)
    a = {r["id"]: r["score"] for r in bm25_search(idx, ["dog"], k=10).collect()}
    b = {r["id"]: r["score"] for r in
         bm25_search(idx, ["dog dog DOG"], k=10).collect()}
    assert a == b


def test_no_match_and_empty_index_refusal(spark):
    idx = _index(spark)
    assert bm25_search(idx, ["zzzunknown"], k=5).count() == 0
    empty = build_text_index(
        spark.createDataFrame([], "doc_id string, text string")
    )
    with pytest.raises(ValueError, match="empty index"):
        bm25_search(empty, ["x"])
    with pytest.raises(ValueError, match="no queries"):
        bm25_search(idx, [])


def test_fragment_ids_merge(spark):
    # one id split over two rows == the concatenated document
    frags = spark.createDataFrame(
        [("d", "quick brown"), ("d", "fox quick"), ("e", "slow snail")],
        "doc_id string, text string",
    )
    whole = {"d": "quick brown fox quick", "e": "slow snail"}
    idx = build_text_index(frags)
    got = {r["id"]: r["score"]
           for r in bm25_search(idx, ["quick"], k=10).collect()}
    want = bm25_score_py(whole, "quick")
    assert set(got) == set(want)
    for i in want:
        assert got[i] == pytest.approx(want[i], rel=1e-9)


def test_graph_text_index_returns_subjects(spark):
    g_rows = [
        Triple("e:cat", "rdfs:label", lit_string("feline friend")),
        Triple("e:cat", "kg:desc", lit_string("a small domestic feline")),
        Triple("e:dog", "rdfs:label", lit_string("canine friend")),
        Triple("e:cat", "kg:rel", Obj(S.KIND_RESOURCE, "e:feline")),
    ]
    from triplestore_spark.operators.graph import RDFGraph

    g = RDFGraph(triples_to_df(spark, g_rows), cache=False)
    idx = graph_text_index(g)
    hits = bm25_search(idx, ["feline"], k=5).collect()
    assert [r["id"] for r in hits] == ["e:cat"]  # resource object ignored
    # predicate restriction: label-only index doesn't see kg:desc text
    idx_lbl = graph_text_index(g, predicates=["rdfs:label"])
    assert bm25_search(idx_lbl, ["domestic"], k=5).count() == 0
    assert bm25_search(idx_lbl, ["friend"], k=5).count() == 2


def test_rdfgraph_text_search_front_door(spark):
    from triplestore_spark.operators.graph import RDFGraph

    g = RDFGraph(
        triples_to_df(
            spark,
            [
                Triple("e:cat", "rdfs:label", lit_string("feline friend")),
                Triple("e:dog", "rdfs:label", lit_string("canine friend")),
            ],
        ),
        cache=False,
    )
    rows = g.text_search("feline", k=5).collect()
    assert [(r["subject"], r["rank"]) for r in rows] == [("e:cat", 1)]
    assert rows[0]["score"] > 0
    both = g.text_search("friend", k=5).collect()
    assert {r["subject"] for r in both} == {"e:cat", "e:dog"}


def test_plan_properties(spark):
    idx = _index(spark)
    plan = bm25_search(idx, ["quick fox"], k=3)._jdf.queryExecution(
    ).executedPlan().toString()
    # the query side reaches the postings as a broadcast join
    assert "BroadcastHashJoin" in plan
    # no exchange moves the raw text column: after tokenization only
    # id/term/tf/dl/qid/score ever shuffle
    import re

    for m in re.finditer(r"Exchange [^\n]*", plan):
        assert "text" not in m.group(0), m.group(0)


def test_require_all_and_mode(spark):
    idx = _index(spark)
    # OR mode: 'quick mat' matches quick-docs and d4 (mat)
    or_ids = {r["id"] for r in bm25_search(idx, ["quick mat"], k=10).collect()}
    assert or_ids == {"d1", "d2", "d5", "d4"}
    # AND mode: no doc has both
    assert bm25_search(idx, ["quick mat"], k=10, require_all=True).count() == 0
    # AND mode positive: d1/d2 have both quick and fox
    and_rows = bm25_search(idx, ["quick fox"], k=10, require_all=True).collect()
    assert {r["id"] for r in and_rows} == {"d1", "d2"}
    # scores identical to OR mode for the surviving docs
    or_scores = {r["id"]: r["score"]
                 for r in bm25_search(idx, ["quick fox"], k=10).collect()}
    for r in and_rows:
        assert r["score"] == pytest.approx(or_scores[r["id"]], rel=1e-12)
    # an out-of-vocabulary term means NO doc can match all
    assert bm25_search(
        idx, ["quick zzzunknown"], k=10, require_all=True
    ).count() == 0


def test_persisted_index_equals_inline(spark, tmp_path):
    from triplestore_spark.operators.text_search import (
        load_text_index,
        save_text_index,
    )

    idx = _index(spark)
    p = str(tmp_path / "txtidx")
    save_text_index(idx, p, n_buckets=8)
    loaded = load_text_index(spark, p)
    assert loaded.n_docs == idx.n_docs
    assert loaded.avgdl == pytest.approx(idx.avgdl)
    queries = {"a": "quick fox", "b": "the dog barked", "c": "lorem"}
    inline = sorted(
        (r["qid"], r["id"], r["rank"], round(r["score"], 12))
        for r in bm25_search(idx, queries, k=10).collect()
    )
    persisted = sorted(
        (r["qid"], r["id"], r["rank"], round(r["score"], 12))
        for r in bm25_search(loaded, queries, k=10).collect()
    )
    assert inline == persisted


def test_persisted_index_partition_pruning(spark, tmp_path):
    from triplestore_spark.operators.text_search import (
        save_text_index,
    )

    idx = _index(spark)
    p = str(tmp_path / "txtidx2")
    loaded = save_text_index(idx, p, n_buckets=16)
    plan = bm25_search(loaded, ["lorem"], k=3)._jdf.queryExecution(
    ).executedPlan().toString()
    # the bucket IN-list reaches the scan as a partition filter and
    # the term IN-list as a pushed data filter
    assert "PartitionFilters" in plan
    assert "bucket" in plan.split("PartitionFilters", 1)[1][:400]
    assert "PushedFilters" in plan


def test_incremental_update_equals_full_rebuild(spark, tmp_path):
    from triplestore_spark.operators.text_search import (
        load_text_index,
        save_text_index,
        update_text_index,
    )

    first = {k: DOCS[k] for k in ("d1", "d2", "d3")}
    second = {k: DOCS[k] for k in ("d4", "d5", "d6")}
    p_inc = str(tmp_path / "inc")
    save_text_index(_index(spark, first), p_inc, n_buckets=8)
    updated = update_text_index(
        load_text_index(spark, p_inc),
        spark.createDataFrame(
            list(second.items()), "doc_id string, text string"
        ),
    )
    p_full = str(tmp_path / "full")
    full = save_text_index(_index(spark, DOCS), p_full, n_buckets=8)

    assert updated.n_docs == full.n_docs == 6
    assert updated.avgdl == pytest.approx(full.avgdl)

    def rows(idx, df, cols):
        return sorted(tuple(r) for r in df.select(*cols).collect())

    assert rows(updated, updated.postings, ["id", "term", "tf", "dl"]) == \
        rows(full, full.postings, ["id", "term", "tf", "dl"])
    assert rows(updated, updated.term_stats, ["term", "df"]) == \
        rows(full, full.term_stats, ["term", "df"])

    queries = {"a": "quick fox", "b": "the dog barked", "c": "lorem"}
    got = sorted(
        (r["qid"], r["id"], r["rank"], round(r["score"], 12))
        for r in bm25_search(updated, queries, k=10).collect()
    )
    want = sorted(
        (r["qid"], r["id"], r["rank"], round(r["score"], 12))
        for r in bm25_search(full, queries, k=10).collect()
    )
    assert got == want

    # reload from disk sees the merged state too
    reloaded = load_text_index(spark, p_inc)
    assert reloaded.n_docs == 6
    assert reloaded.postings.count() == full.postings.count()


def test_incremental_update_refuses_id_overlap(spark, tmp_path):
    from triplestore_spark.operators.text_search import (
        save_text_index,
        update_text_index,
    )

    p = str(tmp_path / "ov")
    idx = save_text_index(_index(spark), p, n_buckets=4)
    dup = spark.createDataFrame(
        [("d1", "already there")], "doc_id string, text string"
    )
    with pytest.raises(ValueError, match="append-only"):
        update_text_index(idx, dup)
    # empty delta is a no-op
    empty = spark.createDataFrame([], "doc_id string, text string")
    assert update_text_index(idx, empty) is idx


def test_persisted_index_pattern_mismatch_refused(spark, tmp_path):
    import json

    from triplestore_spark.operators.text_search import (
        INDEX_FILE,
        load_text_index,
        save_text_index,
    )

    idx = _index(spark)
    p = str(tmp_path / "txtidx3")
    save_text_index(idx, p, n_buckets=4)
    meta_path = tmp_path / "txtidx3" / INDEX_FILE
    meta = json.loads(meta_path.read_text())
    meta["token_pattern"] = r"\w+"
    meta_path.write_text(json.dumps(meta))
    # drop the local-FS checksum sidecar the out-of-band edit broke
    crc = tmp_path / "txtidx3" / ("." + INDEX_FILE + ".crc")
    if crc.exists():
        crc.unlink()
    with pytest.raises(ValueError, match="rebuild the index"):
        load_text_index(spark, p)


def test_tfidf_vectors_match_pure_python(spark):
    from triplestore_spark.operators.text_search import (
        tfidf_vectors,
        tfidf_vectors_py,
    )

    idx = _index(spark)
    got = {r["id"]: r["vector"]
           for r in tfidf_vectors(idx, dim=32).collect()}
    want = tfidf_vectors_py(DOCS, dim=32)
    assert set(got) == set(want)  # d6 (empty) absent from both
    assert "d6" not in got
    for i, vec in want.items():
        assert got[i] == pytest.approx(vec, rel=1e-9, abs=1e-12)


def test_similar_documents_duplicates_rank_first(spark):
    from triplestore_spark.operators.text_search import similar_documents

    docs = {
        "a1": "spark shuffles partitions across the cluster",
        "a2": "spark shuffles partitions across the cluster",
        "b": "ducks swim on the quiet pond",
        "c": "completely different words entirely",
    }
    df = spark.createDataFrame(
        list(docs.items()), "doc_id string, text string"
    )
    rows = similar_documents(df, k=1, dim=64, query_ids=["a1", "b"]).collect()
    by_q = {r["query_id"]: r for r in rows}
    # a1's nearest neighbor is its exact duplicate at cosine 1.0
    assert by_q["a1"]["neighbor_id"] == "a2"
    assert by_q["a1"]["cosine"] == pytest.approx(1.0, abs=1e-6)
    assert by_q["b"]["cosine"] < 1.0


def test_similar_documents_default_bounded(spark):
    """The all-pairs default must refuse above max_default_docs by
    name (r7: no full-corpus driver collect reachable from a default
    call path) and still work below the bound."""
    from triplestore_spark.operators.text_search import similar_documents

    docs = {
        "a1": "spark shuffles partitions across the cluster",
        "a2": "spark shuffles partitions across the cluster",
        "b": "ducks swim on the quiet pond",
    }
    df = spark.createDataFrame(
        list(docs.items()), "doc_id string, text string"
    )
    with pytest.raises(ValueError, match="lsh_topk"):
        similar_documents(df, k=1, dim=64, max_default_docs=2)
    # below the bound the default still ranks every document
    rows = similar_documents(df, k=1, dim=64, max_default_docs=10)
    assert {r["query_id"] for r in rows.collect()} == {"a1", "a2", "b"}


def test_tfidf_refusals(spark):
    from triplestore_spark.operators.text_search import (
        build_text_index,
        tfidf_vectors,
    )

    empty = build_text_index(
        spark.createDataFrame([], "doc_id string, text string")
    )
    with pytest.raises(ValueError, match="empty index"):
        tfidf_vectors(empty)
    with pytest.raises(ValueError, match="dim must be positive"):
        tfidf_vectors(_index(spark), dim=0)


def test_idf_always_positive(spark):
    # a term present in EVERY document still contributes positively
    docs = {f"d{i}": "common filler" for i in range(4)}
    idx = _index(spark, docs)
    rows = bm25_search(idx, ["common"], k=10).collect()
    assert len(rows) == 4 and all(r["score"] > 0 for r in rows)
    want = math.log(1 + (4 - 4 + 0.5) / (4 + 0.5))
    # tf=1, dl==avgdl -> norm = 1 + k1 -> contribution == idf
    assert rows[0]["score"] == pytest.approx(want, rel=1e-9)
