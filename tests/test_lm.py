"""N-gram LM perplexity screen: training counts and scores match an
independent pure-python implementation to 1e-9 (same tokenization,
same add-k smoothing), plus ordering and screen-semantics checks."""

import math

import pytest

from triplestore_spark.operators.lm import (
    perplexity_score,
    perplexity_screen,
    train_ngram_lm,
)

REFERENCE = [
    ("r1", "the cat sat on the mat"),
    ("r2", "the dog sat on the rug"),
    ("r3", "a cat and a dog"),
    ("r4", "the cat and the dog sat"),
]

CANDIDATES = [
    ("c_like", "the cat sat on the rug"),     # reference-like
    ("c_mixed", "the cat flew over zzz"),     # partly novel
    ("c_junk", "qqq www eee rrr ttt yyy"),    # fully novel
    ("c_short", "hi"),                        # < n tokens -> NULL
]


def _py_model(rows, n, min_count):
    grams: dict[tuple, int] = {}
    vocab = set()
    for _, text in rows:
        toks = text.split(" ")
        vocab.update(toks)
        for i in range(len(toks) - n + 1):
            g = tuple(toks[i : i + n])
            grams[g] = grams.get(g, 0) + 1
    ctx: dict[tuple, int] = {}
    for g, c in grams.items():
        ctx[g[:-1]] = ctx.get(g[:-1], 0) + c
    pruned = {g: c for g, c in grams.items() if c >= min_count}
    return pruned, ctx, len(vocab)


def _py_score(text, model, n, k):
    pruned, ctx, v = model
    toks = text.split(" ")
    out = []
    for i in range(len(toks) - n + 1):
        g = tuple(toks[i : i + n])
        c_gw = pruned.get(g, 0)
        c_ctx = ctx.get(g[:-1], 0)
        out.append(-math.log((c_gw + k) / (c_ctx + k * v)))
    return (len(out), sum(out) / len(out)) if out else (0, None)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


@pytest.mark.parametrize("n,min_count,k", [(2, 1, 1.0), (2, 2, 0.5), (3, 1, 1.0), (1, 1, 1.0)])
def test_scores_match_python(spark, n, min_count, k):
    model = train_ngram_lm(
        _docs(spark, REFERENCE), n=n, min_count=min_count
    )
    py = _py_model(REFERENCE, n, min_count)
    assert model["vocab_size"] == py[2]
    got = {
        r["doc_id"]: (r["n_grams"], r["avg_neg_logp"])
        for r in perplexity_score(
            _docs(spark, CANDIDATES), model, k=k
        ).collect()
    }
    assert set(got) == {r[0] for r in CANDIDATES}
    for doc_id, text in CANDIDATES:
        n_grams, want = _py_score(text, py, n, k)
        assert got[doc_id][0] == n_grams, doc_id
        if want is None:
            assert got[doc_id][1] is None, doc_id
        else:
            assert got[doc_id][1] == pytest.approx(want, abs=1e-9), doc_id


def test_reference_like_scores_lower(spark):
    model = train_ngram_lm(_docs(spark, REFERENCE), n=2)
    got = {
        r["doc_id"]: r["avg_neg_logp"]
        for r in perplexity_score(
            _docs(spark, CANDIDATES), model
        ).collect()
    }
    assert got["c_like"] < got["c_mixed"] < got["c_junk"]


def test_screen_keeps_low_perplexity_and_drops_short(spark):
    model = train_ngram_lm(_docs(spark, REFERENCE), n=2)
    scored = {
        r["doc_id"]: r["avg_neg_logp"]
        for r in perplexity_score(
            _docs(spark, CANDIDATES), model
        ).collect()
    }
    thr = (scored["c_like"] + scored["c_mixed"]) / 2
    kept = {
        r["doc_id"]
        for r in perplexity_screen(
            _docs(spark, CANDIDATES), model, max_avg_neg_logp=thr
        ).collect()
    }
    assert kept == {"c_like"}  # c_short (unscorable) dropped too


def test_lm_validations(spark):
    with pytest.raises(ValueError, match="n must be"):
        train_ngram_lm(_docs(spark, REFERENCE), n=0)
    model = train_ngram_lm(_docs(spark, REFERENCE), n=2)
    with pytest.raises(ValueError, match="k must be"):
        perplexity_score(_docs(spark, CANDIDATES), model, k=0)
