"""N-gram language-model perplexity screening — the CCNet/Gopher-style
quality filter: train token n-gram counts on a trusted reference
corpus, score candidate documents by average negative log-probability,
keep the low-perplexity (reference-like) ones.

The model is deliberately a counting model (no neural dependency —
CCNet's published recipe uses a KenLM n-gram model the same way):
conditional probability with add-k smoothing,

    p(w | ctx) = (c(ctx, w) + k) / (c(ctx) + k * V)

where c(ctx) is the marginal of the UNPRUNED n-gram counts (so the
conditional stays a proper distribution even after rare-gram pruning)
and V is the reference vocabulary size. Unseen context scores the
uniform 1/V. Tokenization is the corpus convention shared by every
textstats op (single-space split — textstats.tokens_col).

Scale shape: training is one explode + groupBy count over the
REFERENCE corpus (the small, trusted side); scoring explodes the
candidate grams and joins the model tables — the model is usually
small enough that AQE broadcasts both joins, so candidate text never
shuffles; per-doc aggregation is partial+final. Exactness: a
pure-python twin recomputes both training and scoring to 1e-9
(tests/test_lm.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from triplestore_spark.operators.textstats import _gram_strings, tokens_col

__all__ = ["train_ngram_lm", "perplexity_score", "perplexity_screen"]


def _split_gram(df: DataFrame, n: int) -> DataFrame:
    """(gram, ...) -> (ctx, word, ...): ctx = first n-1 tokens
    ('' for unigrams), word = last token."""
    ctx = (
        F.substring_index(F.col("gram"), " ", n - 1)
        if n > 1
        else F.lit("")
    )
    return df.select(
        ctx.alias("ctx"),
        F.substring_index(F.col("gram"), " ", -1).alias("word"),
        *[c for c in df.columns if c != "gram"],
    )


def train_ngram_lm(
    reference: DataFrame,
    *,
    n: int = 2,
    min_count: int = 1,
    text_col: str = "text",
) -> dict:
    """Count model from the trusted reference corpus.

    Returns {'n', 'vocab_size', 'counts': (ctx, word, count),
    'ctx_counts': (ctx, ctx_count)}. `min_count` prunes rare n-grams
    from `counts` (model size control); `ctx_counts` marginals are
    computed BEFORE pruning so smoothed conditionals stay proper.
    The two count frames are unmaterialized plans — persist them (or
    write to parquet) when scoring many batches against one model."""
    n = int(n)
    if n < 1:
        raise ValueError("train_ngram_lm: n must be >= 1")
    toks = tokens_col(text_col)
    grams = reference.select(
        F.explode(_gram_strings(toks, n)).alias("gram")
    )
    full = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("count"))
    split = _split_gram(full, n)
    ctx_counts = split.groupBy("ctx").agg(
        F.sum("count").alias("ctx_count")
    )
    counts = split.where(F.col("count") >= int(min_count))
    vocab_size = (
        reference.select(F.explode(toks).alias("w")).distinct().count()
    )
    return {
        "n": n,
        "vocab_size": int(vocab_size),
        "counts": counts,
        "ctx_counts": ctx_counts,
    }


def perplexity_score(
    docs: DataFrame,
    model: dict,
    *,
    k: float = 1.0,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_grams, avg_neg_logp): mean -ln p(w|ctx) over the
    document's n-grams under the model (lower = more reference-like;
    e^avg_neg_logp is the per-token perplexity). Documents with fewer
    than n tokens get n_grams=0 and a NULL score — the caller decides
    their fate (a length screen usually already removed them)."""
    n, v = model["n"], model["vocab_size"]
    k = float(k)
    if k <= 0:
        raise ValueError("perplexity_score: k must be > 0")
    toks = tokens_col(text_col)
    # explode_OUTER keeps one NULL-gram row for sub-n-token docs, so
    # every doc survives to the aggregation without a re-join against
    # the input (one scan, no extra shuffle; the NULL row is masked
    # out of both the count and the average below)
    grams = docs.select(
        "doc_id", F.explode_outer(_gram_strings(toks, n)).alias("gram")
    )
    split = _split_gram(grams, n)
    joined = (
        split.join(
            model["counts"].withColumnRenamed("count", "c_gw"),
            ["ctx", "word"],
            "left",
        )
        .join(model["ctx_counts"], "ctx", "left")
        .select(
            "doc_id",
            "word",
            F.when(
                F.col("word").isNotNull(),
                -F.log(
                    (F.coalesce(F.col("c_gw"), F.lit(0)) + k)
                    / (
                        F.coalesce(F.col("ctx_count"), F.lit(0))
                        + k * F.lit(float(v))
                    )
                ),
            ).alias("neg_logp"),
        )
    )
    return joined.groupBy("doc_id").agg(
        F.count("word").alias("n_grams"),
        F.avg("neg_logp").alias("avg_neg_logp"),
    )


def perplexity_screen(
    docs: DataFrame,
    model: dict,
    *,
    max_avg_neg_logp: float,
    k: float = 1.0,
    text_col: str = "text",
) -> DataFrame:
    """Keep documents whose score is at most the threshold (docs too
    short to score are DROPPED — they carry no evidence of being
    reference-like). Returns the surviving docs with the score
    columns attached, composable with the curation funnel."""
    scored = perplexity_score(docs, model, k=k, text_col=text_col)
    keep = scored.where(
        F.col("avg_neg_logp") <= float(max_avg_neg_logp)
    )
    return docs.join(keep, "doc_id")
