"""Text analysis for training-data pipelines: token counting, language
ID, quality scoring, document fingerprinting.

All pure Catalyst (split/size/md5/arithmetic) — these run over every
document of a 100 TB corpus, so they must stay inside whole-stage
codegen; every one of them has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# minimal English stopword marker set present in the synthetic corpus;
# the lang-id heuristic is ratio-of-stopwords (an n-gram/stopword
# heuristic is the standard cheap LID baseline)
EN_STOPWORDS = ("the", "a")
LANG_ID_THRESHOLD = 0.02


def tokens_col(text: Column | str = "text") -> Column:
    text = F.col(text) if isinstance(text, str) else text
    return F.split(text, " ")


def token_count(docs: DataFrame) -> DataFrame:
    """Whitespace token count + BPE-ish subword estimate (chars/4 is
    the classic byte-pair heuristic)."""
    toks = tokens_col()
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.ceil(F.length("text") / 4).cast("long").alias("n_subwords_est"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-ratio language ID: 'en' iff the English-marker token
    ratio >= threshold, else 'unk'."""
    toks = tokens_col()
    n_stop = F.size(
        F.filter(toks, lambda t: t.isin(*EN_STOPWORDS))
    )
    ratio = n_stop / F.size(toks)
    return docs.select(
        "doc_id",
        F.round(ratio, 6).alias("stopword_ratio"),
        F.when(ratio >= LANG_ID_THRESHOLD, F.lit("en"))
        .otherwise(F.lit("unk"))
        .alias("pred_lang"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Composite quality: length saturation + lexical diversity.
    score = 0.5 * min(1, n_chars/500) + 0.5 * distinct/total tokens."""
    toks = tokens_col()
    length_part = F.least(F.lit(1.0), F.col("n_chars") / 500.0)
    diversity = F.size(F.array_distinct(toks)) / F.size(toks)
    return docs.select(
        "doc_id",
        F.round(0.5 * length_part + 0.5 * diversity, 6).alias("quality"),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Exact-dedup fingerprint: md5 of the lowercased text (md5 is
    bit-identical across engines, so the oracle matches exactly)."""
    return docs.select(
        "doc_id", F.md5(F.lower(F.col("text"))).alias("fp")
    )


def filter_documents(
    docs: DataFrame,
    min_quality: float = 0.5,
    langs: tuple[str, ...] = ("en",),
    min_tokens: int = 5,
    max_tokens: int = 1_000_000,
) -> DataFrame:
    """The curation FILTER step: documents passing quality, language,
    and length gates — the standard pre-training funnel stage after
    stats and before dedup. One narrow pass (all three stats are
    whole-stage-codegen expressions over the same scan; Catalyst fuses
    them), no shuffle."""
    toks = tokens_col()
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS)))
    pred_lang = F.when(
        n_stop / n_tokens >= LANG_ID_THRESHOLD, F.lit("en")
    ).otherwise(F.lit("unk"))
    quality = 0.5 * F.least(F.lit(1.0), F.col("n_chars") / 500.0) + 0.5 * (
        F.size(F.array_distinct(toks)) / n_tokens
    )
    return docs.where(
        (F.round(quality, 6) >= min_quality)
        & pred_lang.isin(*langs)
        & n_tokens.between(min_tokens, max_tokens)
    )


def filter_documents_sql(
    min_quality: float = 0.5,
    langs: tuple[str, ...] = ("en",),
    min_tokens: int = 5,
    max_tokens: int = 1_000_000,
) -> str:
    lang_list = ", ".join(f"'{lang}'" for lang in langs)
    return f"""
    SELECT * FROM documents
    WHERE round(0.5 * least(1.0, n_chars / 500.0)
               + 0.5 * (len(list_distinct(string_split(text, ' ')))
                        / CAST(len(string_split(text, ' ')) AS DOUBLE)),
               6) >= {min_quality}
      AND (CASE WHEN len(list_filter(string_split(text, ' '),
                                     t -> t IN ('the', 'a')))
                     / CAST(len(string_split(text, ' ')) AS DOUBLE)
                     >= {LANG_ID_THRESHOLD}
                THEN 'en' ELSE 'unk' END) IN ({lang_list})
      AND len(string_split(text, ' ')) BETWEEN {min_tokens} AND {max_tokens}
    """


TOKEN_COUNT_SQL = """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
       CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_subwords_est
FROM documents
"""

LANG_ID_SQL = f"""
SELECT doc_id,
       round(len(list_filter(string_split(text, ' '),
                             t -> t IN ('the', 'a')))
             / CAST(len(string_split(text, ' ')) AS DOUBLE), 6)
         AS stopword_ratio,
       CASE WHEN len(list_filter(string_split(text, ' '),
                                 t -> t IN ('the', 'a')))
                 / CAST(len(string_split(text, ' ')) AS DOUBLE)
                 >= {LANG_ID_THRESHOLD}
            THEN 'en' ELSE 'unk' END AS pred_lang
FROM documents
"""

QUALITY_SQL = """
SELECT doc_id,
       round(0.5 * least(1.0, n_chars / 500.0)
             + 0.5 * (len(list_distinct(string_split(text, ' ')))
                      / CAST(len(string_split(text, ' ')) AS DOUBLE)),
             6) AS quality
FROM documents
"""

FINGERPRINT_SQL = """
SELECT doc_id, md5(lower(text)) AS fp FROM documents
"""
