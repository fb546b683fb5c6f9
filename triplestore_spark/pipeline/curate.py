"""Composed corpus-curation pipeline: the canonical screen order a
pretraining data pipeline applies between "raw crawl" and "training
shards", each stage one of the library's oracled/differential-tested
operators:

    filter -> line dedup -> PII redaction -> [LM perplexity screen]
    -> eval decontamination -> near-dup dedup (MinHash-LSH keep-list)
    -> per-source cap -> mixture sampling (optionally with upsampling
    epochs) -> deterministic shuffle

Stage order rationale (each stage shrinks or normalizes the input of
the next): the quality/language filter is a scan-speed funnel so it
runs first; line dedup and redaction rewrite text, so they precede
anything fingerprint-based; decontamination and near-dup dedup work on
the cleaned text; the per-source cap and mixture sampling act on the
surviving population; the shuffle is last because order is only
meaningful for the final corpus.

Every stage is lazily composed Spark plans — nothing executes until an
action, and CurationResult keeps each intermediate DataFrame so a
caller can count/audit any stage without re-deriving it. At 100 TB the
composition matters: early stages are shuffle-free scans, the
shuffling stages (line dedup, LSH, cap, final sort) each key on narrow
columns, and dropped documents never reach later, more expensive
stages.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from triplestore_spark.operators import dedup as DD
from triplestore_spark.operators import textstats as TS


@dataclass
class CurationResult:
    """Every stage of the funnel, lazily. `docs` is the final corpus;
    the rest exist for audit (counts, diffs, contamination report)."""

    filtered: DataFrame
    line_deduped: DataFrame
    redacted: DataFrame
    decontaminated: DataFrame
    contamination_report: DataFrame | None
    near_deduped: DataFrame
    capped: DataFrame
    sampled: DataFrame
    docs: DataFrame
    lm_screened: DataFrame | None = None
    mixture_fractions: dict[str, float] = field(default_factory=dict)

    def funnel_counts(self) -> dict[str, int]:
        """One count per stage — each is its own action; call on a
        small slice or cache upstream first."""
        out = {
            "filtered": self.filtered.count(),
            "line_deduped": self.line_deduped.count(),
            "redacted": self.redacted.count(),
        }
        if self.lm_screened is not None:
            out["lm_screened"] = self.lm_screened.count()
        return out | {
            "decontaminated": self.decontaminated.count(),
            "near_deduped": self.near_deduped.count(),
            "capped": self.capped.count(),
            "sampled": self.sampled.count(),
            "final": self.docs.count(),
        }


def curate(
    docs: DataFrame,
    eval_docs: DataFrame | None = None,
    *,
    min_quality: float = 0.5,
    langs: tuple[str, ...] = ("en",),
    min_tokens: int = 5,
    max_tokens: int = 1_000_000,
    line_dedup: bool = True,
    min_line_chars: int = 1,
    redact: bool = True,
    lm_reference: DataFrame | None = None,
    lm_max_avg_neg_logp: float | None = None,
    lm_n: int = 2,
    lm_min_count: int = 2,
    decontaminate_ngram: int = 8,
    lsh_num_hashes: int = 32,
    lsh_bands: int = 8,
    lsh_verify_threshold: float = 0.5,
    per_source_cap: int | None = None,
    token_budget: "dict[str, int] | int | None" = None,
    epochs: bool = False,
    seed: int = 42,
) -> CurationResult:
    """Run the full curation funnel. `eval_docs=None` skips the
    decontamination stage; `lm_reference=None` skips the perplexity
    screen (give BOTH lm_reference and lm_max_avg_neg_logp to enable
    it — a trusted corpus and the keep threshold on mean -ln p);
    `per_source_cap=None` skips the cap;
    `token_budget=None` skips mixture sampling (and `epochs=True`
    additionally emits upsampling epoch copies for over-1.0 mixture
    weights). The returned CurationResult exposes every stage.

    `token_budget` triggers ONE driver-side action (plan_mixture's
    config-sized collect over the capped stage); everything else stays
    lazy until the caller acts."""
    filtered = TS.filter_documents(
        docs,
        min_quality=min_quality,
        langs=langs,
        min_tokens=min_tokens,
        max_tokens=max_tokens,
    )

    line_deduped = (
        TS.dedup_lines_corpus(filtered, min_line_chars=min_line_chars)
        if line_dedup
        else filtered
    )
    if line_dedup:
        # Re-apply the length gate: line dedup can hollow out a
        # boilerplate-only document, and empty/near-empty texts all
        # hash to the same degenerate shingle — at corpus scale that
        # is ONE LSH bucket holding every emptied doc (a quadratic
        # candidate-pair blowup), so they must exit the funnel here.
        line_deduped = line_deduped.drop("n_lines_dropped").where(
            F.size(TS.tokens_col()) >= min_tokens
        )

    redacted = TS.redact_pii(line_deduped) if redact else line_deduped
    if redact:
        redacted = redacted.drop("n_redacted")

    # optional CCNet-style LM perplexity screen — after redaction (it
    # must see the final text), before the fingerprint-based stages
    # (they're costlier, so screen first). Both knobs must be given.
    lm_screened = None
    if (lm_reference is None) != (lm_max_avg_neg_logp is None):
        raise ValueError(
            "curate: lm_reference and lm_max_avg_neg_logp go together"
        )
    if lm_reference is not None:
        from triplestore_spark.operators.lm import (
            perplexity_screen,
            train_ngram_lm,
        )

        model = train_ngram_lm(
            lm_reference, n=lm_n, min_count=lm_min_count
        )
        lm_screened = perplexity_screen(
            redacted, model, max_avg_neg_logp=lm_max_avg_neg_logp
        ).drop("n_grams", "avg_neg_logp")

    contamination_report = None
    pre_decon = lm_screened if lm_screened is not None else redacted
    decontaminated = pre_decon
    if eval_docs is not None:
        decontaminated, contamination_report = TS.decontaminate(
            pre_decon, eval_docs, n=decontaminate_ngram
        )

    pairs = DD.minhash_lsh_pairs(
        decontaminated,
        n=3,
        num_hashes=lsh_num_hashes,
        bands=lsh_bands,
        verify_threshold=lsh_verify_threshold,
    ).select("doc_a", "doc_b")
    near_deduped = DD.dedup_keep_list(decontaminated, pairs)

    capped = (
        TS.cap_per_group(near_deduped, per_source_cap, seed=seed)
        if per_source_cap is not None
        else near_deduped
    )

    fractions: dict[str, float] = {}
    sampled = capped
    if token_budget is not None:
        fractions = TS.plan_mixture(capped, token_budget)
        sampled = (
            TS.stratified_sample_epochs(capped, fractions, seed=seed)
            if epochs
            else TS.stratified_sample(capped, fractions, seed=seed)
        )

    final = TS.shuffle_deterministic(sampled, seed=seed)

    return CurationResult(
        filtered=filtered,
        line_deduped=line_deduped,
        redacted=redacted,
        decontaminated=decontaminated,
        contamination_report=contamination_report,
        near_deduped=near_deduped,
        capped=capped,
        sampled=sampled,
        docs=final,
        lm_screened=lm_screened,
        mixture_fractions=fractions,
    )
