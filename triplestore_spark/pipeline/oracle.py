"""Slow-but-obvious pure-Python oracle for the extraction spec.

Executes pipeline/spec.py independently of Spark (plain dict/list
code over collected rows). Used by the P/R harness and the
span-sequence invariant tests: the Spark pipeline must match this
oracle's triples at P/R >= 0.95 (it matches exactly).
"""

from __future__ import annotations

from triplestore_spark.pipeline import spec


def oracle_spans(doc_id: int, text: str) -> list[tuple]:
    """(kind, text, media_ref, offset) spans for one document."""
    words = text.split(" ") if text else []
    if not words:
        return []
    W = spec.CHUNK_WORDS
    out = []
    n_chunks = (len(words) + W - 1) // W
    for j in range(n_chunks):
        out.append(("text", " ".join(words[j * W : (j + 1) * W]), ""))
        if (doc_id * 31 + j) % spec.MEDIA_EVERY == 0:
            out.append(("image", "", f"media://{doc_id}/{j}"))
    return [(k, t, m, i) for i, (k, t, m) in enumerate(out)]


def oracle_triples(doc_row: dict) -> set[tuple]:
    """All (subject, predicate, object_kind, object_value,
    object_type, object_lang) triples for one document row."""
    doc_id = doc_row["doc_id"]
    text = doc_row["text"]
    doc = f"doc:{doc_id}"
    triples: set[tuple] = set()

    spans = oracle_spans(doc_id, text)
    for kind, span_text, media_ref, _ in spans:
        if kind == "text":
            for tok in span_text.split(" "):
                iri = spec.GAZETTEER.get(tok)
                if iri is not None:
                    triples.add(
                        (doc, spec.PRED_MENTIONS, "res", iri, "", "")
                    )
        else:
            triples.add((doc, spec.PRED_HAS_MEDIA, "res", media_ref, "", ""))

    triples.add(
        (doc, spec.PRED_SOURCE, "res", f"src:{doc_row['source']}", "", "")
    )
    words = text.split(" ") if text else [""]
    title = " ".join(words[: spec.TITLE_WORDS])
    triples.add(
        (doc, spec.PRED_TITLE, "lit", title, "xsd:string", doc_row["lang"])
    )
    triples.add(
        (doc, spec.PRED_NCHARS, "lit", str(doc_row["n_chars"]), "xsd:integer", "")
    )
    triples.add((doc, spec.PRED_TYPE, "res", spec.TYPE_DOCUMENT, "", ""))
    return triples


def oracle_corpus_triples(doc_rows: list[dict]) -> set[tuple]:
    out: set[tuple] = set()
    for row in doc_rows:
        out |= oracle_triples(row)
    return out


def precision_recall(candidate: set, reference: set) -> tuple[float, float]:
    if not candidate or not reference:
        return (0.0, 0.0)
    inter = len(candidate & reference)
    return inter / len(candidate), inter / len(reference)
