"""THE extraction spec — single source of truth.

The reference library never sees documents (it consumes triples), so
the "reference triples" for the synthetic interleaved corpus are
defined by this published spec, executed independently by the
slow-but-obvious pure-Python oracle in pipeline/oracle.py and by the
DuckDB SQL oracles in __spark_entry__.py. The Spark pipeline must
match them at P/R >= 0.95 (it matches exactly).

Corpus spec (deterministic; input = documents(doc_id, text, lang,
source, n_chars)):

- subject IRI:  'doc:' + doc_id
- words:        text split on single spaces
- text spans:   consecutive chunks of CHUNK_WORDS words, re-joined
                with single spaces; kind='text', media_ref=''
- media spans:  after text chunk j insert kind='image', text='',
                media_ref='media://{doc_id}/{j}' iff
                (doc_id * 31 + j) % MEDIA_EVERY == 0
- offset:       final span index in the document (0, 1, 2, ...)

Triple spec over the corpus + document metadata:

  T1 mentions   (doc, 'kg:mentions',  <canonical entity IRI>)   for
                every token of every text span found in GAZETTEER
                (distinct per doc+entity)
  T2 media      (doc, 'kg:hasMedia',  <media_ref>)
  T3 source     (doc, 'kg:source',    <'src:' + source>)
  T4 title      (doc, 'kg:title',     "first TITLE_WORDS words"@lang)
  T5 nchars     (doc, 'kg:nchars',    "n_chars"^^xsd:integer)
  T6 type       (doc, 'rdf:type',     <kg:Document>)
"""

CHUNK_WORDS = 8
MEDIA_EVERY = 5
TITLE_WORDS = 3

PRED_MENTIONS = "kg:mentions"
PRED_HAS_MEDIA = "kg:hasMedia"
PRED_SOURCE = "kg:source"
PRED_TITLE = "kg:title"
PRED_NCHARS = "kg:nchars"
PRED_TYPE = "rdf:type"
TYPE_DOCUMENT = "kg:Document"

# surface form -> canonical entity IRI. Deliberately N:1 in places
# ('agg'/'aggregate', 'sorts'/'sort') so entity resolution is a real
# canonicalization join, not a rename. 'the'/'a'/'big' etc. are
# absent: stopwords never become mentions.
GAZETTEER: dict[str, str] = {
    "spark": "kg:ent/spark",
    "table": "kg:ent/table",
    "join": "kg:ent/join",
    "window": "kg:ent/window",
    "scan": "kg:ent/scan",
    "hash": "kg:ent/hash",
    "merge": "kg:ent/merge",
    "filter": "kg:ent/filter",
    "sort": "kg:ent/sort",
    "sorts": "kg:ent/sort",
    "stream": "kg:ent/stream",
    "batch": "kg:ent/batch",
    "vector": "kg:ent/vector",
    "customer": "kg:ent/customer",
    "query": "kg:ent/query",
    "column": "kg:ent/column",
    "row": "kg:ent/row",
    "key": "kg:ent/key",
    "value": "kg:ent/value",
    "data": "kg:ent/data",
    "group": "kg:ent/group",
    "order": "kg:ent/order",
    "line": "kg:ent/line",
    "part": "kg:ent/part",
    "agg": "kg:ent/aggregate",
    "aggregate": "kg:ent/aggregate",
}


def gazetteer_values_sql() -> str:
    """The gazetteer as a SQL VALUES list (for the DuckDB oracles)."""
    rows = ", ".join(
        f"('{s}', '{i}')" for s, i in sorted(GAZETTEER.items())
    )
    return f"(VALUES {rows}) AS gaz(surface, iri)"
