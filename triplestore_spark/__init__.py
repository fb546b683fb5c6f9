"""triplestore_spark — a PySpark-native knowledge-graph construction engine.

Re-realizes the capabilities of the reference Go library wallix/triplestore
(RDF triples with typed literals, lang tags and bnodes; Source/RDFGraph
query surface; NTriples + binary codecs; tree traversal) as an idiomatic
Spark DataFrame engine, and extends it into a full KG-construction
pipeline: extraction from interleaved text+media documents, entity
resolution, canonical dedup, and SPO/POS/OSP-sorted materialization.

Everything here derives from public knowledge only: the Apache Spark API
and the reference repo's observable behavior (cited file:line in
docstrings).
"""

from triplestore_spark.schema import TRIPLE_SCHEMA, DOCUMENT_SCHEMA
from triplestore_spark.dsl import (
    Obj,
    Triple,
    subj_pred,
    bnode_pred,
    resource,
    bnode,
    object_literal,
)

__all__ = [
    "TRIPLE_SCHEMA",
    "DOCUMENT_SCHEMA",
    "Obj",
    "Triple",
    "subj_pred",
    "bnode_pred",
    "resource",
    "bnode",
    "object_literal",
]

__version__ = "0.1.0"
