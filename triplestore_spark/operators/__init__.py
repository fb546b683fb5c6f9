from triplestore_spark.operators.graph import RDFGraph, TripleSource

__all__ = ["RDFGraph", "TripleSource"]
