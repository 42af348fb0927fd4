"""information_retrieval_system_spark — a PySpark-native full-text indexing
and ranked-retrieval engine (BM25 / VSM / Existential + PageRank fusion),
rebuilt Spark-first from the semantics of
apostolosma/Information-Retrieval-System ("themis")."""

__version__ = "0.1.0"
