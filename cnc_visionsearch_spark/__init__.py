"""cnc_visionsearch_spark — a PySpark-native analytics engine with the
query/data-processing capabilities of ocsen-hoc-code/CNC-VisionSearch.

The reference (/root/reference/main.py, 173 lines) is an online kNN
vector-search service: ViT embeddings -> FAISS HNSW index + SQLite id
mapping -> top-k search with a metadata join. This package re-expresses
that surface — plus the large-scale LLM-data-pipeline extensions
(dedup, similarity search, multimodal columns, text analysis, streaming)
— as idiomatic Spark DataFrame/SQL plans that Catalyst can optimize:
predicate pushdown, broadcast joins, whole-stage codegen, AQE.

Design rules (see SURVEY.md §7):
- DataFrame/SQL first; higher-order array functions for vector math so
  the hot path stays in JVM codegen (no Python boundary).
- Pandas UDFs (Arrow) only where semantics genuinely need Python
  (model inference, FAISS shard build) — always batched, never per-row.
- Every operator is designed for a 1000-executor / 100 TB deployment
  even though tests run on local[32]: broadcast small sides, two-phase
  top-k (no full sort), salting/AQE for skew, partition-pruned scans.
"""

from cnc_visionsearch_spark.session import get_session


def queries():
    """The full named-query registry: {name: (spark, sf_dir) -> DataFrame}."""
    from cnc_visionsearch_spark.registry import all_queries

    return all_queries()


def oracles():
    """DuckDB oracle SQL per query name (the correctness contract)."""
    from cnc_visionsearch_spark.registry import all_oracles

    return all_oracles()


__all__ = ["get_session", "queries", "oracles"]
__version__ = "0.1.0"
