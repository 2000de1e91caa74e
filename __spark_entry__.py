"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship query (exact kNN search with metadata join,
                 the /search_drawing lifecycle) at sf0.001.
queries()     -> every implemented operator from SURVEY.md §2, keyed by
                 name; callables (spark, sf_dir) -> DataFrame.
oracle_sql()  -> matching DuckDB ANSI-SQL strings (same column aliases;
                 queries without an entry get the rows-only check).

Implementation lives in cnc_visionsearch_spark/ — this module is a thin
facade over the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cnc_visionsearch_spark.registry import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: exact top-10 kNN + metadata join on sf0.001."""
    from cnc_visionsearch_spark.queries_vector import knn_search_with_metadata

    return knn_search_with_metadata(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
