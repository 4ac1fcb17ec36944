"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query: end-to-end KG construction (turns →
                extraction → canonical triples) on sf0.001.
queries()     — one entry per implemented operator (SURVEY.md §2), each
                (spark, sf_dir) -> DataFrame.
oracle_sql()  — DuckDB twin per query for the correctness gate.

Implementation lives in dygiepp_spark.registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dygiepp_spark.registry import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: deduplicated canonical (subj, pred, obj) triples for the
    whole sf0.001 transcript corpus."""
    return QUERIES["canonical_triples"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.build for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.sql for name, spec in QUERIES.items() if spec.sql is not None}
