"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over crossai_ts_spark.entry_queries.REGISTRY: each implemented
operator from SURVEY.md §2 is exposed as a (spark_fn, duckdb_oracle_sql)
pair; entries without SQL get the driver's weaker rows-only check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from crossai_ts_spark.entry_queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: tokenize sf0.001 documents -> 3-tier retention cascade."""
    from crossai_ts_spark.operators.rollup import cascade_native
    from crossai_ts_spark.sources.tokenize import tokenize_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    seqs = tokenize_documents(docs)
    return cascade_native(seqs, w=32, fanout=8, tiers=3)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
