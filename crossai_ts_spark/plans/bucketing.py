"""Bucketed tier storage for shuffle-free co-located joins.

At the 10^12-sequence design point the recurring joins are all on doc_id
(tier lineage verification, decode-vs-original audits, incremental
re-aggregation of new arrivals against stored tiers). Writing tiers
``bucketBy(doc_id)`` pins each doc's rows to a deterministic file bucket,
so a join between two tables bucketed the same way needs NO exchange on
either side — Catalyst recognizes the co-partitioning (verified by the
plan assertion in tests/test_checkpoint_salted.py).

Bucket count guidance: buckets >= max executor slots you'll ever join
with, and sized so one bucket's rows fit an executor (tier rows are tiny:
~64 B/row, so 1024 buckets carry ~10^12/1024 ≈ 10^9 rows ≈ 64 GB per
bucket of TIER-1 — pick 8192+ at full scale; the parameter is free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, n_buckets: int = 8, key: str = "doc_id") -> None:
    """Persist to the session catalog bucketed+sorted by the join key."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, key: str = "doc_id"):
    """Join two same-bucketed tables — zero exchanges when bucket specs
    match (the test asserts the physical plan)."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, key)
