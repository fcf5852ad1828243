"""Streaming tier-1 rollup: sequences arriving as a stream -> window rows.

The reference has no streaming surface (SURVEY §2.9); this maps the same
tumbling semantics onto Structured Streaming so the engine can ingest
continuously at the 10^12 design point:

  * per-doc tier-1 windows stay NARROW even in streaming (the token array
    arrives whole in one row, so the rollup is a stateless projection —
    no watermark/state needed; this is the same shuffle-free property as
    the batch path).
  * cross-doc per-source continuous aggregates are the stateful part:
    groupBy(window(ingest_ts), source) with a watermark for late data.

Local smoke: parquet-dir source -> memory sink -> processAllAvailable().
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.rollup import rollup_native
from ..schema import SEQUENCES_SCHEMA


def read_sequence_stream(spark, path: str, max_files: int = 4) -> DataFrame:
    return (
        spark.readStream.schema(SEQUENCES_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def streaming_tier1(stream: DataFrame, w: int = 64) -> DataFrame:
    """Stateless per-doc rollup — identical results to the batch engine."""
    return rollup_native(stream, w=w)


def streaming_source_counts(stream: DataFrame, ingest_col: str = "ingest_ts") -> DataFrame:
    """Stateful per-source windowed counts with late-data watermark."""
    s = stream.withColumn(ingest_col, F.current_timestamp())
    return (
        s.withWatermark(ingest_col, "10 seconds")
        .groupBy(F.window(F.col(ingest_col), "5 seconds"), "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("n_tok").cast("long")).alias("n_tokens"),
        )
    )


def run_to_memory(df: DataFrame, name: str):
    """Drive a bounded stream to completion synchronously (tests)."""
    q = (
        df.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return q
