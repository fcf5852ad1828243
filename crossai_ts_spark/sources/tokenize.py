"""documents -> input_hint sequences table.

Deterministic, engine-agnostic tokenization so a DuckDB oracle can compute
the identical table: tokens = Unicode code points of the text (the driver
corpus is pure ASCII — verified — so Spark's UTF-16 vs DuckDB's UTF-8
indexing agree). doc_id is cast to string per the input_hint schema.

This mirrors the reference's loader stage (caits/loading/_csv_read.py:69,
caits/loading/_dataset_loader.py:53): raw files -> ragged DatasetList; here:
documents table -> ragged token arrays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# per-character code points; requires ASCII (or at least BMP-only) text
TOKENS_EXPR = "transform(sequence(1, length(text)), i -> ascii(substring(text, i, 1)))"

# DuckDB equivalent used by oracle SQL (kept adjacent so they evolve together)
TOKENS_SQL_DUCKDB = "list_transform(range(1, length(text) + 1), i -> unicode(text[i]))"


def tokenize_documents(docs: DataFrame) -> DataFrame:
    """(doc_id, text, source, ...) -> (doc_id string, tokens, n_tok, source)."""
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.expr(TOKENS_EXPR).cast("array<int>").alias("tokens"),
        F.length("text").cast("int").alias("n_tok"),
        F.col("source"),
    ).filter(F.col("n_tok") > 0)
