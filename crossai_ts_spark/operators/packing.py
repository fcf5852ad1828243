"""Training-sequence packing — the concatenate-and-chop step between a
cleaned corpus and a training run (the public GPT-family recipe: documents
are concatenated in a deterministic order and sliced into fixed-length
token sequences; a doc may straddle a boundary).

Scale shape: a single global running sum over 10^12 docs would serialize
on one task, so the packing domain is a shard key (default ``source``) —
the cumulative sum runs per shard, all shards in parallel, which is how
production packers shard anyway (a pack never mixes shards). Within a
shard the order is doc_id (deterministic, engine-portable); the cumsum is
one ordered-window pass, everything else is integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(seqs: DataFrame, seq_len: int = 2048, by: str = "source") -> DataFrame:
    """Assign every doc its position in the packed token stream of its
    shard: (pack_id, pack_off) of the doc's first token, whether it
    straddles a pack boundary, and how many packs it touches.

    Columns out: doc_id, <by>, n_tok, cum_start, pack_id, pack_off,
    spans_packs (bool), n_packs_touched.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    w = Window.partitionBy(by).orderBy("doc_id")
    c = (
        seqs.select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.col(by),
            F.col("n_tok").cast("long").alias("n_tok"),
        )
        .filter(F.col("n_tok") > 0)
        .withColumn("cum_end", F.sum("n_tok").over(w))
        .withColumn("cum_start", F.col("cum_end") - F.col("n_tok"))
    )
    pack_id = F.floor(F.col("cum_start") / seq_len).cast("long")
    last_pack = F.floor((F.col("cum_end") - 1) / seq_len).cast("long")
    return c.select(
        "doc_id",
        by,
        "n_tok",
        "cum_start",
        pack_id.alias("pack_id"),
        (F.col("cum_start") % seq_len).cast("long").alias("pack_off"),
        (last_pack != pack_id).alias("spans_packs"),
        (last_pack - pack_id + 1).cast("long").alias("n_packs_touched"),
    )


def pack_summary(packed: DataFrame, seq_len: int = 2048, by: str = "source") -> DataFrame:
    """Per-pack inventory from :func:`pack_sequences` output: docs
    STARTING in each pack, tokens contributed by those docs, and the
    boundary-straddler count — the stats a packing run reports per shard.
    (The final pack of a shard is ragged; all earlier packs hold exactly
    seq_len tokens by construction, which callers can assert.)
    """
    return (
        packed.groupBy(by, "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("toks_started"),
            F.sum(F.col("spans_packs").cast("long")).alias("n_straddlers"),
        )
        .select(by, "pack_id", "n_docs", "toks_started", "n_straddlers")
    )
