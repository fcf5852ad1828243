"""Temperature-mixing APPLICATION: deterministically subsample each source
to its temperature share of a token budget — the step after
`source_mixing_weights` computes the CC100/XLM-R multinomial shares
(n_tokens^alpha, upweighting low-resource shards): actually build the
mixed corpus.

Per-doc keep decision is a pure hash function — keep iff
md5_60(doc_id || ':mix') < floor(rate * 2^60) — so the sample is
reproducible across engines, runs, partitionings, and retries (no RNG
state anywhere), the property a resumable 100-TB pipeline needs. The
whole pass is one map-side-combined stats aggregate, a broadcast of the
per-source thresholds (8 rows), and a narrow filter: raw docs never
shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_Q60 = 1152921504606846976.0  # 2^60, exact in a double


def _mix_hash(doc_id_col):
    """60-bit md5 of doc_id on the ':mix' channel (bloom/hll hash family)."""
    return F.conv(
        F.substring(
            F.md5(F.concat(doc_id_col.cast("string"), F.lit(":mix")).cast("binary")), 1, 15
        ),
        16,
        10,
    ).cast("long")


def mixing_thresholds(
    docs: DataFrame, target_tokens, alpha_q: str = "0.7", text: str = "text"
) -> DataFrame:
    """Per-source keep thresholds: rate_s = min(1, T * share_s / n_tokens_s)
    with share_s from the quantized n_tokens^alpha weights (the exact
    recipe of the source_mixing_weights query), thr_s = floor(rate * 2^60).
    ``target_tokens`` may be a Column (e.g. half the corpus) or an int."""
    d = docs.filter(F.length(text) > 0)
    s = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length(text)).cast("long").alias("n_tokens"),
    )
    p = s.withColumn(
        "w_q",
        F.floor(
            F.pow(F.col("n_tokens").cast("double"), F.expr(f"cast({alpha_q} as double)"))
            * F.lit(1048576.0)
        ).cast("long"),
    )
    g = p.agg(
        F.sum("w_q").alias("_tot"), F.sum("n_tokens").alias("_all_tok")
    )
    t = (
        F.lit(float(target_tokens))
        if isinstance(target_tokens, (int, float))
        else target_tokens
    )
    rate = F.least(
        F.lit(1.0),
        (t * (F.col("w_q").cast("double") / F.col("_tot").cast("double")))
        / F.col("n_tokens").cast("double"),
    )
    return p.crossJoin(F.broadcast(g)).select(
        "source",
        "n_docs",
        "n_tokens",
        "w_q",
        F.floor(rate * F.lit(_Q60)).cast("long").alias("thr"),
    )


def apply_mixing(
    docs: DataFrame, target_tokens, alpha_q: str = "0.7", text: str = "text"
) -> DataFrame:
    """The mixed corpus: docs whose hash clears their source's threshold.
    Expected kept tokens per source ~ min(n_tokens, T * share) without any
    global coordination; rerunning (or resuming) keeps EXACTLY the same
    docs."""
    thr = mixing_thresholds(docs, target_tokens, alpha_q, text).select("source", "thr")
    d = docs.filter(F.length(text) > 0).withColumn("_h", _mix_hash(F.col("doc_id")))
    return (
        d.join(F.broadcast(thr), "source")
        .filter(F.col("_h") < F.col("thr"))
        .drop("_h", "thr")
    )
