"""Signal augmentation natives (caits/augmentation/_augment_1d.py).

Where the reference uses np.random, we use HASH-DERIVED noise
(md5(doc_id, offset) -> uniform int) so augmented outputs are
deterministic, partitioning-invariant, AND reproducible in any engine —
seeds become part of the data contract instead of runtime state.
`F.rand(seed)` is only row-order-stable, not cross-engine; the hash route
is both.

  polarity_inversion  :48  -> tokens * -1
  random_gain         :29  -> tokens * g, g from hash-uniform [lo, hi)
  add_white_noise     :12  -> tokens + k * (hash-uniform - 0.5)
  reverse_ts          :553 -> reverse(tokens)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (md5 of "<doc_id>:<i>") first 8 hex chars -> uniform bigint in [0, 2^32)
_HASH_U32 = "conv(substring(md5(cast(concat({key}, ':', {i}) as binary)), 1, 8), 16, 10)"


def polarity_inversion(df: DataFrame) -> DataFrame:
    return df.withColumn("tokens_aug", F.expr("transform(tokens, x -> -x)"))


def reverse_ts(df: DataFrame) -> DataFrame:
    return df.withColumn("tokens_aug", F.reverse("tokens"))


def random_gain(df: DataFrame, lo: float = 0.8, hi: float = 1.2) -> DataFrame:
    """One gain per doc from the doc_id hash; output float array."""
    u = _HASH_U32.format(key="doc_id", i="0")
    gain = f"({lo} + ({u} / 4294967296.0) * ({hi} - {lo}))"
    return df.withColumn(
        "tokens_aug", F.expr(f"transform(tokens, x -> cast(x as double) * {gain})")
    ).withColumn("gain", F.expr(gain))


def add_white_noise(df: DataFrame, k: float = 10.0) -> DataFrame:
    """Per-sample hash-uniform noise in [-k/2, k/2); output float array."""
    u = _HASH_U32.format(key="doc_id", i="i")
    return df.withColumn(
        "tokens_aug",
        F.expr(
            f"transform(tokens, (x, i) -> cast(x as double) + {k} * ({u} / 4294967296.0 - 0.5))"
        ),
    )
