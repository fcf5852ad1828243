"""Deterministic synthetic sequences table (FIXTURES.md F1/F2).

Pure function of (seed, n_docs): every doc's tokens are regenerable on any
executor from ``np.random.default_rng([seed, i])`` — so the generator is a
distributed *source* (spark.range → mapInPandas), no external data and no
driver-side materialization. Boundary docs (doc-bnd-*) and gap docs
(doc-gap-*) from FIXTURES.md are pinned at the head of the id space.

Distribution (F1):
  n_tok  : 80% U[64, 2048], 15% U[2048, 16384], 5% U[16384, 65536]
  source : Zipf(alpha=1.2) over 8 sources (deliberately skewed → salting tests)
  tokens : U[0, 50257) int32
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schema import SEQUENCES_SCHEMA

VOCAB = 50257
SOURCES = ["web", "books", "code", "wiki", "forums", "papers", "news", "chat"]
ZIPF_ALPHA = 1.2

# pinned boundary docs: (suffix, n_tok) — FIXTURES.md F1, W=64 tiers 64/4096/262144
BOUNDARY_DOCS = [
    ("doc-bnd-0000", 1),
    ("doc-bnd-0001", 63),
    ("doc-bnd-0002", 64),
    ("doc-bnd-0003", 65),
    ("doc-bnd-0004", 4096),
    ("doc-bnd-0005", 65536),
]

_SOURCE_P = np.array([1.0 / (k + 1) ** ZIPF_ALPHA for k in range(len(SOURCES))])
_SOURCE_P /= _SOURCE_P.sum()


def _doc(seed: int, i: int, max_tok: int | None) -> tuple[str, np.ndarray, str]:
    """Deterministically generate doc i. Boundary docs occupy i < len(BOUNDARY_DOCS)."""
    rng = np.random.default_rng([seed, i])
    if i < len(BOUNDARY_DOCS):
        doc_id, n_tok = BOUNDARY_DOCS[i]
    else:
        doc_id = f"doc-{i:08d}"
        u = rng.random()
        if u < 0.80:
            n_tok = int(rng.integers(64, 2048))
        elif u < 0.95:
            n_tok = int(rng.integers(2048, 16384))
        else:
            n_tok = int(rng.integers(16384, 65536))
    if max_tok is not None and i >= len(BOUNDARY_DOCS):
        n_tok = min(n_tok, max_tok)
    tokens = rng.integers(0, VOCAB, size=n_tok, dtype=np.int32)
    source = SOURCES[int(rng.choice(len(SOURCES), p=_SOURCE_P))]
    return doc_id, tokens, source


def gen_local(seed: int = 42, n_docs: int = 100, max_tok: int | None = None) -> pd.DataFrame:
    """Driver-side generation (tests, oracle input)."""
    rows = []
    for i in range(n_docs):
        doc_id, tokens, source = _doc(seed, i, max_tok)
        rows.append((doc_id, tokens, np.int32(len(tokens)), source))
    return pd.DataFrame(rows, columns=["doc_id", "tokens", "n_tok", "source"])


def gen_sequences(
    spark: SparkSession,
    n_docs: int = 5000,
    seed: int = 42,
    max_tok: int | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed generation: spark.range(n_docs) → mapInPandas.

    Each task regenerates only its own ids; nothing is collected to the
    driver. Scales to any n_docs (the 10^12-design-point stand-in).
    """
    if partitions is None:
        partitions = max(8, math.ceil(n_docs / 2000))

    def make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_doc(seed, int(i), max_tok) for i in pdf["id"]]
            yield pd.DataFrame(
                {
                    "doc_id": [r[0] for r in rows],
                    "tokens": [r[1] for r in rows],
                    "n_tok": np.array([len(r[1]) for r in rows], dtype=np.int32),
                    "source": [r[2] for r in rows],
                }
            )

    return (
        spark.range(0, n_docs, numPartitions=partitions)
        .mapInPandas(make, schema=SEQUENCES_SCHEMA)
    )


# ---------------------------------------------------------------- gapped (F2)

GAP_DOCS = {
    # doc suffix -> (n_tok, gap offsets builder)
    "doc-gap-0000": (512, lambda n: np.arange(0, 10)),              # leading gap
    "doc-gap-0001": (512, lambda n: np.arange(100, 200)),           # interior run
    "doc-gap-0002": (512, lambda n: np.arange(n - 10, n)),          # trailing gap
    "doc-gap-0003": (512, lambda n: np.arange(1, n, 2)),            # alternating
}


def gen_gapped_local(seed: int = 42, n_docs: int = 20, drop_frac: float = 0.10) -> pd.DataFrame:
    """Long-format gapped series: (doc_id, offset:int64, value:int32).

    Pinned gap docs first, then random docs with drop_frac offsets removed.
    """
    rows: list[pd.DataFrame] = []
    for j, (doc_id, (n_tok, gaps)) in enumerate(sorted(GAP_DOCS.items())):
        rng = np.random.default_rng([seed, 10_000 + j])
        vals = rng.integers(0, VOCAB, size=n_tok, dtype=np.int32)
        keep = np.setdiff1d(np.arange(n_tok), gaps(n_tok))
        rows.append(pd.DataFrame({"doc_id": doc_id, "offset": keep.astype(np.int64), "value": vals[keep]}))
    for i in range(n_docs):
        rng = np.random.default_rng([seed, 20_000 + i])
        n_tok = int(rng.integers(64, 1024))
        vals = rng.integers(0, VOCAB, size=n_tok, dtype=np.int32)
        drop = rng.random(n_tok) < drop_frac
        keep = np.where(~drop)[0]
        rows.append(
            pd.DataFrame({"doc_id": f"doc-gapped-{i:06d}", "offset": keep.astype(np.int64), "value": vals[keep]})
        )
    return pd.concat(rows, ignore_index=True)


def gapped_to_spark(spark: SparkSession, pdf: pd.DataFrame) -> DataFrame:
    df = spark.createDataFrame(pdf)
    return df.select(
        F.col("doc_id"),
        F.col("offset").cast("long").alias("offset"),
        F.col("value").cast("int").alias("value"),
    )
