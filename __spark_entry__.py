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

# Driver CORRECTNESS coverage rotation: the driver checks a bounded prefix
# (~50) of queries() per round, so iteration order is
# least-recently-driver-checked first:
#   1. never-checked (new this round), in registry order
#   2. queries whose latest green driver row is r02 (stale — round-3 code
#      changes touched shared plan code under several of them)
#   3. queries checked in r03 (freshest), last.
# Keep this updated each round from CORRECTNESS_r{N}.json key sets.
_CHECKED_R02_ONLY = [
    "gapfill_locf", "gapfill_linear", "islands", "islands_duration",
    "interval_iou", "sessionization", "rolling_rms", "zcr_user",
    "dominant_minute", "stats_composite", "moments", "outlier_zscore",
    "outlier_iqr", "correlation", "tpch_q1_exact", "topk_per_group",
    "anti_join_split", "union_distinct", "embedding_norms",
    "ann_cosine_topk", "simhash", "dedup_canonical", "token_counts",
    "quality_scores", "lang_id", "augment_reverse_polarity",
    "augment_gain_noise", "db_scaling", "normalize_signal",
    "label_encode", "entropy_per_user", "detection_metrics", "lsh_ann",
]

_CHECKED_R03 = [
    "dedup_clusters", "repetition_scores", "mfcc_stats",
    "embedding_near_dups", "ivf_ann", "spearman_correlation",
    "high_corr_pairs", "butterworth_sosfilt", "cubic_spline_interp",
    "event_classification", "ep3_pipeline", "rolling_composites",
    "compression_ratio", "augment_pool_quantize", "augment_crop_resize",
    "augment_drift", "augment_dropout", "augment_timewarp_stretch",
    "pcen_hpss", "resample_polyphase", "lm_perplexity",
    "bloom_prune_orders", "session_window_native", "json_props_stats",
    "asof_join_events", "resample_fir_exact", "find_peaks_minutes",
    "stratified_split", "shuffle_ranks", "rolling_window_hann",
    "kendall_tau", "eepd_counts", "augment_convolve",
    "spectral_features", "dsp_features", "codec_roundtrip",
    "compressed_tiers", "minhash_lsh", "ngram_jaccard",
    "tokenize_stats", "rollup_tier1", "rollup_tier2_cascade",
    "rollup_source_windows", "trim_signal", "chunks", "sliding_windows",
    "resample_zoh", "fingerprint", "token_quality", "dedup_exact",
]


def _ordered_names() -> list[str]:
    checked = set(_CHECKED_R02_ONLY) | set(_CHECKED_R03)
    fresh = [n for n in REGISTRY if n not in checked]
    stale = [n for n in _CHECKED_R02_ONLY if n in REGISTRY]
    newest = [n for n in _CHECKED_R03 if n in REGISTRY]
    return fresh + stale + newest


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: tokenize sf0.001 documents -> 3-tier retention cascade."""
    from crossai_ts_spark.operators.rollup import cascade_native
    from crossai_ts_spark.sources.tokenize import tokenize_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    seqs = tokenize_documents(docs)
    return cascade_native(seqs, w=32, fanout=8, tiers=3)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: REGISTRY[name][0] for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {
        name: REGISTRY[name][1]
        for name in _ordered_names()
        if REGISTRY[name][1] is not None
    }
