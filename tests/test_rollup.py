"""Rollup + cascade vs the numpy oracle — bitwise equality per tier.

north_rule: every rolled-up point must bitwise-match the reference
implementation's expected rollups per retention tier.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from crossai_ts_spark.operators.rollup import (
    cascade_from_tier,
    cascade_native,
    cascade_pandas,
    full_windows_only,
    rollup_long,
    rollup_native,
)
from crossai_ts_spark.oracle.rollup import cascade_oracle, rollup_frame

KEY = ["doc_id", "tier", "window_start"]
W, FANOUT, TIERS = 64, 8, 3  # fanout 8 so tier3 (W*64=4096) is exercised by tiny docs


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    return pdf.sort_values(KEY).reset_index(drop=True)[
        ["doc_id", "source", "tier", "window_start", "t_min", "t_max", "t_sum", "t_cnt", "t_last", "t_mean"]
    ]


def assert_bitwise(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame):
    a, b = canon(spark_pdf), canon(oracle_pdf)
    assert len(a) == len(b), f"row count {len(a)} != {len(b)}"
    for c in ["doc_id", "source", "tier", "window_start", "t_min", "t_max", "t_sum", "t_cnt", "t_last"]:
        assert a[c].tolist() == b[c].tolist(), f"mismatch in {c}"
    # bitwise float comparison for the mean (the north_rule criterion)
    av = a["t_mean"].to_numpy().view(np.int64)
    bv = b["t_mean"].to_numpy().view(np.int64)
    assert (av == bv).all(), "t_mean not bitwise-identical"


def test_rollup_native_matches_oracle(spark, tiny_df, tiny_docs):
    got = rollup_native(tiny_df, w=W).toPandas()
    exp = rollup_frame(tiny_docs, W, tier=1)
    assert_bitwise(got, exp)


@pytest.mark.parametrize("strategy", ["native", "pandas"])
def test_cascade_matches_oracle(spark, tiny_df, tiny_docs, strategy):
    fn = cascade_native if strategy == "native" else cascade_pandas
    got = fn(tiny_df, w=W, fanout=FANOUT, tiers=TIERS).toPandas()
    exp = cascade_oracle(tiny_docs, w=W, fanout=FANOUT, tiers=TIERS)
    assert_bitwise(got, exp)


def test_cascade_from_tier_identity(spark, tiny_df, tiny_docs):
    """groupBy re-aggregation of tier1 == direct tier2 from raw (partial-agg identity)."""
    t1 = rollup_native(tiny_df, w=W, tier=1)
    t2 = cascade_from_tier(t1, from_tier=1, w=W, fanout=FANOUT).toPandas()
    exp = cascade_oracle(tiny_docs, w=W, fanout=FANOUT, tiers=2)
    assert_bitwise(t2, exp[exp.tier == 2])


def test_rollup_long_matches_native(spark, tiny_df):
    """Shuffle path == narrow path (partitioning invariance)."""
    from pyspark.sql import functions as F

    long_df = tiny_df.select(
        "doc_id", "source", F.posexplode("tokens").alias("offset", "value")
    ).select("doc_id", "source", F.col("offset").cast("long").alias("offset"), "value")
    got = rollup_long(long_df, w=W).toPandas()
    exp = rollup_native(tiny_df, w=W).toPandas()
    assert_bitwise(got, exp)


def test_partition_count_invariance(spark, tiny_df, tiny_docs):
    """Same bitwise result at 1 and 13 partitions (north_rule §4.3)."""
    exp = cascade_oracle(tiny_docs, w=W, fanout=FANOUT, tiers=TIERS)
    for n in (1, 13):
        got = cascade_native(tiny_df.repartition(n), w=W, fanout=FANOUT, tiers=TIERS).toPandas()
        assert_bitwise(got, exp)


def test_boundary_docs(spark, tiny_df):
    """FIXTURES F1 pinned docs: window counts at W=64."""
    got = rollup_native(tiny_df, w=64).toPandas()
    cnt = got.groupby("doc_id").size()
    assert cnt["doc-bnd-0000"] == 1  # n=1
    assert cnt["doc-bnd-0001"] == 1  # n=63 → one ragged window
    assert cnt["doc-bnd-0002"] == 1  # n=64 → exactly one
    assert cnt["doc-bnd-0003"] == 2  # n=65 → ragged tail kept
    assert cnt["doc-bnd-0004"] == 64  # n=4096
    tail = got[(got.doc_id == "doc-bnd-0003") & (got.window_start == 64)]
    assert tail.t_cnt.iloc[0] == 1


def test_full_windows_only_filter(spark, tiny_df):
    got = full_windows_only(rollup_native(tiny_df, w=64), w=64, fanout=FANOUT).toPandas()
    cnt = got.groupby("doc_id").size()
    assert "doc-bnd-0001" not in cnt.index  # n=63: no full window
    assert cnt["doc-bnd-0003"] == 1  # tail dropped


def test_rollup_histogram_counts_and_median(spark):
    import numpy as np

    from crossai_ts_spark.operators.rollup import histogram_merge, rollup_histogram

    rng = np.random.default_rng(9)
    toks = rng.integers(0, 1104, size=100, dtype=np.int32)
    df = spark.createDataFrame(
        [("d0", [int(t) for t in toks], 100, "s")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    w, nb, vmax = 32, 16, 1104
    got = rollup_histogram(df, w=w, n_buckets=nb, vmax=vmax).toPandas().set_index("window_start")
    assert sorted(got.index) == [0, 32, 64, 96]
    for ws in (0, 32, 64, 96):
        seg = toks[ws : ws + w]
        buckets = np.minimum(seg.astype(np.int64) * nb // vmax, nb - 1)
        counts = np.bincount(buckets, minlength=nb)
        assert [got.loc[ws, f"b{b}"] for b in range(nb)] == counts.tolist()
        assert got.loc[ws, "total"] == len(seg)
        # median_bucket = first bucket whose cumulative count reaches half
        cum = np.cumsum(counts)
        expect = int(np.argmax(cum * 2 >= len(seg)))
        assert got.loc[ws, "median_bucket"] == expect


def test_histogram_merge_equals_direct(spark):
    """Tier-2 histograms merged from tier-1 equal histograms computed
    directly from raw at the wider width — the exact re-aggregation
    identity that makes the sketch valid at every retention tier."""
    import numpy as np
    import pandas as pd

    from crossai_ts_spark.operators.rollup import histogram_merge, rollup_histogram

    rng = np.random.default_rng(11)
    rows = []
    for i, n in enumerate([257, 64, 100, 31]):
        toks = rng.integers(0, 1104, size=n, dtype=np.int32)
        rows.append((f"d{i}", [int(t) for t in toks], n, "s"))
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    )
    w, fanout = 16, 4
    t1 = rollup_histogram(df, w=w)
    merged = (
        histogram_merge(t1.drop("total", "median_bucket"), w=w, fanout=fanout)
        .toPandas().sort_values(["doc_id", "window_start"]).reset_index(drop=True)
    )
    direct = (
        rollup_histogram(df, w=w * fanout)
        .toPandas().sort_values(["doc_id", "window_start"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(merged, direct[merged.columns], check_dtype=False)


def test_histogram_wide_native_equals_pandas_and_numpy(spark):
    """ADVICE r5: the nb>16 single-pass native fold and the np.bincount
    Arrow twin were claimed count-identical but only exercised at nb=16.
    Assert full frame equality of rollup_histogram at nb=17 and nb=64
    (both sides of the adaptive crossover) against rollup_histogram_pandas
    AND an independent numpy recomputation, including ragged tails."""
    import numpy as np
    import pandas as pd

    from crossai_ts_spark.operators.rollup import (
        rollup_histogram,
        rollup_histogram_pandas,
    )

    rng = np.random.default_rng(23)
    rows = []
    for i, n in enumerate([257, 64, 100, 31, 1]):
        toks = rng.integers(0, 1104, size=n, dtype=np.int32)
        rows.append((f"d{i}", [int(t) for t in toks], n, "s"))
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    )
    w, vmax = 32, 1104
    for nb in (17, 64):
        cols = ["doc_id", "window_start"] + [f"b{b}" for b in range(nb)] + [
            "total", "median_bucket"
        ]
        native = (
            rollup_histogram(df, w=w, n_buckets=nb, vmax=vmax)
            .toPandas()[cols]
            .sort_values(["doc_id", "window_start"]).reset_index(drop=True)
        )
        arrow = (
            rollup_histogram_pandas(df, w=w, n_buckets=nb, vmax=vmax)
            .toPandas()[cols]
            .sort_values(["doc_id", "window_start"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(native, arrow, check_dtype=False)
        # independent numpy recomputation, window by window
        expect_rows = []
        for doc_id, toks, n, _src in rows:
            a = np.asarray(toks, dtype=np.int64)
            for ws in range(0, n, w):
                seg = a[ws : ws + w]
                counts = np.bincount(
                    np.minimum(seg * nb // vmax, nb - 1), minlength=nb
                )
                cum = np.cumsum(counts)
                expect_rows.append(
                    [doc_id, ws, *counts.tolist(), len(seg),
                     int(np.argmax(cum * 2 >= len(seg)))]
                )
        expect = (
            pd.DataFrame(expect_rows, columns=cols)
            .sort_values(["doc_id", "window_start"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(native, expect, check_dtype=False)


def test_hll_merge_identity_and_accuracy(spark):
    """Tier-2 sketches merged from tier-1 registers equal sketching the
    raw events at the coarse window directly (bitwise — the mergeability
    contract); the estimate lands within the ~13% standard error band of
    the true distinct count for a 500-distinct-key window."""
    import pandas as pd

    from crossai_ts_spark.operators.hll import (
        hll_estimate,
        hll_merge,
        hll_sketch,
    )

    from pyspark.sql import functions as F

    rows = []
    for i in range(4000):
        # 500 distinct users, heavy repetition, spread over 8 hours
        rows.append((i, f"2024-01-01 0{i % 8}:0{i % 6}:1{i % 5}", i * 37 % 500))
    ev = spark.createDataFrame(rows, "event_id long, ts_s string, user_id long").select(
        "event_id", F.to_timestamp("ts_s").alias("ts"), "user_id"
    )
    t1 = hll_sketch(ev, window_sec=3600)
    t2 = hll_merge(t1, fanout=4, window_sec=3600)
    direct = hll_sketch(ev, window_sec=14400)
    key = ["window_start", "reg"]
    a = t2.toPandas().sort_values(key).reset_index(drop=True)
    b = direct.toPandas().sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)

    # one coarse window holds users {0..499}: estimate within 3 sigma
    est = hll_estimate(direct).toPandas()
    w0 = est[est.window_start == est.window_start.min()].iloc[0]
    true = 500
    assert abs(w0.est_distinct - true) / true < 3 * 1.04 / (64 ** 0.5)
    # determinism: same input -> identical doubles
    est2 = hll_estimate(hll_sketch(ev, window_sec=14400)).toPandas()
    assert sorted(est.est_distinct) == sorted(est2.est_distinct)


def test_kmv_merge_identity_and_estimate(spark):
    """Bottom-k of a union == bottom-k of concatenated per-part bottom-ks
    (bitwise — the mergeability rule); the sketch IS the k smallest
    distinct hashes; estimate lands within a loose band of truth."""
    from pyspark.sql import functions as F

    from crossai_ts_spark.operators.hll import kmv_sketch

    rows = [(i, f"2024-01-01 00:{i % 50:02d}:00", i * 31 % 400) for i in range(3000)]
    ev = spark.createDataFrame(rows, "event_id long, ts_s string, user_id long").select(
        "event_id", F.to_timestamp("ts_s").alias("ts"), "user_id"
    )
    whole = kmv_sketch(ev, window_sec=3600, k=8).toPandas().iloc[0]

    # exactness of the sample: recompute the 8 smallest distinct hashes
    import hashlib

    hs = sorted({
        int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)
        for u in {r[2] for r in rows}
    })[:8]
    assert list(whole.ks) == hs

    # merge rule: split events, take per-half bottom-k, merge, compare
    h1 = kmv_sketch(ev.filter("event_id < 1500"), window_sec=3600, k=8).toPandas().iloc[0]
    h2 = kmv_sketch(ev.filter("event_id >= 1500"), window_sec=3600, k=8).toPandas().iloc[0]
    merged = sorted(set(list(h1.ks) + list(h2.ks)))[:8]
    assert merged == list(whole.ks)

    true_distinct = len({r[2] for r in rows})
    # k=8 has ~1/sqrt(k-2) ~ 40% sigma: only assert the right magnitude,
    # then check real accuracy at k=64 (~13% sigma, 3-sigma band)
    assert 0.2 < whole.n_distinct_est / true_distinct < 4
    wide = kmv_sketch(ev, window_sec=3600, k=64).toPandas().iloc[0]
    assert abs(wide.n_distinct_est - true_distinct) / true_distinct < 0.4


def test_kmv_prefilter_hot_window_boundedness(spark):
    """r6 scale fix (hll.py kmv_sketch): in a hot window (10^6 distinct
    keys) the HLL-derived candidate pre-filter bounds the rows entering
    any bottom-k aggregation buffer to O(candidate_factor * k) — not
    O(D/n_salts) — while the output stays bitwise equal to the
    unfiltered plan; a deliberately starved threshold (candidate_factor
    < 1) proves the exactness fallback recomputes cut-too-deep windows."""
    from pyspark.sql import functions as F

    from crossai_ts_spark.operators.hll import (
        _kmv_hashed,
        _kmv_thresholds,
        kmv_sketch,
    )

    k, c = 8, 64
    ev = spark.range(1_000_000).select(
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ts"),
        F.col("id").alias("user_id"),
    )
    e = _kmv_hashed(ev, "user_id", "ts", 3600)
    thr = _kmv_thresholds(e, k, c)
    trow = thr.toPandas().iloc[0]
    assert bool(trow.filtered)  # 10^6 >> c*k: the filter must engage
    n_cand = e.join(F.broadcast(thr), "window_start").filter("h < thr").count()
    # expected ~ c*k = 512 candidates (vs 10^6 unfiltered); 8x margin for
    # the HLL estimate's error band, and never fewer than k
    assert k <= n_cand <= 8 * c * k

    filtered = kmv_sketch(ev, window_sec=3600, k=k, n_salts=16).toPandas()
    plain = kmv_sketch(ev, window_sec=3600, k=k, n_salts=16, prefilter=False).toPandas()
    assert list(filtered.iloc[0].ks) == list(plain.iloc[0].ks)
    assert filtered.iloc[0].n_distinct_est == plain.iloc[0].n_distinct_est

    # starved threshold: expected <k survivors -> fallback path must
    # recompute the window unfiltered and still return the exact sketch
    thr_starved = _kmv_thresholds(e, k, 0.1)
    n_starved = e.join(F.broadcast(thr_starved), "window_start").filter("h < thr").count()
    assert n_starved < k
    starved = kmv_sketch(
        ev, window_sec=3600, k=k, n_salts=16, candidate_factor=0.1
    ).toPandas()
    assert list(starved.iloc[0].ks) == list(plain.iloc[0].ks)


def test_hll_kmv_xxhash64_production_path(spark):
    """The xxhash64 hash family (JVM-native, no hex-conv detour — the r6
    scale path) carries the same contracts as md5: <= 64 register rows
    per window, estimate within the ~13% standard-error band, KMV k-list
    ascending/distinct with its estimator in the same band, and the KMV
    pre-filter stays bitwise-identical to the unfiltered plan under the
    new family. The md5 default stays the oracle family."""
    import pandas as pd
    from pyspark.sql import functions as F

    from crossai_ts_spark.operators.hll import (
        M_REGS,
        hll_estimate,
        hll_sketch,
        kmv_sketch,
    )

    n_distinct = 500
    rows = [(i, "2024-01-01 05:00:01", i % n_distinct) for i in range(2000)]
    ev = spark.createDataFrame(rows, "event_id long, ts_s string, user_id long").select(
        "event_id", F.to_timestamp("ts_s").alias("ts"), "user_id"
    )
    sk = hll_sketch(ev, hash="xxhash64")
    spdf = sk.toPandas()
    assert len(spdf) <= M_REGS
    est = hll_estimate(sk).toPandas()
    assert len(est) == 1
    assert abs(est.est_distinct.iloc[0] - n_distinct) / n_distinct < 3 * 1.04 / 8.0

    km = kmv_sketch(ev, k=8, hash="xxhash64").toPandas()
    assert len(km) == 1
    ks = list(km.ks.iloc[0])
    assert ks == sorted(set(ks)) and len(ks) == 8
    assert abs(km.n_distinct_est.iloc[0] - n_distinct) / n_distinct < 0.75
    km2 = kmv_sketch(ev, k=8, hash="xxhash64", prefilter=False).toPandas()
    assert list(km2.ks.iloc[0]) == ks
    assert km2.n_distinct_est.iloc[0] == km.n_distinct_est.iloc[0]
