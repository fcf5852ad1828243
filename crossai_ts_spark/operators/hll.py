"""Mergeable distinct-count sketch rollup (HyperLogLog, Flajolet et al.
2007) — COUNT DISTINCT as a continuous aggregate: exact distincts don't
re-aggregate (|A ∪ B| ≠ |A| + |B|), but HLL register vectors merge with
elementwise MAX, so a retention cascade can serve "distinct users per
hour/day/week" from sketches the same way min/max/sum tiers serve range
stats. The classic streaming/OLAP move (Druid/ClickHouse/BigQuery all
ship it); here it is built engine-portably so the whole sketch — not
just the estimate — carries a FULL DuckDB oracle.

Determinism contract (the bloom.py recipe): the hash is a 60-bit integer
from 15 hex chars of md5 (identical in any engine), register = h mod m,
and the rank is TRAILING-zeros-of-payload + 1 computed with pure integer
ops — lowbit = p & -p, rank = length(bin(lowbit)) — no log2/pow whose
last ulp could differ across libms. The estimator's 2^-M terms are
exact powers of two built by integer shift then divided, and the
register fold runs in sorted register order, so even the double-typed
estimate is bitwise reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

M_REGS = 64  # 2^6 registers; standard error 1.04/sqrt(64) ~ 13%
_MAX_RANK = 55  # payload is 60 - 6 = 54 bits; all-zero payload -> 55
_ALPHA = "0.709"  # alpha_64 (Flajolet et al. 2007, m = 64)


def _hash60(key_col, hash: str = "md5"):
    """Uniform 60-bit key hash.

    ``md5`` (default): 15 hex chars of md5 — engine-portable, the family
    every DuckDB oracle reproduces bitwise, at the cost of a hex-string
    conv per event. ``xxhash64``: the JVM-native seeded hash folded into
    [0, 2^60) by pmod — 2^64 is an exact multiple of 2^60, so the fold
    is perfectly uniform; measured ~3x the md5 throughput at 255 M
    events (BENCH/BASELINE.md round-6). Same estimator guarantees;
    sketches are Spark-reproducible only, so production pipelines use it
    and the oracle queries keep md5."""
    if hash == "md5":
        return F.conv(
            F.substring(F.md5(key_col.cast("string").cast("binary")), 1, 15), 16, 10
        ).cast("long")
    if hash == "xxhash64":
        return F.pmod(F.xxhash64(key_col.cast("string")), F.lit(1 << 60))
    raise ValueError(f"unknown hash {hash!r}")


def hll_sketch(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    window_sec: int = 3600,
    hash: str = "md5",
) -> DataFrame:
    """Tier-1 sketches: (window_start, reg, M) — max rank per register per
    tumbling window. One map-side-combined groupBy; rows per window are
    capped at m=64 regardless of event volume. ``hash`` picks the key
    hash family (see :func:`_hash60`)."""
    h = _hash60(F.col(key), hash)
    e = events.select(
        (
            (F.unix_timestamp(F.col(ts)).cast("long") / window_sec).cast("long")
            * window_sec
        ).alias("window_start"),
        h.alias("h"),
    )
    return _reg_rank_fold(e, "window_start")


def _reg_rank_fold(e: DataFrame, *group_cols: str) -> DataFrame:
    """(group_cols..., reg, M) from a projection carrying an ``h`` 60-bit
    hash column: register = h mod m, rank = trailing-zeros-of-payload + 1
    via pure integer ops (lowbit = p & -p; rank = length(bin(lowbit))),
    folded by an incremental groupBy MAX. Shared verbatim by the batch
    sketch and the native streaming twin so their registers are bitwise
    one plan."""
    r = e.select(
        *group_cols,
        (F.col("h") % M_REGS).cast("long").alias("reg"),
        F.expr(f"h div {M_REGS}").alias("p"),
    )
    rank = F.when(F.col("p") == 0, F.lit(_MAX_RANK)).otherwise(
        F.length(F.bin(F.expr("p & -p")))
    )
    return (
        r.select(*group_cols, "reg", rank.cast("long").alias("rank"))
        .groupBy(*group_cols, "reg")
        .agg(F.max("rank").alias("M"))
    )


def hll_merge(sketch: DataFrame, fanout: int, window_sec: int = 3600) -> DataFrame:
    """Tier k+1 sketches from tier k: elementwise register MAX per parent
    window — the exact re-aggregation identity (equals sketching the raw
    events at the coarser window directly; tested bitwise)."""
    parent = window_sec * fanout
    ws = F.expr(f"window_start div {parent} * {parent}").alias("window_start")
    return sketch.groupBy(ws, "reg").agg(F.max("M").alias("M"))


def hll_estimate(sketch: DataFrame) -> DataFrame:
    """Per-window raw HLL estimate + empty-register count.

    est = alpha_m * m^2 / (sum_j 2^-M_j) with the sum folded in register
    order (sorted struct array) and empty registers appended as
    (m - present) * 2^-0 — every double op deterministic, so the oracle
    matches the estimate bitwise, not just approximately. The raw
    estimator is emitted (v_empty lets callers apply the linear-counting
    small-range correction, whose ln() would not be cross-engine exact).
    """
    per = sketch.groupBy("window_start").agg(
        F.sort_array(F.collect_list(F.struct("reg", "M"))).alias("rm")
    )
    s = F.expr(
        "aggregate(rm, cast(0.0 as double), (acc, x) -> "
        "acc + cast(1.0 as double) / cast(shiftleft(cast(1 as bigint), x.M) as double))"
        f" + cast({M_REGS} - size(rm) as double)"
    )
    est = F.expr(f"cast('{_ALPHA}' as double) * cast({M_REGS * M_REGS} as double)") / s
    return per.select(
        "window_start",
        (F.lit(M_REGS) - F.size("rm")).cast("long").alias("v_empty"),
        est.alias("est_distinct"),
    )


def hll_rollup(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    window_sec: int = 3600,
    fanout: int = 4,
) -> DataFrame:
    """Two-tier distinct-user rollup: tier 1 at window_sec, tier 2 merged
    from tier 1 registers (never from raw events). Output:
    (tier, window_start, v_empty, est_distinct)."""
    t1 = hll_sketch(events, key, ts, window_sec)
    t2 = hll_merge(t1, fanout, window_sec)
    e1 = hll_estimate(t1).select(F.lit(1).cast("int").alias("tier"), "*")
    e2 = hll_estimate(t2).select(F.lit(2).cast("int").alias("tier"), "*")
    return e1.unionByName(e2)


_H60 = 1152921504606846976  # 2^60; key hashes are uniform on [0, 2^60)


def _kmv_hashed(events: DataFrame, key: str, ts: str, window_sec: int,
                hash: str = "md5") -> DataFrame:
    """(window_start, h) projection shared by every KMV phase — the same
    60-bit hash family as the HLL sketch above (:func:`_hash60`)."""
    h = _hash60(F.col(key), hash)
    return events.select(
        (
            (F.unix_timestamp(F.col(ts)).cast("long") / window_sec).cast("long")
            * window_sec
        ).alias("window_start"),
        h.alias("h"),
    )


def _kmv_thresholds(e: DataFrame, k: int, candidate_factor: float) -> DataFrame:
    """Per-window candidate-hash threshold from a cheap HLL distinct
    estimate: the true bottom-k hashes of a window with D distinct keys
    all lie below ~k/D * 2^60 in expectation, so `thr = c*k/D_est * 2^60`
    (c = candidate_factor) keeps ~c*k candidate hashes per window — O(k)
    state — regardless of whether D is 10^3 or 10^9. The HLL pass itself
    is bounded (64 registers per window before its shuffle). Windows whose
    estimate is already <= c*k get thr = 2^60, i.e. no filtering.
    Output: (window_start, thr, filtered)."""
    regs = e.select(
        "window_start",
        (F.col("h") % M_REGS).cast("long").alias("reg"),
        F.expr(f"h div {M_REGS}").alias("p"),
    )
    rank = F.when(F.col("p") == 0, F.lit(_MAX_RANK)).otherwise(
        F.length(F.bin(F.expr("p & -p")))
    )
    sk = (
        regs.select("window_start", "reg", rank.cast("long").alias("M"))
        .groupBy("window_start", "reg")
        .agg(F.max("M").alias("M"))
    )
    ck = float(candidate_factor * k)
    t = hll_estimate(sk).select(
        "window_start",
        F.when(F.col("est_distinct") <= F.lit(ck), F.lit(_H60).cast("long"))
        .otherwise(
            F.ceil(F.lit(ck) * F.lit(float(_H60)) / F.col("est_distinct")).cast("long")
        )
        .alias("thr"),
    )
    return t.withColumn("filtered", F.col("thr") < F.lit(_H60))


def _kmv_bottom_k(e: DataFrame, k: int, n_salts: int) -> DataFrame:
    """Two-phase exact bottom-k of distinct hashes per window: per
    (window, salt = h mod n_salts) partial bottom-ks (equal keys share a
    salt, so per-shard distinct sets union to the global distinct set
    exactly), then one merge of n_salts k-length lists per window — no
    reducer ever materializes a whole window's key set."""
    e2 = e.withColumn("_salt", F.pmod(F.col("h"), F.lit(n_salts)).cast("int"))
    partial = e2.groupBy("window_start", "_salt").agg(
        F.slice(F.sort_array(F.collect_set("h")), 1, k).alias("pk")
    )
    return partial.groupBy("window_start").agg(
        F.slice(F.sort_array(F.flatten(F.collect_list("pk"))), 1, k).alias("ks")
    )


def kmv_sketch(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    window_sec: int = 3600,
    k: int = 8,
    n_salts: int = 16,
    candidate_factor: float = 64.0,
    prefilter: bool = True,
    hash: str = "md5",
) -> DataFrame:
    """Bottom-k (KMV) sketch per tumbling window: the k smallest distinct
    60-bit key hashes — simultaneously a MERGEABLE uniform sample of the
    window's distinct keys (min-hash sampling: the bottom-k of a hash
    order is a uniform draw without replacement) and a second distinct
    estimator, (k-1) / (h_k / 2^60) (Bar-Yossef et al. 2002), cross-
    checking HLL. Merge rule: bottom-k of a union = bottom-k of the
    concatenated per-part bottom-ks (tested bitwise) — so per-day
    sketches roll up to weeks like every other tier.

    Scale shape (three bounded passes over the narrow (ts, key)
    projection, never an unbounded buffer):

    1. HLL threshold pass (`_kmv_thresholds`): per-window distinct
       estimate from 64-register state; thr = candidate_factor * k /
       D_est * 2^60, broadcast back (one row per window).
    2. Candidate pass: `h < thr` keeps ~candidate_factor * k hashes per
       window before any aggregation buffer — a window with 10^9 distinct
       keys contributes ~512 candidates at the defaults, not 10^9 (the
       pre-r6 version collect_set the full ~D/n_salts per-shard distinct
       set). The surviving candidates run the exact two-phase salted
       bottom-k (`_kmv_bottom_k`), still salted so even a pathological
       estimate only concentrates ~c*k/n_salts rows per buffer.
    3. Exactness fallback (statistically ~never taken): a filtered window
       yielding fewer than k survivors proves the threshold cut too deep
       (if >= k distinct hashes lie below thr, the true bottom-k all do),
       so exactly those windows — joined as a broadcast, which AQE prunes
       to an empty relation when no window is bad — are recomputed
       unfiltered. Output is therefore BITWISE identical to the
       unfiltered plan unconditionally, not just with high probability.

    Output: (window_start, ks array<long> ascending, n_distinct_est).
    `prefilter=False` restores the single-pass two-phase plan (used by
    the boundedness parity test).

    STORAGE CONTRACT (ADVICE r7): with ``prefilter=True`` this operator
    persists two intermediates (the hashed projection and the per-window
    threshold) and registers them with ``crossai_ts_spark.caching``.
    Callers that issue repeated kmv_sketch queries in one application
    should call ``caching.release_tracked()`` after each consuming
    action — otherwise the pinned executor storage (and the tracked
    list) accumulate for the application lifetime.
    """
    e = _kmv_hashed(events, key, ts, window_sec, hash)
    if not prefilter:
        merged = _kmv_bottom_k(e, k, n_salts)
    else:
        # The hashed projection feeds THREE passes (HLL threshold,
        # candidate filter, fallback redo) and `thr` feeds two joins —
        # without persists the md5+conv projection recomputes per pass
        # and the 64-register HLL aggregation runs twice (r6 verdict
        # What's-wrong #2), and agreement across recomputes silently
        # assumes a deterministic source. Persist both: `e` is the
        # narrow 16-byte/event projection (MEMORY_AND_DISK spills, and a
        # production pipeline would land it as a table between passes);
        # `thr` is one row per window. Tracked so harnesses release
        # storage between queries (caching.release_tracked).
        from pyspark.storagelevel import StorageLevel

        from ..caching import tracked_persist

        e = tracked_persist(e, StorageLevel.MEMORY_AND_DISK)
        thr = tracked_persist(
            _kmv_thresholds(e, k, candidate_factor),
            StorageLevel.MEMORY_AND_DISK,
        )
        cand = (
            e.join(F.broadcast(thr), "window_start")
            .filter(F.col("h") < F.col("thr"))
            .select("window_start", "h")
        )
        mf = _kmv_bottom_k(cand, k, n_salts)
        j = thr.join(mf, "window_start", "left")
        short = F.col("ks").isNull() | (F.size("ks") < k)
        good = j.filter(~(F.col("filtered") & short)).select("window_start", "ks")
        bad = j.filter(F.col("filtered") & short).select("window_start")
        redo = _kmv_bottom_k(e.join(F.broadcast(bad), "window_start"), k, n_salts)
        merged = good.unionByName(redo)
    kth = F.element_at("ks", k)
    est = F.when(
        F.size("ks") < k, F.size("ks").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) / (kth.cast("double") / F.lit(float(_H60)))
    )
    return merged.select("window_start", "ks", est.alias("n_distinct_est"))
