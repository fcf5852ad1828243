"""Gap-fill: dense spine generation + LOCF / linear interpolation.

Spark-first shape:
  * The spine is GENERATED per doc (``sequence(0, n-1)`` + explode) and
    left-joined to observations — but because both sides are keyed by
    doc_id, we avoid the join entirely in the common case: observations are
    re-attached to the spine with a single ``Window.partitionBy(doc_id)``
    pass (one shuffle on doc_id, then O(n) window functions, all JVM-side).
  * LOCF  = ``last(value, ignorenulls=True) over (unbounded preceding, 0)``
    — the zero-order-hold of caits/core/_core_resample.py:45-54.
  * linear = prev/next anchor windows + the exact expression
    ``prev + (next-prev)/(next_off-prev_off) * (off-prev_off)`` in float64,
    matching oracle/gapfill.py bitwise (np.interp semantics,
    caits/preprocessing.py:55: backfill head, carry tail).

At 100 TB the shuffle on doc_id is unavoidable for long-format input (the
data arrives keyed by sample); skew is bounded because a doc caps at 64 Ki
samples — `repartitionByRange(doc_id)` + AQE handles the source-level skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def make_spine(doc_lengths: DataFrame, step: int = 1) -> DataFrame:
    """(doc_id, n) -> dense (doc_id, offset) spine, offsets 0..n-1 by step.

    explode(sequence(...)) is a narrow generator — no shuffle, no driver data.
    """
    return doc_lengths.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0).cast("long"), F.col("n").cast("long") - 1, F.lit(step).cast("long"))).alias(
            "offset"
        ),
    )


def _with_spine(observed: DataFrame, spine: DataFrame, value: str) -> DataFrame:
    """Left-join observations onto the spine (doc_id, offset)."""
    return spine.join(observed.select("doc_id", "offset", value), ["doc_id", "offset"], "left")


def gapfill_locf(observed: DataFrame, spine: DataFrame, value: str = "value") -> DataFrame:
    """Dense series with last-observation-carried-forward.

    Leading gap stays null (no anchor) — the documented contract of
    oracle/gapfill.py. Output: (doc_id, offset, filled double).
    """
    df = _with_spine(observed, spine, value)
    w = Window.partitionBy("doc_id").orderBy("offset").rowsBetween(Window.unboundedPreceding, 0)
    return df.select(
        "doc_id",
        "offset",
        F.last(F.col(value).cast("double"), ignorenulls=True).over(w).alias("filled"),
    )


def gapfill_linear(observed: DataFrame, spine: DataFrame, value: str = "value") -> DataFrame:
    """Dense series with linear interpolation between anchors.

    np.interp edge semantics: backfill before first anchor, carry after
    last. Expression order mirrors oracle/gapfill.py exactly for bitwise
    parity: prev + (next-prev)/(next_off-prev_off) * (off-prev_off).
    """
    df = _with_spine(observed, spine, value)
    v = F.col(value).cast("double")
    # Both anchor scans are EXPANDING frames (unbounded preceding -> current),
    # which Spark's WindowExec evaluates incrementally in O(n). The naive
    # "current -> unbounded following" frame for the next anchor is O(n^2)
    # per partition (full-frame rescan per row) — measured 9+ min on 42k-row
    # partitions — so the forward scan runs over DESCENDING offset instead.
    wp = Window.partitionBy("doc_id").orderBy("offset").rowsBetween(Window.unboundedPreceding, 0)
    wn = (
        Window.partitionBy("doc_id")
        .orderBy(F.desc("offset"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    df = df.select(
        "doc_id",
        "offset",
        v.alias("_v"),
        F.last(v, ignorenulls=True).over(wp).alias("_pv"),
        F.last(F.when(v.isNotNull(), F.col("offset")), ignorenulls=True).over(wp).alias("_po"),
        F.last(v, ignorenulls=True).over(wn).alias("_nv"),
        F.last(F.when(v.isNotNull(), F.col("offset")), ignorenulls=True).over(wn).alias("_no"),
    )
    x = F.col("offset").cast("double")
    slope = (F.col("_nv") - F.col("_pv")) / (F.col("_no").cast("double") - F.col("_po").cast("double"))
    interp = F.col("_pv") + slope * (x - F.col("_po").cast("double"))
    filled = (
        F.when(F.col("_v").isNotNull(), F.col("_v"))
        .when(F.col("_pv").isNull(), F.col("_nv"))  # leading gap: backfill
        .when(F.col("_nv").isNull(), F.col("_pv"))  # trailing gap: carry
        .otherwise(interp)
    )
    return df.select("doc_id", "offset", filled.alias("filled"))


def gapfill_linear_checksum(
    observed: DataFrame, quantize: float = 1024.0, value: str = "value"
) -> DataFrame:
    """Per-doc (doc_id, n_points, chk) of the linear gap-fill WITHOUT
    materializing the dense grid in the JVM: chk = Σ floor(filled * q)
    over the same dense points :func:`gapfill_runs` (mode='linear') emits.

    Bitwise-identical to ``gapfill_runs + groupBy`` (tested): the anchor
    windows, run bounds and per-run slope are the SAME JVM expressions
    (so long→double casts round identically), and the per-point fill
    ``v + slope * d`` / ``floor(filled * q)`` are the same IEEE float64
    ops in numpy. The win (guide §4.2): the JVM path generates the dense
    grid through ``explode(sequence(...))`` — one array allocation per
    run plus a hash-aggregate probe per dense point (63 M rows at sf0.1)
    — while this kernel expands each Arrow batch of runs with
    repeat/arange vector math and reduces per run with ``np.add.reduceat``
    before anything is shuffled. Only run-level rows (one per
    observation) ever cross the Arrow boundary in either direction.
    """
    import numpy as np
    import pandas as pd

    w = Window.partitionBy("doc_id").orderBy("offset")
    v = F.col(value).cast("double")
    d = observed.filter(v.isNotNull()).select(
        "doc_id",
        F.col("offset").cast("long").alias("offset"),
        v.alias("_v"),
        F.lead(F.col("offset").cast("long")).over(w).alias("_no"),
        F.lead(v).over(w).alias("_nv"),
    )
    # run_end and slope in the JVM with gapfill_runs' exact expressions
    run_end = F.when(F.col("_no").isNull(), F.col("offset")).otherwise(F.col("_no") - 1)
    slope = (F.col("_nv") - F.col("_v")) / (
        F.col("_no").cast("double") - F.col("offset").cast("double")
    )
    runs = d.select(
        "doc_id", "offset", "_v", run_end.alias("_re"), slope.alias("_slope")
    )

    q = float(quantize)

    # memory bound: one Arrow batch of runs expands to sum(run lengths)
    # dense points; slice batches so no expansion exceeds ~4M points
    # (~32 MB of f8) regardless of how pathological the observation gaps
    # are — the same per-run generator bound the JVM sequence() path has,
    # but enforced explicitly.
    max_points = 4_000_000

    def kernel(pdfs):
        for pdf in pdfs:
            if not len(pdf):
                continue
            off_all = pdf["offset"].to_numpy(dtype=np.int64)
            vv_all = pdf["_v"].to_numpy(dtype=np.float64)
            re_all = pdf["_re"].to_numpy(dtype=np.int64)
            sl_all = pdf["_slope"].to_numpy(dtype=np.float64)  # NaN on last runs
            n_all = re_all - off_all + 1
            cuts = [0]
            acc = 0
            for i, ni in enumerate(n_all):
                acc += int(ni)
                if acc >= max_points:
                    cuts.append(i + 1)
                    acc = 0
            if cuts[-1] != len(n_all):
                cuts.append(len(n_all))
            for s, t in zip(cuts[:-1], cuts[1:]):
                off, vv, sl, n = off_all[s:t], vv_all[s:t], sl_all[s:t], n_all[s:t]
                base = np.concatenate(([0], np.cumsum(n)[:-1]))
                # within-run point index 0..n_i-1 over the whole slice
                widx = np.arange(int(n.sum()), dtype=np.int64) - np.repeat(base, n)
                vr = np.repeat(vv, n)
                with np.errstate(invalid="ignore"):
                    filled = np.where(
                        widx == 0, vr, vr + np.repeat(sl, n) * widx.astype(np.float64)
                    )
                contrib = np.floor(filled * q).astype(np.int64)
                chk = np.add.reduceat(contrib, base) if n.size else contrib[:0]
                yield pd.DataFrame({"doc_id": pdf["doc_id"].iloc[s:t], "n": n, "chk": chk})

    part = runs.mapInPandas(kernel, "doc_id string, n long, chk long")
    return part.groupBy("doc_id").agg(
        F.sum("n").cast("long").alias("n_points"),
        F.sum("chk").cast("long").alias("chk"),
    )


def gapfill_runs(
    observed: DataFrame,
    mode: str = "locf",
    value: str = "value",
) -> DataFrame:
    """Join-free gap-fill over the observed span [min_offset, max_offset].

    Instead of spine + left-join + anchor windows (3 shuffles of the DENSE
    grid — measured 405 s on a 63M-point grid), emit each inter-observation
    run directly: ONE `lead` window over the (sparse) observations, then a
    narrow explode of `sequence(off, next_off - 1)`. The dense grid exists
    only as generator output — it is never shuffled, joined, or sorted.

    Equivalent to gapfill_locf / gapfill_linear on a spine spanning exactly
    the observed bounds (no leading/trailing gap by construction); tested
    for bitwise equality against the spine path.
    """
    if mode not in ("locf", "linear"):
        raise ValueError(f"mode must be locf|linear, got {mode!r}")
    w = Window.partitionBy("doc_id").orderBy("offset")
    v = F.col(value).cast("double")
    d = observed.filter(v.isNotNull()).select(
        "doc_id",
        F.col("offset").cast("long").alias("offset"),
        v.alias("_v"),
        F.lead(F.col("offset").cast("long")).over(w).alias("_no"),
        F.lead(v).over(w).alias("_nv"),
    )
    run_end = F.when(F.col("_no").isNull(), F.col("offset")).otherwise(F.col("_no") - 1)
    d = d.withColumn("_k", F.explode(F.sequence(F.col("offset"), run_end)))
    x = F.col("_k").cast("double")
    slope = (F.col("_nv") - F.col("_v")) / (F.col("_no").cast("double") - F.col("offset").cast("double"))
    if mode == "locf":
        filled = F.col("_v")
    else:
        filled = F.when(F.col("_k") == F.col("offset"), F.col("_v")).otherwise(
            F.col("_v") + slope * (x - F.col("offset").cast("double"))
        )
    return d.select("doc_id", F.col("_k").alias("offset"), filled.alias("filled"))
