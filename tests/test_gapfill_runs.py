"""gapfill_runs (join-free) == spine path restricted to observed bounds."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from crossai_ts_spark.datagen import gapped_to_spark, gen_gapped_local
from crossai_ts_spark.operators.gapfill import (
    gapfill_linear,
    gapfill_locf,
    gapfill_runs,
    make_spine,
)


@pytest.fixture(scope="module")
def gapped2(spark):
    pdf = gen_gapped_local(seed=7, n_docs=6)
    return pdf, gapped_to_spark(spark, pdf).cache()


@pytest.mark.parametrize("mode", ["locf", "linear"])
def test_runs_equals_spine_on_observed_span(spark, gapped2, mode):
    pdf, sdf = gapped2
    # spine over observed bounds per doc (exactly what gapfill_runs covers)
    bounds = sdf.groupBy("doc_id").agg(
        F.min("offset").alias("mn"), F.max("offset").alias("mx")
    )
    spine = bounds.select("doc_id", F.explode(F.sequence("mn", "mx")).alias("offset"))
    spine_fn = gapfill_locf if mode == "locf" else gapfill_linear
    exp = spine_fn(sdf, spine).toPandas().sort_values(["doc_id", "offset"]).reset_index(drop=True)
    got = (
        gapfill_runs(sdf, mode=mode)
        .toPandas()
        .sort_values(["doc_id", "offset"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert got.offset.tolist() == exp.offset.tolist()
    a = got.filled.to_numpy()
    b = exp.filled.to_numpy()
    assert (a.view(np.int64) == b.view(np.int64)).all()  # bitwise, incl. interp


def test_linear_checksum_kernel_bitwise_equals_runs_path(spark, gapped2):
    """r8: gapfill_linear_checksum (vectorized run-expansion kernel) must
    reproduce gapfill_runs(mode='linear') + groupBy floor-checksums
    BITWISE — same anchors, same slope expression, same IEEE per-point
    ops — including single-point (trailing) runs where slope is null."""
    from crossai_ts_spark.operators.gapfill import gapfill_linear_checksum

    _, sdf = gapped2
    want = (
        gapfill_runs(sdf, mode="linear")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_points"),
            F.sum(F.floor(F.col("filled") * 1024.0).cast("long")).cast("long").alias("chk"),
        )
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    got = (
        gapfill_linear_checksum(sdf, quantize=1024.0)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert got[["doc_id", "n_points", "chk"]].equals(want[["doc_id", "n_points", "chk"]])
