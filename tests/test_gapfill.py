"""Gap-fill vs numpy oracle — LOCF + linear, incl. pinned F2 boundary docs."""

from __future__ import annotations

import numpy as np
import pytest

from crossai_ts_spark.datagen import GAP_DOCS, gapped_to_spark, gen_gapped_local
from crossai_ts_spark.operators.gapfill import gapfill_linear, gapfill_locf, make_spine
from crossai_ts_spark.oracle.gapfill import gapfill_linear as o_linear
from crossai_ts_spark.oracle.gapfill import gapfill_locf as o_locf


@pytest.fixture(scope="module")
def gapped(spark):
    pdf = gen_gapped_local(seed=42, n_docs=8)
    sdf = gapped_to_spark(spark, pdf).cache()
    # dense length per doc: gap docs have known n_tok; random docs use max+1
    lengths = {d: n for d, (n, _) in GAP_DOCS.items()}
    for d, g in pdf.groupby("doc_id"):
        lengths.setdefault(d, int(g.offset.max()) + 1)
    return pdf, sdf, lengths


def _check(spark, gapped, spark_fn, oracle_fn):
    pdf, sdf, lengths = gapped
    spine = make_spine(
        spark.createDataFrame([(d, n) for d, n in lengths.items()], "doc_id string, n long")
    )
    got = spark_fn(sdf, spine).toPandas().sort_values(["doc_id", "offset"])
    for doc_id, g in got.groupby("doc_id"):
        obs = pdf[pdf.doc_id == doc_id]
        exp = oracle_fn(obs.offset.to_numpy(), obs.value.to_numpy(), lengths[doc_id])
        vals = g.filled.to_numpy()
        assert len(vals) == lengths[doc_id], doc_id
        # bitwise: NaN == null, others identical bits
        exp_bits = exp.view(np.int64)
        got_bits = np.where(np.isnan(vals), np.float64(np.nan), vals).view(np.int64)
        both_nan = np.isnan(exp) & np.isnan(vals)
        assert (both_nan | (exp_bits == got_bits)).all(), f"{doc_id}: value mismatch"


def test_locf_matches_oracle(spark, gapped):
    _check(spark, gapped, gapfill_locf, o_locf)


def test_linear_matches_oracle(spark, gapped):
    _check(spark, gapped, gapfill_linear, o_linear)


def test_pinned_semantics(spark, gapped):
    pdf, sdf, lengths = gapped
    spine = make_spine(
        spark.createDataFrame([(d, n) for d, n in lengths.items()], "doc_id string, n long")
    )
    locf = gapfill_locf(sdf, spine).toPandas()
    lin = gapfill_linear(sdf, spine).toPandas()

    # doc-gap-0000: leading gap (offsets 0..9 missing)
    head = locf[(locf.doc_id == "doc-gap-0000") & (locf.offset < 10)]
    assert head.filled.isna().all()  # LOCF: null until first observation
    headl = lin[(lin.doc_id == "doc-gap-0000") & (lin.offset < 10)]
    first_obs = pdf[pdf.doc_id == "doc-gap-0000"].sort_values("offset").value.iloc[0]
    assert (headl.filled == float(first_obs)).all()  # linear: backfill

    # doc-gap-0002: trailing gap — both carry the last value
    obs = pdf[pdf.doc_id == "doc-gap-0002"].sort_values("offset")
    last_val = float(obs.value.iloc[-1])
    n = lengths["doc-gap-0002"]
    for frame in (locf, lin):
        tail = frame[(frame.doc_id == "doc-gap-0002") & (frame.offset >= n - 10)]
        assert (tail.filled == last_val).all()

    # doc-gap-0001: interior run 100..199 — linear anchors at 99 and 200
    o = pdf[pdf.doc_id == "doc-gap-0001"]
    v99 = float(o[o.offset == 99].value.iloc[0])
    v200 = float(o[o.offset == 200].value.iloc[0])
    mid = lin[(lin.doc_id == "doc-gap-0001") & (lin.offset == 150)]
    expected = v99 + (v200 - v99) / (200.0 - 99.0) * (150.0 - 99.0)
    assert mid.filled.iloc[0] == expected
    # LOCF carries v99 across the whole run
    run = locf[(locf.doc_id == "doc-gap-0001") & locf.offset.between(100, 199)]
    assert (run.filled == v99).all()
