"""Checkpoint/resume protocol + salted-aggregation bitwise equality."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from crossai_ts_spark.operators.rollup import cascade_native
from crossai_ts_spark.operators.salted import (
    salted_source_stats,
    salted_tier_source_rollup,
    unsalted_source_stats,
)
from crossai_ts_spark.plans.checkpoint import (
    commit_bucket,
    completed_buckets,
    pending_buckets,
    with_bucket,
)


def test_salted_equals_unsalted(spark, tiny_df):
    a = salted_source_stats(tiny_df, n_salts=8).toPandas().sort_values("source").reset_index(drop=True)
    b = unsalted_source_stats(tiny_df).toPandas().sort_values("source").reset_index(drop=True)
    assert a[["source", "n_docs", "n_tokens", "min_len", "max_len"]].equals(
        b[["source", "n_docs", "n_tokens", "min_len", "max_len"]]
    )
    assert (a.mean_len.to_numpy().view(np.int64) == b.mean_len.to_numpy().view(np.int64)).all()


def test_salted_tier_rollup_invariance(spark, tiny_df):
    tiers = cascade_native(tiny_df, w=64, fanout=8, tiers=2)
    a = salted_tier_source_rollup(tiers, n_salts=4).toPandas()
    b = salted_tier_source_rollup(tiers.repartition(11), n_salts=16).toPandas()
    key = ["source", "tier", "window_start"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    for c in ["t_min", "t_max", "t_sum", "t_cnt", "n_docs"]:
        assert a[c].tolist() == b[c].tolist(), c
    assert (a.t_mean.to_numpy().view(np.int64) == b.t_mean.to_numpy().view(np.int64)).all()


def test_checkpoint_commit_and_resume(spark, tiny_df, tmp_path):
    out = str(tmp_path / "rollup_out")
    n_buckets = 4
    seqs = with_bucket(tiny_df, n_buckets)

    # commit buckets 0 and 2 only
    for b in (0, 2):
        sub = seqs.filter(F.col("bucket") == b).drop("bucket")
        m = commit_bucket(cascade_native(sub, w=64, fanout=8, tiers=2), out, b, "test-input")
        assert m["bucket"] == b
        assert m["tiers"]  # per-tier lineage metrics present
        for t in m["tiers"].values():
            assert t["rows"] > 0 and t["tokens"] > 0

    assert completed_buckets(out) == {0, 2}
    assert pending_buckets(out, n_buckets) == [1, 3]

    # manifests are valid JSON with lineage fields
    with open(os.path.join(out, "_manifests", "0.json")) as f:
        m0 = json.load(f)
    assert m0["input_snapshot"] == "test-input"
    assert m0["code_version"]

    # re-commit of an already-done bucket is idempotent
    sub = seqs.filter(F.col("bucket") == 0).drop("bucket")
    commit_bucket(cascade_native(sub, w=64, fanout=8, tiers=2), out, 0, "test-input")
    assert completed_buckets(out) == {0, 2}

    # committed data is readable and tier-partitioned
    back = spark.read.parquet(f"{out}/data")
    assert back.filter(F.col("tier") == 1).count() > 0


def test_commit_bucket_uri_guard(spark, tiny_df, tmp_path):
    """Remote schemes rejected; file:// and Hadoop-style file:/ both land in
    the same local directory instead of a relative './file:...' dir."""
    tiers = cascade_native(tiny_df, w=64, fanout=8, tiers=1)
    for bad in ("hdfs://nn/x", "s3a://bucket/x", "hdfs:/x"):
        with pytest.raises(ValueError, match="driver-local"):
            commit_bucket(tiers, bad, 0, "t")
    out = str(tmp_path / "uri_out")
    commit_bucket(tiers, f"file://{out}", 0, "t")
    commit_bucket(tiers, f"file:{out}", 1, "t")  # single-slash Hadoop form
    assert completed_buckets(out) == {0, 1}
    assert not os.path.exists("file:")  # no relative junk dir


def test_rollup_job_end_to_end(spark, tmp_path):
    """Drive jobs/rollup_job.py's main() incl. resume skipping."""
    import sys

    sys.path.insert(0, "/root/repo")
    from jobs.rollup_job import main

    out = str(tmp_path / "job_out")
    rc = main(
        [
            "--input", "synthetic:40", "--out", out, "--buckets", "3",
            "--w", "64", "--fanout", "8", "--tiers", "2",
            "--strategy", "pandas", "--compress", "--master", "local[4]",
        ]
    )
    assert rc == 0
    assert completed_buckets(out) == {0, 1, 2}
    segs = spark.read.parquet(f"{out}/compressed")
    assert segs.count() > 0
    # resume: nothing pending -> runs zero buckets, still exits 0
    rc = main(["--input", "synthetic:40", "--out", out, "--buckets", "3", "--resume",
               "--w", "64", "--fanout", "8", "--tiers", "2", "--master", "local[4]"])
    assert rc == 0


def test_bucketed_join_needs_no_exchange(spark, tmp_path):
    """Tables bucketed on doc_id join WITHOUT a shuffle: the physical plan
    must contain no Exchange (the 100-TB lineage/audit join pattern)."""
    from pyspark.sql import functions as F

    from crossai_ts_spark.datagen import gen_local
    from crossai_ts_spark.operators.rollup import rollup_native
    from crossai_ts_spark.plans.bucketing import bucketed_join, write_bucketed
    from crossai_ts_spark.schema import SEQUENCES_SCHEMA

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        docs = gen_local(seed=5, n_docs=30, max_tok=600)
        seqs = spark.createDataFrame(docs, schema=SEQUENCES_SCHEMA)
        t1 = rollup_native(seqs, w=64).select("doc_id", "window_start", "t_sum", "t_cnt")
        agg = t1.groupBy("doc_id").agg(F.sum("t_cnt").alias("n_tok_total"))
        write_bucketed(t1, "bt_tier1", n_buckets=4)
        write_bucketed(agg, "bt_doc_totals", n_buckets=4)
        j = bucketed_join(spark, "bt_tier1", "bt_doc_totals")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # and the join result is right
        got = j.groupBy("doc_id").agg(F.sum("t_cnt").alias("s"), F.first("n_tok_total").alias("t"))
        bad = got.filter(F.col("s") != F.col("t")).count()
        assert bad == 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bt_tier1")
        spark.sql("DROP TABLE IF EXISTS bt_doc_totals")
