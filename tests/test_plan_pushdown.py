"""Physical-plan guarantees: predicate pushdown, column pruning, and
partition pruning must actually reach the parquet scan — the properties
that keep a 100 TB read from touching 100 TB."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_and_projection_reach_parquet_scan(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.filter(F.col("l_quantity") > 40).select("l_orderkey", "l_quantity")
    plan = _plan(q)
    # the predicate is pushed to the scan, not applied post-read
    assert "PushedFilters" in plan and "GreaterThan(l_quantity" in plan, plan
    # column pruning: the scan schema carries ONLY the referenced columns
    rs = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "l_orderkey" in rs and "l_quantity" in rs
    assert "l_comment" not in rs and "l_extendedprice" not in rs, rs


def test_partition_pruning_on_partitioned_tier_sink(spark, tmp_path):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    out = str(tmp_path / "ev_by_type")
    ev.write.partitionBy("event_type").parquet(out)

    back = spark.read.parquet(out).filter(F.col("event_type") == "click")
    plan = _plan(back)
    # the partition predicate prunes directories at planning time
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters", 1)[1][:200], plan
    # and no row-level filter remains for it post-scan
    n_click = back.count()
    n_all = spark.read.parquet(out).count()
    assert 0 < n_click < n_all
