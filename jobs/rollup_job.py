"""spark-submit entry point: checkpointed, resumable 3-tier rollup.

    spark-submit --py-files engine.zip jobs/rollup_job.py \
        --input <parquet dir | iceberg:tbl | synthetic:N_DOCS> \
        --out /path/to/rollup_out \
        --buckets 16 [--w 64 --fanout 64 --tiers 3] \
        [--compress] [--resume] [--strategy native|pandas]

Each bucket (pmod(xxhash64(doc_id), B)) commits atomically with a lineage +
metrics manifest; --resume anti-joins completed manifests and processes only
pending buckets (north_rule: "resumable from per-partition checkpoints with
lineage + metrics emitted per retention tier").
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import functions as F


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--w", type=int, default=64)
    ap.add_argument("--fanout", type=int, default=64)
    ap.add_argument("--tiers", type=int, default=3)
    ap.add_argument("--strategy", choices=["native", "pandas"], default="pandas")
    ap.add_argument("--compress", action="store_true")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--master", default=None)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args(argv)

    from crossai_ts_spark.datagen import gen_sequences
    from crossai_ts_spark.functions.codecs import compress_tiers
    from crossai_ts_spark.operators.rollup import cascade
    from crossai_ts_spark.plans.checkpoint import commit_bucket, pending_buckets, with_bucket
    from crossai_ts_spark.session import get_spark
    from crossai_ts_spark.sources.io import read_sequences, write_table

    from pyspark.sql import SparkSession

    preexisting = SparkSession.getActiveSession() is not None
    spark = get_spark(app_name="rollup_job", master=args.master)

    if args.input.startswith("synthetic:"):
        n_docs = int(args.input.split(":", 1)[1])
        seqs = gen_sequences(spark, n_docs=n_docs, seed=args.seed)
        snapshot = f"synthetic:seed={args.seed}:n={n_docs}"
    else:
        seqs = read_sequences(spark, args.input)
        snapshot = args.input

    seqs = with_bucket(seqs, args.buckets)

    todo = pending_buckets(args.out, args.buckets) if args.resume else list(range(args.buckets))
    print(f"[rollup_job] buckets total={args.buckets} pending={len(todo)}")
    t0 = time.monotonic()
    for b in todo:
        sub = seqs.filter(F.col("bucket") == b).drop("bucket")
        tiers_df = cascade(sub, strategy=args.strategy, w=args.w, fanout=args.fanout, tiers=args.tiers)
        m = commit_bucket(tiers_df, args.out, b, input_snapshot=snapshot)
        toks = sum(t["tokens"] for t in m["tiers"].values())
        print(f"[rollup_job] bucket={b} rows={sum(t['rows'] for t in m['tiers'].values())} "
              f"tokens={toks} wall={m['wall_sec']:.1f}s")

    if args.compress and todo:
        tiers_all = spark.read.parquet(f"{args.out}/data")
        segs = compress_tiers(tiers_all)
        write_table(segs, f"{args.out}/compressed", mode="overwrite", partition_by=["tier"])
        print("[rollup_job] compressed segments written")

    wall = time.monotonic() - t0
    print(json.dumps({"job": "rollup", "buckets_run": len(todo), "wall_sec": wall}))
    if not preexisting:  # don't tear down a caller-owned session (tests)
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
