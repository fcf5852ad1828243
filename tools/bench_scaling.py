"""Two-cluster-size scaling evidence (north_rule: efficiency >= 0.8 from N
to 4N executors; sandbox proxy: local[8] vs local[32] on identical input).

Each level runs in its OWN subprocess/JVM (a fresh SparkSession per level —
local[N] can't be changed in-process). Writes BENCH/BASELINE.md.

    python tools/bench_scaling.py [--docs 4000] [--low 8] [--high 32]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from crossai_ts_spark.session import get_spark
from crossai_ts_spark.datagen import gen_sequences
from crossai_ts_spark.operators.rollup import cascade

spark = get_spark(app_name="bench_scaling", master="local[{cores}]",
                  shuffle_partitions={cores})
seqs = gen_sequences(spark, n_docs={docs}, seed=42, partitions={parts}).cache()
n_seq = seqs.count()
n_tok = int(seqs.selectExpr("sum(cast(n_tok as bigint)) s").collect()[0].s)
# warm-up (JIT + arrow init) then measured run
cascade(seqs, strategy={strategy!r}, w=64, fanout=64, tiers=3).count()
t0 = time.monotonic()
n_rows = cascade(seqs, strategy={strategy!r}, w=64, fanout=64, tiers=3).count()
wall = time.monotonic() - t0
print("RESULT " + json.dumps({{"cores": {cores}, "wall": wall, "n_seq": n_seq,
      "n_tok": n_tok, "rows": n_rows,
      "tokens_per_sec": n_tok / wall, "seqs_per_sec": n_seq / wall}}))
spark.stop()
"""


def run_level(cores: int, docs: int, strategy: str) -> dict:
    code = CHILD.format(repo=REPO, cores=cores, docs=docs, parts=max(32, cores * 4), strategy=strategy)
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=1800
    )
    for line in r.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT from local[{cores}]:\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=4000)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--strategy", default="pandas")
    args = ap.parse_args()

    lo = run_level(args.low, args.docs, args.strategy)
    hi = run_level(args.high, args.docs, args.strategy)
    ratio = args.high / args.low
    speedup = lo["wall"] / hi["wall"]
    eff = speedup / ratio

    md = f"""# BENCH/BASELINE — scaling evidence (N vs {int(ratio)}N parallelism)

north_rule criterion: throughput scaling efficiency >= 0.8 from N to 4N
executors. Sandbox proxy (no real cluster): the identical 3-tier rollup job
on the identical synthetic input at two local parallelism levels, each in
its own JVM.

Input: gen_sequences(seed=42, n_docs={args.docs}) = {lo["n_seq"]} sequences,
{lo["n_tok"]:,} tokens. Job: cascade(strategy={args.strategy!r}, w=64,
fanout=64, tiers=3) -> count. Warm-up run excluded.

| parallelism | wall (s) | tokens/sec | sequences/sec |
|---|---|---|---|
| local[{args.low}] (N) | {lo["wall"]:.2f} | {lo["tokens_per_sec"]:,.0f} | {lo["seqs_per_sec"]:,.0f} |
| local[{args.high}] ({int(ratio)}N) | {hi["wall"]:.2f} | {hi["tokens_per_sec"]:,.0f} | {hi["seqs_per_sec"]:,.0f} |

speedup = {speedup:.2f}x over a {ratio:.0f}x core increase
**scaling efficiency = {eff:.3f}** (target >= 0.8)
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(md)
    print(json.dumps({"low": lo, "high": hi, "efficiency": eff}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
