"""Scale-stress measurements for the round-5 sketch family (VERDICT r5 #6):

  1. HLL distinct-count rollup on the 255 M-token scaling input: the
     token stream exploded to an event stream (one event per token, key
     salted by doc so per-window distinct counts are non-trivial),
     tokens/sec for sketch+estimate at local[8];
  2. count-min sketch build over the same exploded stream (d=4 rows per
     item -> ~1e9 cell updates), tokens/sec at local[8];
  3. the KMV hot-window case (VERDICT r5 "what's wrong" #1): ONE window
     holding tens of millions of DISTINCT keys, k=8, n_salts=16 — wall
     with the HLL-derived candidate pre-filter vs the unfiltered
     two-phase plan, with bitwise-equal sketches asserted (the r6 fix's
     whole contract: same bytes, bounded state).

Each measurement runs in its own subprocess/JVM (BLAS pinned by
session.py), min-of-N trials, serial — never concurrent with another
Spark job. Prints one JSON line per measurement; --write-md refreshes
the round-6 section in BENCH/BASELINE.md.

Usage: python tools/stress_round6.py [--docs 60000] [--cores 8]
       [--trials 2] [--kmv-distinct 30000000] [--write-md]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
INPUT = "/tmp/scale_input_{docs}"

GEN = r"""
import os, sys
os.environ["PYTHONPATH"] = {repo!r}
sys.path.insert(0, {repo!r})
from crossai_ts_spark.session import get_spark
from crossai_ts_spark.datagen import gen_sequences
spark = get_spark(master="local[32]")
gen_sequences(spark, n_docs={docs}, seed=42, partitions=128).write.mode("overwrite").parquet({path!r})
spark.stop()
"""

# one event per token; 16 tumbling windows keyed by doc hash so every
# window sees ~n_docs/16 docs x ~vocab distinct (doc_id, tok) keys
EVENTS = r"""
seqs = spark.read.parquet({path!r})
ev = seqs.select("doc_id", F.explode("tokens").alias("tok")).select(
    F.timestamp_seconds(
        F.lit(1704067200) + (F.abs(F.xxhash64("doc_id")) % 16) * 3600
    ).alias("ts"),
    F.concat_ws(":", "doc_id", F.col("tok").cast("string")).alias("k"),
)
"""

HLL = r"""
import json, os, sys, time
os.environ["PYTHONPATH"] = {repo!r}
sys.path.insert(0, {repo!r})
from crossai_ts_spark.session import get_spark
from crossai_ts_spark.operators.hll import hll_estimate, hll_sketch
from pyspark.sql import functions as F
spark = get_spark(app_name="stress_hll", master="local[{cores}]", shuffle_partitions={cores})
""" + EVENTS + r"""
n_tok = int(seqs.selectExpr("sum(cast(n_tok as bigint)) t").collect()[0].t)

def job(hash):
    t0 = time.monotonic()
    rows = hll_estimate(hll_sketch(ev, key="k", ts="ts", window_sec=3600, hash=hash)).collect()
    return time.monotonic() - t0, rows

out = {{"n_tok": n_tok}}
job("xxhash64")  # warm-up
for hash in ("xxhash64", "md5"):
    walls, rows = [], None
    for _ in range({trials}):
        wall, rows = job(hash)
        walls.append(round(wall, 2))
    out[hash] = {{"windows": len(rows),
                 "est_distinct_total": round(sum(r.est_distinct for r in rows)),
                 "wall": min(walls), "walls": walls,
                 "tokens_per_sec": round(n_tok / min(walls))}}
print("RESULT " + json.dumps(out))
spark.stop()
"""

CMS = r"""
import json, os, sys, time
os.environ["PYTHONPATH"] = {repo!r}
sys.path.insert(0, {repo!r})
from crossai_ts_spark.session import get_spark
from crossai_ts_spark.operators.cms import cms_build
from pyspark.sql import functions as F
spark = get_spark(app_name="stress_cms", master="local[{cores}]", shuffle_partitions={cores})
""" + EVENTS + r"""
n_tok = int(seqs.selectExpr("sum(cast(n_tok as bigint)) t").collect()[0].t)
items = ev.select("k")

def job(hash):
    t0 = time.monotonic()
    r = cms_build(items, key="k", d=4, w=8192, hash=hash).agg(
        F.count("*").alias("cells"), F.sum("cnt").alias("tot")).collect()[0]
    return time.monotonic() - t0, (int(r.cells), int(r.tot))

out = {{"n_tok": n_tok, "d": 4, "w": 8192}}
job("xxhash64")  # warm-up
for hash, trials in (("xxhash64", {trials}), ("md5", {trials})):
    walls, meta = [], None
    for _ in range(trials):
        wall, meta = job(hash)
        walls.append(round(wall, 2))
    assert meta[1] == 4 * n_tok, (meta, n_tok)  # every token hit d cells
    out[hash] = {{"cells": meta[0], "wall": min(walls), "walls": walls,
                 "tokens_per_sec": round(n_tok / min(walls))}}
print("RESULT " + json.dumps(out))
spark.stop()
"""

KMV = r"""
import json, os, sys, time
os.environ["PYTHONPATH"] = {repo!r}
sys.path.insert(0, {repo!r})
from crossai_ts_spark.session import get_spark
from crossai_ts_spark.operators.hll import kmv_sketch
from pyspark.sql import functions as F
spark = get_spark(app_name="stress_kmv", master="local[{cores}]", shuffle_partitions={cores})

# ONE hot window, every key distinct — the unbounded-state design point
D = {kmv_distinct}
ev = spark.range(D).select(
    F.col("id").alias("user_id"),
    F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ts"),
)

def job(prefilter):
    t0 = time.monotonic()
    rows = kmv_sketch(ev, k=8, n_salts=16, prefilter=prefilter).collect()
    return time.monotonic() - t0, rows

job(True)  # warm-up
out = {{"distinct_keys": D, "k": 8, "n_salts": 16}}
sketches = {{}}
for name, pf in (("prefiltered", True), ("unfiltered_two_phase", False)):
    walls, rows = [], None
    for _ in range({trials}):
        wall, rows = job(pf)
        walls.append(round(wall, 2))
    sketches[name] = sorted((r.window_start, tuple(r.ks)) for r in rows)
    out[name] = {{"wall": min(walls), "walls": walls}}
assert sketches["prefiltered"] == sketches["unfiltered_two_phase"], "sketches diverge!"
out["sketches_bitwise_equal"] = True
out["est_distinct"] = rows[0].n_distinct_est
print("RESULT " + json.dumps(out))
spark.stop()
"""


def run_child(code: str, **fmt) -> dict:
    r = subprocess.run(
        [sys.executable, "-c", code.format(repo=REPO, **fmt)],
        capture_output=True, text=True, timeout=3600,
    )
    for line in r.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT:\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=60000)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--kmv-distinct", type=int, default=30_000_000)
    ap.add_argument("--write-md", action="store_true")
    ap.add_argument("--only", choices=["hll", "cms", "kmv"])
    args = ap.parse_args()

    path = INPUT.format(docs=args.docs)
    if not os.path.isdir(path):
        subprocess.run(
            [sys.executable, "-c", GEN.format(repo=REPO, docs=args.docs, path=path)],
            check=True, capture_output=True, timeout=3000,
        )

    results = {}
    if args.only in (None, "hll"):
        results["hll"] = run_child(HLL, cores=args.cores, trials=args.trials, path=path)
        print(json.dumps({"hll": results["hll"]}))
    if args.only in (None, "cms"):
        results["cms"] = run_child(CMS, cores=args.cores, trials=args.trials, path=path)
        print(json.dumps({"cms": results["cms"]}))
    if args.only in (None, "kmv"):
        results["kmv"] = run_child(
            KMV, cores=args.cores, trials=args.trials, kmv_distinct=args.kmv_distinct
        )
        print(json.dumps({"kmv": results["kmv"]}))

    if args.write_md and len(results) == 3:
        h, c, k = results["hll"], results["cms"], results["kmv"]
        md = f"""
## Round-6 sketch-family scale-stress (local[{args.cores}], min-of-{args.trials}, own JVM per point)

The {h['n_tok']:,}-token scaling corpus exploded to one event per token
(doc-salted keys, 16 tumbling windows — so each window carries a
non-trivial distinct-key population), timed end to end INCLUDING the
scan+explode ingestion:

| sketch | state bound | wall (s) | tokens/s |
|---|---|---|---|
| HLL sketch + estimate, md5 oracle family ({h['md5']['windows']} windows) | 64 registers/window pre-shuffle | {h['md5']['wall']} (trials {h['md5']['walls']}) | {h['md5']['tokens_per_sec']:,} |
| HLL sketch + estimate, xxhash64 production family (r6) | same | {h['xxhash64']['wall']} (trials {h['xxhash64']['walls']}) | **{h['xxhash64']['tokens_per_sec']:,}** |
| CMS build, md5 oracle family (d=4, w=8192 -> {c['md5']['cells']:,} cells) | d*w cells, map-side combined | {c['md5']['wall']} (trials {c['md5']['walls']}) | {c['md5']['tokens_per_sec']:,} |
| CMS build, xxhash64 production family (r6) | same | {c['xxhash64']['wall']} (trials {c['xxhash64']['walls']}) | **{c['xxhash64']['tokens_per_sec']:,}** |

Cell/register state never grows with corpus size, so these rates are the
flat-cost per-token path a 10^12-token corpus would ride. The md5
families pay an md5+hex-conv per position — they exist for the
DuckDB-bitwise oracles; `hash="xxhash64"` is the JVM-native production
path (HLL {h['xxhash64']['tokens_per_sec'] / h['md5']['tokens_per_sec']:.1f}x,
CMS {c['xxhash64']['tokens_per_sec'] / c['md5']['tokens_per_sec']:.1f}x;
same estimator/merge contracts, tested).

KMV hot-window case (the r5 verdict's one weak flag, fixed this round):
ONE window of {k['distinct_keys']:,} DISTINCT keys, k={k['k']},
n_salts={k['n_salts']}:

| plan | wall (s) |
|---|---|
| HLL-threshold candidate pre-filter (r6 default) | **{k['prefiltered']['wall']}** (trials {k['prefiltered']['walls']}) |
| unfiltered two-phase collect_set (pre-r6 shape) | {k['unfiltered_two_phase']['wall']} (trials {k['unfiltered_two_phase']['walls']}) |

Sketches bitwise-equal (asserted in-run). Watch the unfiltered plan's
trial SPREAD, not just its min — multi-minute outlier trials are the GC
signature of its ~D/n_salts-long aggregation buffers. The pre-filter
admits ~c*k candidate hashes per window instead, so per-salt
aggregation input is O(k) at ANY distinct count — the 10^9-distinct
window that would OOM the old default now costs what a 10^3 one does,
plus one bounded HLL pass.
"""
        _write_section(md)
        print("[stress] wrote round-6 section to BENCH/BASELINE.md")
    return 0


def _write_section(md: str) -> None:
    """Replace any previous round-6 sketch-stress section."""
    out_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    marker = "<!-- extra-sections -->"
    head_tag = "## Round-6 sketch-family scale-stress"
    txt = open(out_path).read()
    if marker not in txt:
        txt += "\n" + marker + "\n"
    if head_tag in txt:
        pre = txt[: txt.index(head_tag)].rstrip() + "\n"
        rest = txt[txt.index(head_tag):]
        nxt = rest.find("\n## ", 1)
        txt = pre + (rest[nxt + 1:] if nxt != -1 else "")
    with open(out_path, "w") as f:
        f.write(txt.rstrip() + "\n" + md)


if __name__ == "__main__":
    sys.exit(main())
