"""Round-8 optimization harness (guide §1): per-query noop-sink timing +
``explain("formatted")`` dumps, separate from the frozen ``bench.py``.

Usage:
  python bench_extra.py q1 q2 ...          # time named queries (min of N)
  python bench_extra.py --plans q1 q2 ...  # also dump plans/r08/<q>_<tag>.txt
  PLAN_TAG=before|after  BENCH_TRIALS=3  SPARK_GRAFT_SF_DIR=...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from crossai_ts_spark.session import get_spark


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    dump_plans = "--plans" in sys.argv
    tag = os.environ.get("PLAN_TAG", "before")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_trials = int(os.environ.get("BENCH_TRIALS", "3"))
    spark = get_spark(app_name="bench_extra")

    import __spark_entry__ as e

    qs = e.queries()
    names = args or list(qs)
    # warm-up (uncounted): JVM codegen + Arrow + python workers
    try:
        qs["tokenize_stats"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    except Exception:
        pass
    from crossai_ts_spark.caching import release_tracked

    out: dict[str, dict] = {}
    plan_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r08")
    for name in names:
        if name not in qs:
            print(f"[bench_extra] unknown query {name}", file=sys.stderr)
            continue
        if dump_plans:
            os.makedirs(plan_dir, exist_ok=True)
            df = qs[name](spark, sf_dir)
            with open(os.path.join(plan_dir, f"{name}_{tag}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
            release_tracked()
        trials = []
        for _ in range(n_trials):
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.monotonic()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            trials.append(round(time.monotonic() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            release_tracked()
        out[name] = {"min": min(trials), "trials": trials}
        print(f"[bench_extra] {name}: min={min(trials)} trials={trials}", file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
