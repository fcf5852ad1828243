"""Local stand-in for the driver's correctness gate.

Runs every __spark_entry__ query on Spark AND its DuckDB oracle on the same
parquet tables, then compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted, floats
compared by exact repr). Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon_hash(pdf: pd.DataFrame) -> str:
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf) == 0:
        return "empty"
    cols = []
    for c in pdf.columns:
        s = pdf[c]
        if s.dtype.kind == "f":
            cols.append(s.map(repr))  # exact float text (repr round-trips)
        else:
            cols.append(s.astype(str))
    lines = cols[0].str.cat(cols[1:], sep="\x1f") if len(cols) > 1 else cols[0]
    joined = "\x1e".join(sorted(lines.tolist()))
    return hashlib.sha256(joined.encode()).hexdigest()[:16]


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    # unify dtypes that hash differently but are the same value domain
    out = pdf.copy()
    for c in out.columns:
        if out[c].dtype.kind in "iu":
            out[c] = out[c].astype("int64")
        elif out[c].dtype.kind == "f":
            out[c] = out[c].astype("float64")
        elif str(out[c].dtype) == "object":
            pass
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from crossai_ts_spark.session import get_spark

    spark = get_spark(app_name="check_oracle", master="local[8]")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, os = e.queries(), e.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        from crossai_ts_spark.caching import release_tracked

        release_tracked()  # previous query's operator-tracked caches
        try:
            got = normalize(fn(spark, sf_dir).toPandas())
        except Exception:
            print(f"FAIL  {name}: spark raised")
            traceback.print_exc(limit=3)
            n_fail += 1
            continue
        if name not in os:
            print(f"rows  {name}: {len(got)} rows (rows-only check) [{time.monotonic()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            exp = normalize(con.execute(os[name]).fetchdf())
        except Exception:
            print(f"FAIL  {name}: duckdb raised")
            traceback.print_exc(limit=3)
            n_fail += 1
            continue
        problems = []
        if len(got) != len(exp):
            problems.append(f"rows {len(got)} != {len(exp)}")
        if sorted(got.columns) != sorted(exp.columns):
            problems.append(f"cols {sorted(got.columns)} != {sorted(exp.columns)}")
        if not problems and canon_hash(got) != canon_hash(exp):
            problems.append("value hash mismatch")
            # show a diff sample
            key = sorted(got.columns)
            a = got[key].sort_values(key).reset_index(drop=True)
            b = exp[key].sort_values(key).reset_index(drop=True)
            neq = (a.astype(str) != b.astype(str)).any(axis=1)
            if neq.any():
                i = neq.idxmax()
                problems.append(f"first diff row {i}:\n  spark={a.iloc[i].to_dict()}\n  duck ={b.iloc[i].to_dict()}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"OK    {name}: {len(got)} rows [{time.monotonic()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_rowsonly} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
