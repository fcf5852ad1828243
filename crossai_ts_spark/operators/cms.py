"""Count-min sketch (Cormode & Muthukrishnan 2005): frequency estimates
for arbitrary keys from BOUNDED state — d x w integer cells regardless of
corpus size, mergeable by elementwise addition across partitions, days,
or streams. The counting twin of the bloom filter's membership bitset
(operators/bloom.py): where an exact n-gram count table over a 10^12-token
corpus shuffles the whole n-gram universe, the sketch is a fixed few-MB
table that answers "how often does this phrase occur?" with a one-sided
error (estimate >= truth, overshoot ~ corpus_size/w per row, min over d
rows).

Engine-portable: every hash is the md5-derived 60-bit integer family
(`bloom._positions` pattern), all cells are exact integer sums — the
whole sketch AND every estimate reproduce bit-for-bit in DuckDB, so the
operator carries a FULL oracle, not a tolerance test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cell(key_col, i: int, w: int, hash: str = "md5"):
    """Row-i cell index for a key.

    ``md5`` (default): md5_60("i:" || key) mod w — engine-portable (the
    DuckDB oracle reproduces every cell bit-for-bit), at the cost of a
    hex-string detour per position (~4 md5+conv per item at d=4).
    ``xxhash64``: the JVM-native seeded hash — no hex detour, measured
    ~5x the md5 throughput at 255 M items (BENCH/BASELINE.md round-6);
    same estimate guarantees, but cells are Spark-reproducible only, so
    production pipelines use it and the oracle query keeps md5."""
    if hash == "md5":
        h = F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(i), key_col.cast("string")).cast("binary")), 1, 15
            ),
            16,
            10,
        ).cast("long")
        return h % w
    if hash == "xxhash64":
        return F.pmod(F.xxhash64(F.lit(i), key_col.cast("string")), F.lit(w))
    raise ValueError(f"unknown hash {hash!r}")


def cms_build(items: DataFrame, key: str, d: int = 4, w: int = 8192,
              hash: str = "md5") -> DataFrame:
    """Sketch an item stream: one (row, cell, cnt) table of <= d*w rows.

    One explode (d rows per item) into a map-side-combined groupBy —
    partial aggregation collapses each partition to <= d*w cells before
    the (tiny) shuffle, which is exactly how the sketch merges: cells
    from anywhere add elementwise. ``hash`` picks the position family
    (see :func:`_cell`); build and lookup must agree."""
    pos = F.array(*[
        F.struct(F.lit(i).alias("row"), _cell(F.col(key), i, w, hash).alias("cell"))
        for i in range(d)
    ])
    return (
        items.select(F.explode(pos).alias("p"))
        .select("p.row", "p.cell")
        .groupBy("row", "cell")
        .agg(F.count("*").alias("cnt"))
    )


def cms_lookup(
    cms: DataFrame, queries: DataFrame, key: str, d: int = 4, w: int = 8192,
    hash: str = "md5"
) -> DataFrame:
    """Estimate each query key's count: min over the d rows' cells.

    The sketch side is <= d*w rows and is BROADCAST — the query side
    never shuffles; absent cells count 0 (a key the sketch never saw
    estimates 0 only if some cell stayed empty; estimate >= truth always).
    ``hash`` must match the build's."""
    pos = F.array(*[
        F.struct(F.lit(i).alias("row"), _cell(F.col(key), i, w, hash).alias("cell"))
        for i in range(d)
    ])
    q = queries.select(F.col(key), F.explode(pos).alias("p")).select(
        key, "p.row", "p.cell"
    )
    joined = q.join(F.broadcast(cms), ["row", "cell"], "left").select(
        key, F.coalesce("cnt", F.lit(0).cast("long")).alias("cnt")
    )
    return joined.groupBy(key).agg(F.min("cnt").alias("est"))
