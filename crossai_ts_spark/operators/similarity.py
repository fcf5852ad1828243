"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — broadcast the (small) query set,
JVM-side sequential fold for the dot product, row_number top-k. One narrow
pass over the corpus; the only shuffle is the final per-query top-k (tiny).

Scale path: LSH by random-hyperplane sign buckets — corpus hashed once to
B-bit bucket ids; queries probe their own bucket (+ optional multi-probe),
so each query touches ~corpus/2^B vectors instead of all of them.
Hyperplanes are derived deterministically from a seed and broadcast.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
    "cast(0.0 as double), (acc, v) -> acc + v)"
)


def _cos(a: str, b: str):
    return (
        F.expr(_DOT.format(a=a, b=b))
        / (F.sqrt(F.expr(_DOT.format(a=a, b=a))) * F.sqrt(F.expr(_DOT.format(a=b, b=b))))
    )


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """Brute-force cosine top-k; queries broadcast (must be the small side)."""
    qv = queries.select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe"))
    pairs = F.broadcast(qv).crossJoin(corpus).filter(F.col("vec_id") != F.col("q_id"))
    scored = pairs.select("q_id", "vec_id", _cos("qe", "embedding").alias("cos_sim"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "vec_id", "cos_sim")
    )


def _hyperplanes(dim: int, n_bits: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.normal(0, 1, size=(n_bits, dim)).tolist()


def lsh_bucket_col(dim: int, n_bits: int = 8, seed: int = 42, vec: str = "embedding"):
    """Random-hyperplane signature as a Column:
    bucket = sum_i (dot(v, h_i) > 0) << i. Hyperplanes ship as literal
    arrays inside the plan (broadcast by value); each bit is one JVM-side
    fold — no Python. Column form so multi-table callers can compute every
    table's bucket in ONE projection over ONE scan."""
    planes = _hyperplanes(dim, n_bits, seed)
    bucket = None

    def dot(a, b):
        # identical left fold to _DOT (zip -> double product -> +)
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )

    for i, p in enumerate(planes):
        # one ArrayType literal node per plane (F.lit(list)) — building
        # each element as a cast('..' as double) expression made the
        # near-dup plans' analysis/codegen the dominant cost (same lesson
        # as the IVF centroids); values are bit-identical either way
        arr = F.lit([float(x) for x in p]).cast("array<double>")
        bit = F.when(dot(F.col(vec), arr) > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bit if bucket is None else bucket + bit
    return bucket


def lsh_bucket(df: DataFrame, dim: int, n_bits: int = 8, seed: int = 42,
               vec: str = "embedding") -> DataFrame:
    """Random-hyperplane bucketing of a DataFrame (see lsh_bucket_col)."""
    return df.withColumn("bucket", lsh_bucket_col(dim, n_bits, seed, vec))


def ivf_centroids(corpus: DataFrame, n_cent: int, vec: str = "embedding") -> list[list[float]]:
    """Deterministic IVF 'training': the n_cent corpus vectors whose
    md5(vec_id) sorts smallest — a hash-random sample standing in for
    k-means centroids, so an independent engine can rebuild the identical
    model. Control-plane collect of an n_cent x dim model (a few KB), the
    same pattern as the LSH literal hyperplanes; at real scale this is the
    standard train-small-model-then-broadcast IVF shape (a k-means refit
    would slot in here without touching the search plan)."""
    rows = (
        corpus.select("vec_id", vec)
        .orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(n_cent)
        .collect()
    )
    return [[float(x) for x in r[1]] for r in rows]


def ivf_assign(df: DataFrame, cents: list[list[float]], vec: str = "embedding") -> DataFrame:
    """Add `cscore` (cosine vs each centroid, index order) and `cell`
    (1-based argmax, first-max tie-break). Each score is a plain column
    expression — one JVM fold per centroid, evaluated once per row (no
    HOF-lambda inlining), so assignment is a narrow map: no shuffle, no
    Python. Centroid literals ship inside the plan like the LSH planes."""
    def dot(a, b):
        # same left fold as _DOT (zip -> per-element double product -> +)
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )

    # ONE array<array<double>> literal + ONE transform lambda, not n_cent
    # separate fold expressions: per-centroid exprs compiled a plan whose
    # analysis+codegen dominated wall time (n_cent x dim literal casts
    # measured a ~1 MB task binary). `_sn` is materialized as a column
    # first — referencing it inside the lambda is a per-row read, while an
    # inlined expression would re-evaluate the self-dot per centroid
    # (the Catalyst HOF-inlining trap).
    carr = F.lit(cents).cast("array<array<double>>")
    out = df.withColumn("_sn", F.sqrt(dot(F.col(vec), F.col(vec))))
    scores = F.transform(
        carr, lambda c: dot(F.col(vec), c) / (F.col("_sn") * F.sqrt(dot(c, c)))
    )
    return (
        out.withColumn("cscore", scores)
        .withColumn("cell", F.array_position(F.col("cscore"), F.array_max("cscore")).cast("long"))
        .drop("_sn")
    )


def ivf_topk(corpus: DataFrame, queries: DataFrame, n_cent: int = 16,
             n_probe: int = 3, k: int = 5, vec: str = "embedding") -> DataFrame:
    """IVF approximate NN: partition the corpus into `n_cent` Voronoi cells
    around deterministic centroids, then each query searches only its
    `n_probe` nearest cells (exact cosine re-rank inside).

    Scale shape (the IVF contract): the model is tiny and broadcast; cell
    assignment is a narrow map over the corpus (n_cent folds/row, no
    shuffle); the candidate join is broadcast-hash on the (queries x
    n_probe)-row probe side so the corpus never shuffles; the only shuffle
    is the final per-query top-k over ~n_probe/n_cent of the corpus.
    Complements lsh_topk: IVF adapts to the data distribution (cells follow
    the vectors), LSH is oblivious (fixed hyperplanes)."""
    cents = ivf_centroids(corpus, n_cent, vec)
    cb = ivf_assign(corpus, cents, vec).select("vec_id", vec, "cell")
    qv = queries.select(F.col("vec_id").alias("q_id"), F.col(vec).alias("qe"))
    qb = ivf_assign(qv, cents, vec="qe")
    qp = qb.select("q_id", "qe", F.posexplode("cscore").alias("cid0", "score"))
    wp = Window.partitionBy("q_id").orderBy(F.desc("score"), "cid0")
    qp = (
        qp.withColumn("pr", F.row_number().over(wp))
        .filter(F.col("pr") <= n_probe)
        .select("q_id", "qe", (F.col("cid0") + 1).cast("long").alias("cell"))
    )
    pairs = F.broadcast(qp).join(cb, "cell").filter(F.col("vec_id") != F.col("q_id"))
    scored = pairs.select("q_id", "vec_id", _cos("qe", vec).alias("cos_sim"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "vec_id", "cos_sim")
    )


def lsh_topk(corpus: DataFrame, queries: DataFrame, dim: int, k: int = 5,
             n_bits: int = 8, seed: int = 42, n_probes: int = 1) -> DataFrame:
    """ANN top-k restricted to the query's LSH bucket(s).

    Multi-probe: with n_probes > 1 each query also probes the buckets at
    Hamming distance 1 from its own (one sign-flip away — where a
    borderline neighbor most likely landed), up to n_probes buckets total.
    Recall rises from p^B toward coverage of the adjacent half-spaces at
    the cost of (n_probes x) candidate volume; the probe fan-out explodes
    on the (tiny, broadcast) QUERY side only — the corpus is still hashed
    exactly once.
    """
    cb = lsh_bucket(corpus, dim, n_bits, seed)
    qb0 = lsh_bucket(queries, dim, n_bits, seed).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe"), "bucket"
    )
    if n_probes > 1:
        flips = [F.col("bucket").cast("long")] + [
            F.col("bucket").cast("long").bitwiseXOR(F.lit(1 << i).cast("long"))
            for i in range(min(n_probes - 1, n_bits))
        ]
        qb = qb0.select(
            "q_id", "qe", F.explode(F.array(*flips)).alias("bucket")
        )
    else:
        qb = qb0
    # the probe buckets of one query are pairwise-distinct XOR values and a
    # corpus vector lives in exactly one bucket, so no candidate repeats —
    # no dedup shuffle needed
    pairs = F.broadcast(qb).join(cb, "bucket").filter(F.col("vec_id") != F.col("q_id"))
    scored = pairs.select("q_id", "vec_id", _cos("qe", "embedding").alias("cos_sim"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "vec_id", "cos_sim")
    )


def centroid_distances(
    corpus: DataFrame,
    by: str = "label",
    vec: str = "embedding",
    quantize: float = 1048576.0,
    outlier_dist2: float = 1.0,
) -> DataFrame:
    """Per-group centroid + each vector's squared distance to its group's
    centroid — the cluster-conditioned curation primitive (public recipe:
    SemDeDup prunes near-centroid semantic duplicates inside a cluster,
    prototype/noise filters drop far outliers; both read this table).

    Cross-engine exactness: the centroid per dimension is built from
    EXACT integer sums of floor(v * quantize) (order-independent — a
    float sum across rows would be partition-order-dependent and never
    hash-stable), divided back in a fixed op order; the distance is a
    per-row left-to-right fold over the dims. quantize = 2^20 keeps the
    quantization error at 1e-6 of a unit vector while / quantize stays
    EXACT (power of two). Integer headroom: |v|<=~30 -> ~2^25 per
    element, overflow only past ~2^38 rows per group.

    Output: (vec_id, <by>, dist2 double, is_outlier = dist2 >= tau).

    Scale shape: one posexplode (linear in rows x dims) into a map-side-
    combined (group, dim) aggregate -> centroid table of groups x dims
    rows (tiny), reassembled into per-group arrays and BROADCAST back —
    the corpus itself never shuffles for the distance pass.
    """
    q = float(quantize)
    ex = corpus.select(
        F.col(by), F.posexplode(F.col(vec)).alias("dim", "v")
    ).select(by, "dim", F.floor(F.col("v").cast("double") * q).cast("long").alias("fq"))
    sums = ex.groupBy(by, "dim").agg(
        F.sum("fq").alias("s"), F.count("*").alias("n")
    )
    # centroid dim value: (int_sum / n) / Q — both divisions deterministic,
    # the second exact (Q = power of two); same op order in the oracle
    cent = sums.select(
        by,
        "dim",
        ((F.col("s").cast("double") / F.col("n").cast("double")) / F.lit(q)).alias("c"),
    )
    carr = cent.groupBy(by).agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("dim", "c"))), lambda s: s["c"]
        ).alias("_cent")
    )
    joined = corpus.select("vec_id", by, vec).join(F.broadcast(carr), by)
    diff = F.zip_with(
        F.col(vec),
        F.col("_cent"),
        lambda v, c: (F.floor(v.cast("double") * F.lit(q)) / F.lit(q) - c)
        * (F.floor(v.cast("double") * F.lit(q)) / F.lit(q) - c),
    )
    dist2 = F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x)
    return joined.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        by,
        dist2.alias("dist2"),
        (dist2 >= F.lit(float(outlier_dist2))).alias("is_outlier"),
    )
