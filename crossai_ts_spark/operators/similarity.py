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


def _norm(col: str):
    """sqrt(dot(col, col)) — the per-vector factor of the cosine.

    Computed ONCE per vector row (guide §2.3 "don't compute things you
    throw away"): scoring a candidate pair as dot/(na*nb) with
    pre-attached norms runs ONE O(dim) fold per pair instead of three,
    and the floats are bit-identical — the norm fold is the same
    expression either side of the join, and sqrt(aa)*sqrt(bb) stays the
    same multiply."""
    return F.sqrt(F.expr(_DOT.format(a=col, b=col)))


def _cos_with_norms(a: str, b: str, na: str = "_na", nb: str = "_nb"):
    """dot(a,b) / (na * nb) with norms precomputed by :func:`_norm`."""
    return F.expr(_DOT.format(a=a, b=b)) / (F.col(na) * F.col(nb))


def _arr_sql(vals) -> str:
    """SQL array literal of float64 values, built as ONE expression string.

    repr(float) round-trips (shortest correctly-rounded decimal), and
    CAST(string AS DOUBLE) parses correctly-rounded, so each element is
    bit-identical to the F.lit(float) literal it replaces — but the whole
    array costs one py4j call instead of one per element (measured: the 18
    plane literals of the 3-table near-dup bucket cost ~1.06 s of driver
    time via F.lit lists, ~0 via expression strings)."""
    return "array(" + ",".join(f"CAST('{x!r}' AS DOUBLE)" for x in vals) + ")"


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """Brute-force cosine top-k; queries broadcast (must be the small side)."""
    qv = queries.select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe"), _norm("embedding").alias("_na")
    )
    cv = corpus.select("vec_id", "embedding", _norm("embedding").alias("_nb"))
    pairs = F.broadcast(qv).crossJoin(cv).filter(F.col("vec_id") != F.col("q_id"))
    scored = pairs.select("q_id", "vec_id", _cos_with_norms("qe", "embedding").alias("cos_sim"))
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
    # the ENTIRE bucket expression as one SQL string -> one py4j call.
    # Building it Column-by-Column (F.lit per element, a when/otherwise per
    # bit) cost ~0.35 s of driver time PER TABLE at dim=64/n_bits=6
    # (measured r8); the parsed expression is semantically identical — same
    # left fold per plane, same left-assoc sum of bit terms, CAST-from-repr
    # literals bit-identical to F.lit floats.
    terms = []
    for i, p in enumerate(planes):
        dot = _DOT.format(a=vec, b=_arr_sql(float(x) for x in p))
        terms.append(
            f"(CASE WHEN {dot} > 0 THEN CAST({1 << i} AS BIGINT) "
            f"ELSE CAST(0 AS BIGINT) END)"
        )
    return F.expr("(" + " + ".join(terms) + ")")


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
    # ONE array<array<double>> literal + ONE transform lambda, not n_cent
    # separate fold expressions: per-centroid exprs compiled a plan whose
    # analysis+codegen dominated wall time (n_cent x dim literal casts
    # measured a ~1 MB task binary). `_sn` is materialized as a column
    # first — referencing it inside the lambda is a per-row read, while an
    # inlined expression would re-evaluate the self-dot per centroid
    # (the Catalyst HOF-inlining trap). The whole expression ships as ONE
    # SQL string (one py4j call; F.lit-per-element literals cost ~0.3 s of
    # driver time for a 16x64 model — r8) with CAST-from-repr literals
    # bit-identical to F.lit floats.
    carr = "array(" + ",".join(_arr_sql(float(x) for x in c) for c in cents) + ")"
    out = df.withColumn("_sn", F.expr(f"sqrt({_DOT.format(a=vec, b=vec)})"))
    scores = F.expr(
        f"transform({carr}, c -> {_DOT.format(a=vec, b='c')}"
        f" / (_sn * sqrt({_DOT.format(a='c', b='c')})))"
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
    cb = ivf_assign(corpus, cents, vec).select(
        "vec_id", vec, "cell", _norm(vec).alias("_nb")
    )
    qv = queries.select(F.col("vec_id").alias("q_id"), F.col(vec).alias("qe"))
    qb = ivf_assign(qv, cents, vec="qe")
    qp = qb.select(
        "q_id", "qe", _norm("qe").alias("_na"), F.posexplode("cscore").alias("cid0", "score")
    )
    wp = Window.partitionBy("q_id").orderBy(F.desc("score"), "cid0")
    qp = (
        qp.withColumn("pr", F.row_number().over(wp))
        .filter(F.col("pr") <= n_probe)
        .select("q_id", "qe", "_na", (F.col("cid0") + 1).cast("long").alias("cell"))
    )
    pairs = F.broadcast(qp).join(cb, "cell").filter(F.col("vec_id") != F.col("q_id"))
    scored = pairs.select("q_id", "vec_id", _cos_with_norms("qe", vec).alias("cos_sim"))
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
    cb = lsh_bucket(corpus, dim, n_bits, seed).withColumn("_nb", _norm("embedding"))
    qb0 = lsh_bucket(queries, dim, n_bits, seed).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("qe"),
        _norm("embedding").alias("_na"),
        "bucket",
    )
    if n_probes > 1:
        flips = [F.col("bucket").cast("long")] + [
            F.col("bucket").cast("long").bitwiseXOR(F.lit(1 << i).cast("long"))
            for i in range(min(n_probes - 1, n_bits))
        ]
        qb = qb0.select(
            "q_id", "qe", "_na", F.explode(F.array(*flips)).alias("bucket")
        )
    else:
        qb = qb0
    # the probe buckets of one query are pairwise-distinct XOR values and a
    # corpus vector lives in exactly one bucket, so no candidate repeats —
    # no dedup shuffle needed
    pairs = F.broadcast(qb).join(cb, "bucket").filter(F.col("vec_id") != F.col("q_id"))
    scored = pairs.select("q_id", "vec_id", _cos_with_norms("qe", "embedding").alias("cos_sim"))
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
