"""Deduplication operators for training-data pipelines.

All hashing is expressed with engine-portable primitives (md5 hex → bigint)
so each variant has a DuckDB oracle; all heavy lifting is JVM-side
(explode/groupBy/join) — no Python in the hot path.

Scale notes (the part that matters at 10^12 docs):
  * exact:       one shuffle on the content hash; map-side combine.
  * minhash-LSH: shingles -> K minhashes (single groupBy over exploded
    shingles with K aggregates) -> bands -> bucket join. Candidate pairs
    only — never the O(n^2) cross join.
  * simhash:     64-bit signature from shingle-hash bit votes; near-dup =
    bucket join on rotated prefixes (here: exact-signature match + banding).
  * ngram-jaccard: candidate pairs from a shared-shingle equi-join,
    Jaccard = common/(|a|+|b|-common) from exact counts.
  * embedding:   cosine near-dup above threshold via block-broadcast join
    (delegates to operators/similarity.py at scale).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

# md5-hex -> bigint: same value in DuckDB via ('0x'||substr(md5(s),1,15))::BIGINT
def _h64(col):
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 15), 16, 10).cast("long")


def shingles(docs: DataFrame, n: int = 3, text: str = "text", distinct: bool = True) -> DataFrame:
    """(doc_id, shingle_hash) — word n-gram fingerprints per doc.

    distinct=True (default) dedups per doc — required by set-semantics
    consumers (Jaccard counts, simhash votes would change). MinHash-only
    consumers pass distinct=False: min over a multiset equals min over its
    set, so the signatures are identical while the pipeline skips its
    single biggest exchange (the full-shingle-table dedup shuffle)."""
    words = F.filter(F.split(F.col(text), " "), lambda w: w != "")
    d = docs.select(F.col("doc_id").cast("string").alias("doc_id"), words.alias("ws"))
    d = d.filter(F.size("ws") >= n)
    sh = F.transform(
        F.sequence(F.lit(0), F.size("ws") - n),
        lambda i: F.concat_ws("\x1f", F.slice("ws", i + 1, n)),
    )
    out = d.select("doc_id", F.explode(sh).alias("shingle")).select(
        "doc_id", _h64(F.col("shingle")).alias("sh")
    )
    return out.distinct() if distinct else out


def dedup_exact(docs: DataFrame, text: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: keep min doc_id per content hash."""
    h = docs.select(F.col("doc_id").cast("string").alias("doc_id"), F.md5(F.col(text).cast("binary")).alias("h"))
    w = Window.partitionBy("h").orderBy("doc_id")
    return (
        h.withColumn("rn", F.row_number().over(w))
        .withColumn("is_canonical", F.col("rn") == 1)
        .drop("rn")
    )


def minhash_signatures(sh: DataFrame, k: int = 16, prime: int = 2147483647) -> DataFrame:
    """K minhashes per doc in ONE aggregation over the shingle table.

    h_i(x) = (a_i * x + b_i) mod p with fixed odd constants — portable SQL.
    """
    aggs = [
        F.min((F.col("sh") % prime * (2 * i + 1) + (i * 40503 + 17)) % prime).alias(f"mh{i}")
        for i in range(k)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(
    sig: DataFrame, k: int = 16, band_size: int = 2, max_bucket: int = 1000
) -> DataFrame:
    """Band the signature, bucket-join, emit candidate pairs (a < b).

    Degenerate buckets (> max_bucket docs — e.g. a corpus full of identical
    boilerplate) would emit O(bucket^2) join rows; they are dropped before
    the self-join. Such docs are near-identical and caught by exact dedup;
    the cap turns a quadratic blow-up into a bounded per-bucket cost.
    """
    n_bands = k // band_size
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "_", *[F.col(f"mh{b * band_size + j}").cast("string") for j in range(band_size)]
                ).alias("key"),
            )
            for b in range(n_bands)
        ]
    )
    bt = sig.select("doc_id", F.explode(bands).alias("bk")).select(
        "doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    if max_bucket is not None:
        # oversized-bucket set is tiny by construction (each member is a
        # bucket with > max_bucket rows), so: map-side-combined groupBy ->
        # broadcast left_anti. No sort, and the band table itself never
        # shuffles for the cap (the r2 window-count version sorted the full
        # band table and cost 1.9x on minhash_lsh).
        #
        # The band table feeds BOTH the cap aggregate (a separate broadcast
        # job) and the join probe; without a persist the whole
        # shingle->minhash upstream (two shuffles) runs twice. It is the
        # signature "model" — n_docs x n_bands narrow rows, orders of
        # magnitude smaller than the corpus — so MEMORY_AND_DISK is safe at
        # any scale (a production pipeline would write it to a table).
        # Tracked so harnesses can caching.release_tracked() after the
        # consuming action rather than pinning storage for the app lifetime.
        from ..caching import tracked_persist

        bt = tracked_persist(bt, StorageLevel.MEMORY_AND_DISK)
        big = (
            bt.groupBy("band", "key")
            .agg(F.count("*").alias("_bn"))
            .filter(F.col("_bn") > max_bucket)
            .select("band", "key")
        )
        bt = bt.join(F.broadcast(big), ["band", "key"], "left_anti")
    a = bt.alias("a")
    b = bt.alias("b")
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    sh: DataFrame, threshold: float = 0.8, max_df: int = 1000
) -> DataFrame:
    """Jaccard over the df-capped shingle universe for candidate pairs.

    A shingle present in d docs emits d^2 self-join rows, so near-universal
    shingles (web boilerplate) make the naive join quadratic. Standard cap:
    drop shingles with document frequency > max_df FIRST, then compute both
    the candidate commons AND the per-doc set sizes over the surviving
    shingles — Jaccard is exact over the capped universe, and the join cost
    is bounded by max_df^2 per shingle.
    """
    # the shingle table (md5 per shingle + per-doc distinct — CPU-heavy
    # upstream) feeds FOUR consumers here: the df-cap aggregate, the
    # per-doc sizes, and both sides of the candidate self-join. Persist by
    # the r8 decision rule (CPU-heavy shared subtree); tracked for release.
    from ..caching import tracked_persist

    sh = tracked_persist(sh, StorageLevel.MEMORY_AND_DISK)
    if max_df is not None:
        # near-universal shingles (df > max_df) are a tiny set: map-side
        # combined groupBy -> broadcast left_anti (no sort of the full
        # shingle table; its one shuffle is the self-join below)
        hot = (
            sh.groupBy("sh")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") > max_df)
            .select("sh")
        )
        sh = sh.join(F.broadcast(hot), ["sh"], "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, F.col("a.sh") == F.col("b.sh"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    j = (
        common.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .withColumn(
            "jaccard",
            F.col("common").cast("double")
            / (F.col("na") + F.col("nb") - F.col("common")).cast("double"),
        )
    )
    return j.filter(F.col("jaccard") >= threshold).select("doc_a", "doc_b", "common", "jaccard")


def simhash_signatures(sh: DataFrame, bits: int = 32) -> DataFrame:
    """SimHash: per-bit majority vote over shingle hashes.

    bit_i(doc) = 1 if sum over shingles of (2*bit_i(h)-1) > 0.
    Expressed as `bits` conditional sums in one groupBy — portable SQL.
    """
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("sh"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(bits)
    ]
    votes = sh.groupBy("doc_id").agg(*aggs)
    sig = None
    for i in range(bits):
        term = F.when(F.col(f"v{i}") > 0, F.lit(2**i).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig + term
    return votes.select("doc_id", sig.alias("simhash"))


def _cos_pairs(pairs: DataFrame, threshold: float) -> DataFrame:
    """Score (ea, eb) pairs that carry pre-attached norms _na/_nb.

    The norms are computed ONCE per vector row (see similarity._norm) so a
    pair costs one O(dim) fold, not three; dot/(na*nb) is bit-identical to
    the inlined dot/(sqrt(aa)*sqrt(bb)) — the same fold produces na/nb,
    and the multiply/divide order is unchanged."""
    dot = (
        "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
        "cast(0.0 as double), (acc, v) -> acc + v)"
    )
    cos = F.expr(dot.format(a="ea", b="eb")) / (F.col("_na") * F.col("_nb"))
    return pairs.select("id_a", "id_b", cos.alias("cos_sim")).filter(F.col("cos_sim") >= threshold)


def _norm_expr(col: str):
    dot = (
        "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
        "cast(0.0 as double), (acc, v) -> acc + v)"
    )
    return F.sqrt(F.expr(dot.format(a=col, b=col)))


def embedding_near_dups(
    emb: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    n_bits: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    max_bucket: int = 10000,
    exact: bool = False,
) -> DataFrame:
    """Cosine near-dup pairs above threshold.

    Default path: multi-table random-hyperplane LSH — each vector hashed
    into `n_tables` independent sign-bucket tables; candidate pairs share a
    bucket in ANY table (the multi-probe analogue: a pair split by one
    hyperplane set still collides in another table). Only within-bucket
    pairs are scored, so cost is sum(bucket^2) per table, never corpus^2;
    degenerate buckets are capped at max_bucket (identical vectors — exact
    dedup's job). Recall for cos >= 0.95 pairs with 8-bit tables is
    (1 - (1-p^8)^4), p = 1 - acos(0.95)/pi ~ 0.9, i.e. ~97%.

    exact=True keeps the brute-force cross join (test/oracle sizes only).
    """
    a = emb.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"),
        _norm_expr("embedding").alias("_na"),
    )
    b = emb.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"),
        _norm_expr("embedding").alias("_nb"),
    )
    if exact:
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
        return _cos_pairs(pairs, threshold)

    from .similarity import lsh_bucket_col

    base = emb.select("vec_id", "embedding")
    # every table's bucket in ONE projection over ONE scan (the 4-way
    # union-of-selects form re-read the embeddings once per table),
    # exploded to the same (tbl, vec_id, bucket) rows
    tb = F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                lsh_bucket_col(dim, n_bits, seed + 1000003 * t).alias("bucket"),
            )
            for t in range(n_tables)
        ]
    )
    tabs = base.select("vec_id", F.explode(tb).alias("tb")).select(
        F.col("tb.tbl").alias("tbl"), "vec_id", F.col("tb.bucket").alias("bucket")
    )
    # the bucket table feeds the cap aggregate AND both sides of the
    # candidate self-join — without a persist the n_tables x n_bits
    # hyperplane folds run three times (measured 3 x 0.48 s at sf0.1).
    # Narrow (tbl, vec_id, bucket) rows, ~10x smaller than the embeddings
    # themselves — the same signature-"model" persist as the MinHash band
    # table above; tracked so harnesses can release it after the action.
    from ..caching import tracked_persist

    tabs = tracked_persist(tabs, StorageLevel.MEMORY_AND_DISK)
    if max_bucket is not None:
        # oversized buckets are a tiny set -> broadcast left_anti (the full
        # bucket table never shuffles for the cap)
        big = (
            tabs.groupBy("tbl", "bucket")
            .agg(F.count("*").alias("_bn"))
            .filter(F.col("_bn") > max_bucket)
            .select("tbl", "bucket")
        )
        tabs = tabs.join(F.broadcast(big), ["tbl", "bucket"], "left_anti")
    ta = tabs.alias("a")
    tb = tabs.alias("b")
    cand = (
        ta.join(tb, ["tbl", "bucket"])
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"))
        .distinct()
    )
    pairs = cand.join(a, "id_a").join(b, "id_b")
    return _cos_pairs(pairs, threshold)


def _windows(docs: DataFrame, w: int, text: str = "text") -> DataFrame:
    """(doc_id, off, h): every stride-1 w-token window's 64-bit hash.
    Rows are round-robined to defaultParallelism first when the scan has
    fewer partitions — the explode multiplies ROWS by n_tok while scan
    parallelism follows BYTES (no-op at real table sizes)."""
    d = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col(text).alias("t"),
        F.length(text).cast("long").alias("n_tok"),
    ).filter(F.length(text) >= w)
    spark = docs.sparkSession
    par = spark.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() < par:
        d = d.repartition(par)
    return d.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0).cast("long"), F.col("n_tok") - w)).alias("off"),
        "t",
    ).select("doc_id", "off", _h64(F.expr(f"substring(t, off + 1, {w})")).alias("h"))


def contamination_scores(
    train: DataFrame, eval_docs: DataFrame, w: int = 50, text: str = "text"
) -> DataFrame:
    """Benchmark decontamination (the public GPT-3/PaLM-style n-gram
    overlap pass): for each training doc, the fraction of its w-token
    windows that appear anywhere in the eval/benchmark set.

    Scale shape: eval window hashes are DISTINCT'd (benchmarks are tiny
    next to a training corpus) and semi-joined against the training
    windows — linear in training tokens, one map-side-combined aggregate
    per side, no pairing stage. Returns (doc_id, n_windows,
    n_contaminated, contam_frac); docs shorter than w report 0 windows
    and frac 0.
    """
    # wt feeds both the contamination-hit count and the per-doc totals but
    # is NOT persisted (r8): with only two cheap consumers (a semi join
    # and a count groupBy) the interleaved A/B measured persist slightly
    # slower (1.57 s vs 1.42 s) — storing the 8M-row table costs more
    # than one recompute. duplicated_spans persists the same table because
    # three heavier consumers read it there.
    wt = _windows(train, w, text)
    eh = _windows(eval_docs, w, text).select("h").distinct()
    hits = wt.join(eh, "h", "semi").groupBy("doc_id").agg(
        F.count("*").alias("n_contaminated")
    )
    totals = wt.groupBy("doc_id").agg(F.count("*").alias("n_windows"))
    base = train.select(F.col("doc_id").cast("string").alias("doc_id")).distinct()
    return (
        base.join(totals, "doc_id", "left")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_windows", F.lit(0)).cast("long").alias("n_windows"),
            F.coalesce("n_contaminated", F.lit(0)).cast("long").alias("n_contaminated"),
        )
        .withColumn(
            "contam_frac",
            F.when(
                F.col("n_windows") > 0,
                F.col("n_contaminated").cast("double") / F.col("n_windows").cast("double"),
            ).otherwise(F.lit(0.0)),
        )
    )


def duplicated_spans(
    docs: DataFrame, w: int = 50, text: str = "text", keep_first: bool = False
) -> DataFrame:
    """Substring-level dedup, find+merge stages (public method: Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better"):
    every w-token window that occurs more than once ANYWHERE in the corpus
    is a duplicated span; per doc, overlapping/adjacent duplicated windows
    are merged into maximal half-open spans [span_start, span_end) over
    token offsets. Tokens here are the corpus' code-point tokens (one char
    = one token, the repo-wide convention).

    keep_first=False marks EVERY occurrence (the practical both-copies
    variant the public deduplicate-text-datasets tooling ships);
    keep_first=True exempts each window hash's canonical occurrence — the
    (doc_id, off)-smallest — so exactly one copy of each duplicated
    region survives removal, the paper's semantics.

    Scale shape (the distributed analogue of the paper's suffix array,
    which is single-node): stride-1 window hashing is LINEAR in corpus
    token count — one explode (no pairing, so a boilerplate window shared
    by d docs costs d rows, never d^2), one map-side-combined groupBy on
    the window hash, one semi join back (keep_first adds a min-struct
    aggregate + anti join — hot-key-flat even when one window hash has
    10^8 occurrences; no per-hash sort anywhere), one per-doc ordered
    window for the interval merge. No O(n^2) stage exists to cap.
    """
    # the window-hash table feeds BOTH the duplicate-count aggregate and the
    # semi-join probe (plus the canonical-occurrence pass under keep_first):
    # without a persist the stride-1 explode + per-window md5 — the single
    # most expensive stage, linear in corpus tokens — runs twice (three
    # times with keep_first). Same persist-the-derived-table pattern as the
    # KMV prefilter (r7): narrow (doc_id, off, h) rows, MEMORY_AND_DISK so
    # it spills rather than evicts at scale, tracked for release.
    from ..caching import tracked_persist

    wins = tracked_persist(_windows(docs, w, text), StorageLevel.MEMORY_AND_DISK)
    dup = wins.groupBy("h").agg(F.count("*").alias("_c")).filter(F.col("_c") > 1).select("h")
    dw = wins.join(dup, "h", "semi")
    if keep_first:
        # canonical occurrence = (doc_id, off)-smallest, via a min-struct
        # aggregate (lexicographic struct ordering == ORDER BY doc_id, off)
        # + anti join — NOT row_number over partitionBy(h): a boilerplate
        # window shared by 10^8 docs would sort its whole occurrence list
        # on one task, while min() stays map-side-combined and hot-key-flat
        canon = (
            dw.groupBy("h")
            .agg(F.min(F.struct("doc_id", "off")).alias("c"))
            .select("h", F.col("c.doc_id").alias("doc_id"), F.col("c.off").alias("off"))
        )
        dw = dw.join(canon, ["h", "doc_id", "off"], "left_anti")
    dw = dw.select("doc_id", "off")
    wspec = Window.partitionBy("doc_id").orderBy("off")
    prev_end = F.max(F.col("off") + w).over(wspec.rowsBetween(Window.unboundedPreceding, -1))
    isl = dw.withColumn(
        "ni", F.when(prev_end.isNull() | (F.col("off") > prev_end), 1).otherwise(0)
    ).withColumn("island", F.sum("ni").over(wspec.rowsBetween(Window.unboundedPreceding, 0)))
    return (
        isl.groupBy("doc_id", "island")
        .agg(F.min("off").alias("span_start"), (F.max("off") + w).cast("long").alias("span_end"))
        .select("doc_id", "span_start", "span_end")
    )


def substring_dedup_stats(
    docs: DataFrame, w: int = 50, text: str = "text", keep_first: bool = False
) -> DataFrame:
    """Per-doc duplicated-span inventory: (doc_id, n_tok, n_spans,
    dup_tokens, dup_frac). Docs shorter than w or with no duplicated
    window report 0 spans."""
    spans = duplicated_spans(docs, w, text, keep_first=keep_first)
    agg = spans.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"),
        F.sum(F.col("span_end") - F.col("span_start")).alias("dup_tokens"),
    )
    base = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.length(text).cast("long").alias("n_tok"),
    ).filter(F.col("n_tok") > 0)
    return (
        base.join(agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_tok",
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
        )
        .withColumn("dup_frac", F.col("dup_tokens").cast("double") / F.col("n_tok").cast("double"))
    )


def apply_substring_dedup(
    docs: DataFrame, w: int = 50, text: str = "text", keep_first: bool = False
) -> DataFrame:
    """Removal mask applied: drop the marked duplicated spans (both copies
    by default; keep_first=True leaves the canonical occurrence of each
    duplicated window in place — the Lee et al. keep-one semantics) and
    stitch the kept segments back together.

    Built join-free from the span table: kept intervals are the per-doc
    complement of the merged spans (lag(span_end) .. span_start, plus the
    [last_end, n_tok) tail), each sliced from the original text and
    concatenated in offset order — all JVM-side string ops, no fold state.
    Returns (doc_id, n_tok, clean_len, clean_text).
    """
    # spans feeds the gap windows, the tail aggregate AND the has-span flag
    # below — three otherwise-recomputed runs of the whole find+merge
    # pipeline. Merged spans are a per-doc summary (orders of magnitude
    # smaller than the corpus), so the persist is cheap at any scale.
    from ..caching import tracked_persist

    spans = tracked_persist(
        duplicated_spans(docs, w, text, keep_first=keep_first), StorageLevel.MEMORY_AND_DISK
    )
    base = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col(text).alias("t"),
        F.length(text).cast("long").alias("n_tok"),
    ).filter(F.col("n_tok") > 0)
    wspec = Window.partitionBy("doc_id").orderBy("span_start")
    gaps = spans.select(
        "doc_id",
        F.coalesce(F.lag("span_end").over(wspec), F.lit(0).cast("long")).alias("ks"),
        F.col("span_start").alias("ke"),
    )
    tails = spans.groupBy("doc_id").agg(F.max("span_end").alias("ks")).withColumn(
        "ke", F.lit(None).cast("long")
    )
    segs = gaps.unionByName(tails).join(base, "doc_id")
    segs = segs.withColumn("ke", F.coalesce("ke", "n_tok")).filter(F.col("ke") > F.col("ks"))
    seg_txt = F.expr("substring(t, ks + 1, ke - ks)")
    pieces = segs.groupBy("doc_id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.sort_array(F.collect_list(F.struct(F.col("ks"), seg_txt.alias("seg")))),
                lambda s: s["seg"],
            ),
        ).alias("clean_text")
    )
    # docs fully covered by spans have no kept segment rows — their clean
    # text is "", NOT the original (only span-free docs keep t verbatim)
    spd = spans.select("doc_id").distinct().withColumn("_has", F.lit(1))
    return (
        base.join(pieces, "doc_id", "left")
        .join(spd, "doc_id", "left")
        .select(
            "doc_id",
            "n_tok",
            F.when(F.col("_has").isNull(), F.col("t"))
            .otherwise(F.coalesce("clean_text", F.lit("")))
            .alias("clean_text"),
        )
        .withColumn("clean_len", F.length("clean_text").cast("long"))
        .select("doc_id", "n_tok", "clean_len", "clean_text")
    )


def segment_dedup(
    docs: DataFrame,
    seg_words: int = 10,
    text: str = "text",
    sep: str = " ",
) -> DataFrame:
    """Repeated-segment inventory — the CCNet/RefinedWeb line-level dedup
    recipe (public method: dedupe segments whose exact content recurs
    anywhere in the corpus; boilerplate headers/footers dominate). A
    segment here is ``seg_words`` consecutive ``sep``-separated words
    (non-overlapping; ragged tail kept): corpora with real line structure
    pass sep='\\n' and seg_words=1 for verbatim CCNet lines — this corpus
    is one space-separated stream, so fixed word blocks are the honest
    equivalent.

    Output per doc: (doc_id, n_segs, n_dup_segs, dup_seg_frac). A segment
    is duplicated when its exact text occurs >1 time corpus-wide (the
    segment STRING is the key — no hash function to match across engines).

    Scale shape: one explode (linear in corpus words), one map-side-
    combined groupBy on segment text, one broadcast-threshold-free join
    back, one per-doc aggregate. A boilerplate segment shared by d docs
    costs d rows — no pairing stage, the substring-dedup argument at
    segment granularity.
    """
    if seg_words <= 0:
        raise ValueError(f"seg_words must be positive, got {seg_words}")
    # sep is treated as a LITERAL separator: split on re.escape(sep) (F.split
    # takes a regex) and rejoin via concat_ws's plain-string separator arg —
    # never interpolated into SQL text, so quotes/regex metachars are safe
    base = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.split(F.col(text), re.escape(sep)).alias("_w"),
    ).filter(F.size("_w") > 0)
    n_segs_col = F.ceil(F.size("_w") / F.lit(float(seg_words))).cast("int")
    segs_col = F.transform(
        F.sequence(F.lit(0), n_segs_col - 1),
        lambda si: F.concat_ws(sep, F.slice("_w", si * seg_words + 1, seg_words)),
    )
    segs = base.select("doc_id", F.posexplode(segs_col).alias("seg_idx", "seg"))
    dup = (
        segs.groupBy("seg")
        .agg(F.count("*").alias("_c"))
        .filter(F.col("_c") > 1)
        .select("seg")
    )
    marked = segs.join(dup.withColumn("_dup", F.lit(1)), "seg", "left")
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_segs"),
            F.sum(F.coalesce("_dup", F.lit(0))).cast("long").alias("n_dup_segs"),
        )
        .withColumn(
            "dup_seg_frac",
            F.col("n_dup_segs").cast("double") / F.col("n_segs").cast("double"),
        )
    )


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
    check_every: int = 2,
) -> DataFrame:
    """Dedup clusters: connected components over a near-dup pair graph via
    min-label propagation — each node's label drops to the smallest id
    reachable (component id = min member id, so the output is a pure
    function of the edge set, independent of plan or iteration count).

    The per-round step is one shuffle join (labels onto edge endpoints) +
    one map-side-combined groupBy min (the GraphX/Pregel CC shape, O(V+E)
    per round), followed by one pointer-jumping self-join (follow my
    label's label), so a chain of length d converges in O(log d) rounds —
    not the O(d) of plain neighbor-min — while clique-ish LSH near-dup
    clusters still finish in 2-3. Each round materializes via
    localCheckpoint: it truncates the lineage (the iterated plan would
    otherwise grow unboundedly) and makes the convergence probe pay for
    each round once.

    Driver-side control is one scalar count() every ``check_every`` rounds
    (not every round): the probe compares the latest round against the one
    before it, so a zero still means "last round was a no-op = fixpoint".
    Skipping intermediate probes halves the control-plane jobs on deep
    graphs at the cost of at most ``check_every - 1`` extra (no-op,
    bounded-shuffle) rounds after convergence. The result is unchanged —
    extra rounds past the fixpoint are identities. Measured on the
    400k-node probe (1000 chains of 400, local[8]): check_every=2 ran
    2.6x faster than per-round probing with identical components.
    """
    if check_every < 1:
        raise ValueError(f"check_every must be >= 1, got {check_every}")
    # the edge pipeline (often a full LSH candidate computation) is
    # materialized ONCE; the symmetric closure is built from the cached
    # edges (the old sym.union(sym.swap) checkpoint ran the upstream twice)
    e0 = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).localCheckpoint()
    nodes = e0.select(F.col("a").alias("n")).union(e0.select(F.col("b").alias("n"))).distinct()
    # self-loops fold the own-label term into the neighbor-min aggregate:
    # min over {own} ∪ neighbors in ONE join+groupBy per round instead of a
    # neighbor-min join followed by a second label join + least()
    sym = (
        e0.union(e0.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .union(nodes.select(F.col("n").alias("a"), F.col("n").alias("b")))
        .localCheckpoint()
    )
    # label init is a narrow read of the cached self-loops — no extra
    # distinct/checkpoint job
    lbl = sym.filter(F.col("a") == F.col("b")).select(
        F.col("a").alias("node"), F.col("a").alias("comp")
    )
    for it in range(max_iter):
        new = (
            sym.join(lbl.select(F.col("node").alias("b"), F.col("comp").alias("bcomp")), "b")
            .groupBy("a")
            .agg(F.min("bcomp").alias("comp"))
            .select(F.col("a").alias("node"), "comp")
        )
        # pointer jumping: comp <- min(comp, comp[comp]) — label paths halve
        # every round, giving O(log diameter) total rounds
        ptr = new.select(F.col("node").alias("c_node"), F.col("comp").alias("c_comp"))
        new = (
            new.join(ptr, new["comp"] == ptr["c_node"], "left")
            .select("node", F.least(F.col("comp"), F.coalesce(F.col("c_comp"), F.col("comp"))).alias("comp"))
        )
        # lazy checkpoint: still truncates lineage every round, but the
        # materialization rides the next probe's job instead of costing one
        # eager job per round (probing-only checkpoints were ALSO tried and
        # measured slower — the probe then recomputes the uncheckpointed
        # intermediate round and plans a 2x-deeper tree)
        new = new.localCheckpoint(eager=False)
        if (it + 1) % check_every == 0 or it == max_iter - 1:
            changed = (
                new.join(lbl.select("node", F.col("comp").alias("old")), "node")
                .filter(F.col("comp") != F.col("old"))
                .count()
            )
            if changed == 0:
                return new
        lbl = new
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
