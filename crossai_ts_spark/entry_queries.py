"""Registry backing __spark_entry__.queries() / oracle_sql().

Each entry: name -> (spark_fn(spark, sf_dir) -> DataFrame, duckdb_sql | None).
The driver compares row count + schema + order-insensitive value hash at
sf=0.01, so every query is built for CROSS-ENGINE EXACTNESS:

  * integer math wherever possible (token code points, cents via
    round(value*100) — the double product is IEEE-identical in both engines,
    so the rounded bigint is identical too; l_quantity is integral)
  * float results come only from single divisions / sqrt of exact integers,
    or from identically-ordered sequential folds (Spark ``aggregate`` and
    DuckDB ``list_reduce`` are both left folds)
  * every computed column aliased identically on both sides

Queries map 1:1 to SURVEY.md §2 operators; reference file:line cited per
entry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators.rollup import cascade_native, rollup_native
from .operators.salted import salted_tier_source_rollup
from .sources.tokenize import tokenize_documents

REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}


def q(name: str, sql: str | None):
    def deco(fn):
        REGISTRY[name] = (fn, sql)
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


# DuckDB CTE shared by token queries: documents -> long (doc_id, off, tok)
SQL_PTS = """
WITH tok AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, source, text,
         length(text)::BIGINT AS n_tok
  FROM documents WHERE length(text) > 0
), ex AS (
  SELECT doc_id, source, n_tok, text,
         unnest(range(1, n_tok + 1)) AS i
  FROM tok
), pts AS (
  SELECT doc_id, source, n_tok, (i - 1)::BIGINT AS off,
         unicode(text[i])::BIGINT AS tok
  FROM ex
)
"""

# events normalized to exact integers: minute + cents
SQL_EV = """
WITH ev AS (
  SELECT event_id, user_id, event_type,
         epoch_us(ts) AS us,
         epoch_us(ts) // 60000000 AS minute,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
"""


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
        (F.unix_micros("ts") / F.lit(60000000)).cast("long").alias("minute"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )


# =====================================================================
# A. Token / rollup family (documents as tokenized sequences)
# =====================================================================


@q(
    "tokenize_stats",
    SQL_PTS
    + """
SELECT doc_id, source, n_tok,
       MIN(tok) AS t_min, MAX(tok) AS t_max, SUM(tok) AS t_sum,
       arg_max(tok, off) AS t_last
FROM pts GROUP BY doc_id, source, n_tok
""",
)
def tokenize_stats(spark, sf_dir):
    """Loader parity: documents -> sequences (caits/loading/_csv_read.py:11-66)."""
    seqs = tokenize_documents(load(spark, sf_dir, "documents"))
    return seqs.select(
        "doc_id",
        "source",
        F.col("n_tok").cast("long").alias("n_tok"),
        F.expr("array_min(tokens)").cast("long").alias("t_min"),
        F.expr("array_max(tokens)").cast("long").alias("t_max"),
        F.expr("aggregate(tokens, cast(0 as bigint), (a, x) -> a + x)").alias("t_sum"),
        F.expr("element_at(tokens, -1)").cast("long").alias("t_last"),
    )


_ROLLUP_SQL = (
    SQL_PTS
    + """
SELECT doc_id, source, (off // {w}) * {w} AS window_start,
       MIN(tok) AS t_min, MAX(tok) AS t_max, SUM(tok) AS t_sum,
       COUNT(*)::BIGINT AS t_cnt, arg_max(tok, off) AS t_last,
       SUM(tok)::DOUBLE / COUNT(*)::DOUBLE AS t_mean
FROM pts GROUP BY doc_id, source, (off // {w}) * {w}
"""
)


def _tier_out(tiers: DataFrame) -> DataFrame:
    return tiers.select(
        "doc_id",
        "source",
        "window_start",
        F.col("t_min").cast("long").alias("t_min"),
        F.col("t_max").cast("long").alias("t_max"),
        "t_sum",
        "t_cnt",
        F.col("t_last").cast("long").alias("t_last"),
        "t_mean",
    )


@q("rollup_tier1", _ROLLUP_SQL.format(w=32))
def rollup_tier1(spark, sf_dir):
    """Tumbling rollup W=32 (caits/windowing.py:188-202 + fe/_statistical.py)."""
    seqs = tokenize_documents(load(spark, sf_dir, "documents"))
    return _tier_out(rollup_native(seqs, w=32))


@q("rollup_tier2_cascade", _ROLLUP_SQL.format(w=256))
def rollup_tier2_cascade(spark, sf_dir):
    """Tier-2 from the cascade (re-agg identity) vs direct SQL at W=256."""
    seqs = tokenize_documents(load(spark, sf_dir, "documents"))
    t = cascade_native(seqs, w=32, fanout=8, tiers=2)
    return _tier_out(t.filter(F.col("tier") == 2).drop("tier"))


@q(
    "rollup_source_windows",
    SQL_PTS
    + """
SELECT source, (off // 32) * 32 AS window_start,
       MIN(tok) AS t_min, MAX(tok) AS t_max, SUM(tok) AS t_sum,
       COUNT(*)::BIGINT AS t_cnt,
       SUM(tok)::DOUBLE / COUNT(*)::DOUBLE AS t_mean
FROM pts GROUP BY source, (off // 32) * 32
""",
)
def rollup_source_windows(spark, sf_dir):
    """Cross-doc continuous aggregate w/ salted two-phase shuffle (SURVEY §4.3.1)."""
    seqs = tokenize_documents(load(spark, sf_dir, "documents"))
    t1 = rollup_native(seqs, w=32)
    out = salted_tier_source_rollup(t1, n_salts=8).drop("tier", "n_docs")
    return out.select(
        "source",
        "window_start",
        F.col("t_min").cast("long").alias("t_min"),
        F.col("t_max").cast("long").alias("t_max"),
        "t_sum",
        "t_cnt",
        "t_mean",
    )


@q(
    "trim_signal",
    SQL_PTS
    + """
SELECT doc_id,
       MIN(CASE WHEN tok >= 97 THEN off END) AS trim_start,
       MAX(CASE WHEN tok >= 97 THEN off END) AS trim_end,
       MAX(CASE WHEN tok >= 97 THEN off END)
         - MIN(CASE WHEN tok >= 97 THEN off END) + 1 AS trimmed_len
FROM pts GROUP BY doc_id
HAVING MIN(CASE WHEN tok >= 97 THEN off END) IS NOT NULL
""",
)
def trim_signal(spark, sf_dir):
    """Strip leading/trailing low values (caits/preprocessing.py:103-130)."""
    seqs = tokenize_documents(load(spark, sf_dir, "documents"))
    pts = seqs.select(
        "doc_id", F.posexplode("tokens").alias("off", "tok")
    ).select("doc_id", F.col("off").cast("long").alias("off"), "tok")
    g = pts.groupBy("doc_id").agg(
        F.min(F.when(F.col("tok") >= 97, F.col("off"))).alias("trim_start"),
        F.max(F.when(F.col("tok") >= 97, F.col("off"))).alias("trim_end"),
    )
    return g.filter(F.col("trim_start").isNotNull()).select(
        "doc_id",
        "trim_start",
        "trim_end",
        (F.col("trim_end") - F.col("trim_start") + 1).alias("trimmed_len"),
    )


@q(
    "chunks",
    SQL_PTS
    + """
SELECT doc_id, CAST(ceil(n_tok / 100.0) AS BIGINT) AS n_chunks,
       n_tok - (CAST(ceil(n_tok / 100.0) AS BIGINT) - 1) * 100 AS tail_len
FROM tok
""",
)
def chunks(spark, sf_dir):
    """create_chunks bounds (caits/windowing.py:188-202)."""
    seqs = tokenize_documents(load(spark, sf_dir, "documents"))
    n_chunks = F.ceil(F.col("n_tok") / 100.0).cast("long")
    return seqs.select(
        "doc_id",
        n_chunks.alias("n_chunks"),
        (F.col("n_tok").cast("long") - (n_chunks - 1) * 100).alias("tail_len"),
    )


@q(
    "sliding_windows",
    SQL_PTS
    + """
, wins AS (
  SELECT doc_id, unnest(range(0, (n_tok - 16) // 8 + 1)) * 8 AS wstart, n_tok
  FROM tok WHERE n_tok >= 16
), wagg AS (
  SELECT w.doc_id, w.wstart,
         SUM(p.tok) AS wsum, MIN(p.tok) AS wmin
  FROM wins w JOIN pts p
    ON p.doc_id = w.doc_id AND p.off >= w.wstart AND p.off < w.wstart + 16
  GROUP BY w.doc_id, w.wstart
)
SELECT doc_id, COUNT(*)::BIGINT AS n_windows,
       SUM(wsum) AS sum_of_sums, MIN(wmin) AS min_of_mins
FROM wagg GROUP BY doc_id
""",
)
def sliding_windows(spark, sf_dir):
    """Overlapping segmentation ws=16 step=8, full windows only
    (caits/windowing.py:52-77 sliding_window_df)."""
    seqs = tokenize_documents(load(spark, sf_dir, "documents")).filter(F.col("n_tok") >= 16)
    wins = seqs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, cast((n_tok - 16) / 8 as int)), "
                "wi -> named_struct("
                "  'wstart', cast(wi as bigint) * 8,"
                "  'wsum', aggregate(slice(tokens, wi * 8 + 1, 16), cast(0 as bigint), (a, x) -> a + x),"
                "  'wmin', cast(array_min(slice(tokens, wi * 8 + 1, 16)) as bigint)))"
            )
        ).alias("w"),
    )
    return wins.groupBy("doc_id").agg(
        F.count("*").alias("n_windows"),
        F.sum("w.wsum").alias("sum_of_sums"),
        F.min("w.wmin").alias("min_of_mins"),
    )


@q(
    "resample_zoh",
    SQL_PTS
    + """
SELECT doc_id, COUNT(*)::BIGINT AS n_samples, SUM(tok) AS sample_sum
FROM pts WHERE off % 4 = 0 GROUP BY doc_id
""",
)
def resample_zoh(spark, sf_dir):
    """Zero-order-hold 4x downsample (caits/core/_core_resample.py:45-54)."""
    seqs = tokenize_documents(load(spark, sf_dir, "documents"))
    return seqs.select(
        "doc_id",
        F.expr("cast(size(filter(sequence(0, n_tok - 1), o -> o % 4 = 0)) as bigint)").alias("n_samples"),
        F.expr(
            "aggregate(filter(transform(tokens, (x, i) -> named_struct('i', i, 'x', x)), s -> s.i % 4 = 0), "
            "cast(0 as bigint), (a, s) -> a + s.x)"
        ).alias("sample_sum"),
    )


@q(
    "fingerprint",
    SQL_PTS
    + """
SELECT doc_id,
       list_reduce(
         list_prepend(0::BIGINT,
           list_transform(range(1, length(any_value(text)) + 1),
                          i -> unicode(any_value(text)[i])::BIGINT)),
         (a, b) -> (a * 31 + b) % 1000000007) AS fp
FROM tok GROUP BY doc_id
""",
)
def fingerprint(spark, sf_dir):
    """Rolling polynomial document fingerprint (training-data pipeline op)."""
    seqs = tokenize_documents(load(spark, sf_dir, "documents"))
    return seqs.select(
        "doc_id",
        F.expr(
            "aggregate(tokens, cast(0 as bigint), (a, x) -> pmod(a * 31 + x, 1000000007))"
        ).alias("fp"),
    )


@q(
    "token_quality",
    """
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       length(text)::BIGINT AS n_chars,
       len(list_filter(string_split(text, ' '), w -> w != ''))::BIGINT AS n_words,
       length(text)::DOUBLE
         / len(list_filter(string_split(text, ' '), w -> w != ''))::DOUBLE AS chars_per_word,
       len(list_filter(string_split(text, ' '), w -> w IN ('the','and','of','to','a','in','is')))::BIGINT
         AS n_stopwords
FROM documents WHERE length(text) > 0
""",
)
def token_quality(spark, sf_dir):
    """Text quality scoring: counts + ratios (training-data pipeline op)."""
    docs = load(spark, sf_dir, "documents").filter(F.length("text") > 0)
    words = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    stop = F.filter(words, lambda w: w.isin("the", "and", "of", "to", "a", "in", "is"))
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.length("text").cast("long").alias("n_chars"),
        F.size(words).cast("long").alias("n_words"),
        (F.length("text").cast("double") / F.size(words).cast("double")).alias("chars_per_word"),
        F.size(stop).cast("long").alias("n_stopwords"),
    )


@q(
    "dedup_exact",
    """
WITH h AS (
  SELECT md5(text) AS h, COUNT(*)::BIGINT AS n
  FROM documents GROUP BY md5(text)
)
SELECT COUNT(*)::BIGINT AS n_distinct_texts,
       SUM(n)::BIGINT AS n_docs,
       SUM(CASE WHEN n > 1 THEN n ELSE 0 END)::BIGINT AS n_dup_docs
FROM h
""",
)
def dedup_exact(spark, sf_dir):
    """Exact dedup via content hash groupBy (training-data pipeline op)."""
    docs = load(spark, sf_dir, "documents")
    h = docs.groupBy(F.md5(F.col("text").cast("binary")).alias("h")).agg(
        F.count("*").alias("n")
    )
    return h.agg(
        F.count("*").alias("n_distinct_texts"),
        F.sum("n").alias("n_docs"),
        F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(F.lit(0))).alias("n_dup_docs"),
    )


# =====================================================================
# B. Events family (gap-fill, islands, sessions, rolling)
# =====================================================================


@q(
    "gapfill_locf",
    SQL_EV
    + """
, obs AS (
  SELECT user_id, minute, MAX(cents) AS cents FROM ev GROUP BY user_id, minute
), bounds AS (
  SELECT user_id, MIN(minute) AS mn, MAX(minute) AS mx FROM obs GROUP BY user_id
), spine AS (
  SELECT user_id, unnest(range(mn, mx + 1)) AS minute FROM bounds
), joined AS (
  SELECT s.user_id, s.minute, o.cents FROM spine s
  LEFT JOIN obs o ON o.user_id = s.user_id AND o.minute = s.minute
)
SELECT user_id, minute,
       last_value(cents IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY minute
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
FROM joined
""",
)
def gapfill_locf(spark, sf_dir):
    """LOCF gap-fill on a per-user minute grid (caits zero-order-hold)."""
    ev = _ev(spark, sf_dir)
    obs = ev.groupBy("user_id", "minute").agg(F.max("cents").alias("cents"))
    bounds = obs.groupBy("user_id").agg(F.min("minute").alias("mn"), F.max("minute").alias("mx"))
    spine = bounds.select(
        "user_id", F.explode(F.sequence("mn", "mx")).alias("minute")
    )
    joined = spine.join(obs, ["user_id", "minute"], "left")
    w = Window.partitionBy("user_id").orderBy("minute").rowsBetween(Window.unboundedPreceding, 0)
    return joined.select(
        "user_id", "minute", F.last("cents", ignorenulls=True).over(w).alias("filled")
    )


@q(
    "gapfill_linear",
    SQL_EV
    + """
, obs AS (
  SELECT user_id, minute, MAX(cents) AS cents FROM ev GROUP BY user_id, minute
), bounds AS (
  SELECT user_id, MIN(minute) AS mn, MAX(minute) AS mx FROM obs GROUP BY user_id
), spine AS (
  SELECT user_id, unnest(range(mn, mx + 1)) AS minute FROM bounds
), joined AS (
  SELECT s.user_id, s.minute, o.cents::DOUBLE AS v FROM spine s
  LEFT JOIN obs o ON o.user_id = s.user_id AND o.minute = s.minute
), anch AS (
  SELECT user_id, minute, v,
         last_value(v IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY minute
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
         last_value(CASE WHEN v IS NOT NULL THEN minute END IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY minute
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS po,
         first_value(v IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY minute
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         first_value(CASE WHEN v IS NOT NULL THEN minute END IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY minute
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nxo
  FROM joined
)
SELECT user_id, minute,
       CASE WHEN v IS NOT NULL THEN v
            WHEN pv IS NULL THEN nv
            WHEN nv IS NULL THEN pv
            ELSE pv + (nv - pv) / (nxo::DOUBLE - po::DOUBLE)
                      * (minute::DOUBLE - po::DOUBLE)
       END AS filled
FROM anch
""",
)
def gapfill_linear(spark, sf_dir):
    """Linear-interp gap-fill (np.interp semantics, caits/preprocessing.py:55)."""
    from .operators.gapfill import gapfill_linear as gl

    ev = _ev(spark, sf_dir)
    obs = (
        ev.groupBy("user_id", "minute")
        .agg(F.max("cents").alias("value"))
        .select(F.col("user_id").cast("string").alias("doc_id"), F.col("minute").alias("offset"), "value")
    )
    bounds = obs.groupBy("doc_id").agg(F.min("offset").alias("mn"), F.max("offset").alias("mx"))
    spine = bounds.select("doc_id", F.explode(F.sequence("mn", "mx")).alias("offset"))
    out = gl(obs, spine)
    return out.select(
        F.col("doc_id").cast("long").alias("user_id"),
        F.col("offset").alias("minute"),
        F.col("filled"),
    )


SQL_SEQ = SQL_EV + """
, seqd AS (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS seq
  FROM ev
)
"""


@q(
    "islands",
    SQL_SEQ
    + """
, hot AS (
  SELECT *, seq - row_number() OVER (PARTITION BY user_id ORDER BY seq) AS grp
  FROM seqd WHERE cents > 15000
)
SELECT user_id, MIN(seq)::BIGINT AS island_start, COUNT(*)::BIGINT AS n_events,
       SUM(cents) AS island_sum
FROM hot GROUP BY user_id, grp
""",
)
def islands(spark, sf_dir):
    """Gaps-and-islands runs of value>150 (caits get_continuous_events,
    performance/detection.py:70-95)."""
    ev = _ev(spark, sf_dir)
    wseq = Window.partitionBy("user_id").orderBy("us", "event_id")
    seqd = ev.withColumn("seq", F.row_number().over(wseq))
    hot = seqd.filter(F.col("cents") > 15000)
    wgrp = Window.partitionBy("user_id").orderBy("seq")
    hot = hot.withColumn("grp", F.col("seq") - F.row_number().over(wgrp))
    return hot.groupBy("user_id", "grp").agg(
        F.min("seq").cast("long").alias("island_start"),
        F.count("*").alias("n_events"),
        F.sum("cents").alias("island_sum"),
    ).drop("grp")


@q(
    "islands_duration",
    SQL_SEQ
    + """
, hot AS (
  SELECT *, seq - row_number() OVER (PARTITION BY user_id ORDER BY seq) AS grp
  FROM seqd WHERE cents > 15000
), isl AS (
  SELECT user_id, MIN(seq)::BIGINT AS island_start, COUNT(*)::BIGINT AS n_events
  FROM hot GROUP BY user_id, grp
)
SELECT user_id, island_start, n_events FROM isl WHERE n_events >= 3
""",
)
def islands_duration(spark, sf_dir):
    """Duration threshold on islands (caits apply_duration_threshold,
    performance/detection.py:28-67)."""
    return (
        islands(spark, sf_dir)
        .filter(F.col("n_events") >= 3)
        .select("user_id", "island_start", "n_events")
    )


def _type_islands_sql(et: str, alias: str) -> str:
    """Islands among one event type: gap > 10 min starts a new interval."""
    return f"""
{alias}_e AS (
  SELECT user_id, us,
         CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
                   > 600000000 OR
                   lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL
              THEN 1 ELSE 0 END AS brk
  FROM ev WHERE event_type = '{et}'
), {alias}_g AS (
  SELECT user_id, us,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY us
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
  FROM {alias}_e
), {alias} AS (
  SELECT user_id, MIN(us) AS s, MAX(us) AS e
  FROM {alias}_g GROUP BY user_id, grp
)"""


@q(
    "interval_iou",
    SQL_EV
    + ","
    + _type_islands_sql("click", "pred")
    + ","
    + _type_islands_sql("error", "gt")
    + """
, pairs AS (
  SELECT p.user_id, p.s AS p_start, g.s AS g_start,
         (least(p.e, g.e) - greatest(p.s, g.s))::DOUBLE
           / (greatest(p.e, g.e) - least(p.s, g.s))::DOUBLE AS iou
  FROM pred p JOIN gt g
    ON p.user_id = g.user_id AND p.s <= g.e AND g.s <= p.e
       AND greatest(p.e, g.e) > least(p.s, g.s)
), best AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, p_start
                               ORDER BY iou DESC, g_start) AS rk
  FROM pairs
)
SELECT user_id, p_start, g_start, iou FROM best WHERE rk = 1
""",
)
def interval_iou(spark, sf_dir):
    """Max-IoU interval matching of predicted vs ground-truth event runs
    (caits classify_events, performance/detection.py:98-156; IoU
    metrics.py:69-101). Range join + top-1 per pred."""
    ev = _ev(spark, sf_dir)

    def type_islands(et: str) -> DataFrame:
        e = ev.filter(F.col("event_type") == et)
        w = Window.partitionBy("user_id").orderBy("us", "event_id")
        e = e.withColumn(
            "brk",
            F.when(
                (F.col("us") - F.lag("us").over(w) > 600000000)
                | F.lag("us").over(w).isNull(),
                1,
            ).otherwise(0),
        )
        wg = Window.partitionBy("user_id").orderBy("us").rowsBetween(Window.unboundedPreceding, 0)
        e = e.withColumn("grp", F.sum("brk").over(wg))
        return e.groupBy("user_id", "grp").agg(F.min("us").alias("s"), F.max("us").alias("e"))

    pred = type_islands("click").alias("p")
    gt = type_islands("error").alias("g")
    pairs = pred.join(
        gt,
        (F.col("p.user_id") == F.col("g.user_id"))
        & (F.col("p.s") <= F.col("g.e"))
        & (F.col("g.s") <= F.col("p.e"))
        & (F.greatest(F.col("p.e"), F.col("g.e")) > F.least(F.col("p.s"), F.col("g.s"))),
    ).select(
        F.col("p.user_id").alias("user_id"),
        F.col("p.s").alias("p_start"),
        F.col("g.s").alias("g_start"),
        (
            (F.least(F.col("p.e"), F.col("g.e")) - F.greatest(F.col("p.s"), F.col("g.s"))).cast("double")
            / (F.greatest(F.col("p.e"), F.col("g.e")) - F.least(F.col("p.s"), F.col("g.s"))).cast("double")
        ).alias("iou"),
    )
    wb = Window.partitionBy("user_id", "p_start").orderBy(F.desc("iou"), "g_start")
    return pairs.withColumn("rk", F.row_number().over(wb)).filter(F.col("rk") == 1).drop("rk")


@q(
    "sessionization",
    SQL_SEQ
    + """
, flag AS (
  SELECT user_id, seq,
         CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY seq)
                   > 1800000000 OR
                   lag(us) OVER (PARTITION BY user_id ORDER BY seq) IS NULL
              THEN 1 ELSE 0 END AS brk
  FROM seqd
), sess AS (
  SELECT user_id,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY seq
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flag
), per AS (
  SELECT user_id, sid, COUNT(*)::BIGINT AS n FROM sess GROUP BY user_id, sid
)
SELECT user_id, COUNT(*)::BIGINT AS n_sessions,
       SUM(n) AS n_events,
       SUM(n)::DOUBLE / COUNT(*)::DOUBLE AS events_per_session
FROM per GROUP BY user_id
""",
)
def sessionization(spark, sf_dir):
    """Sessionization: 30-min inactivity gap (gaps-and-islands in time)."""
    ev = _ev(spark, sf_dir)
    wseq = Window.partitionBy("user_id").orderBy("us", "event_id")
    seqd = ev.withColumn("seq", F.row_number().over(wseq))
    w = Window.partitionBy("user_id").orderBy("seq")
    flag = seqd.withColumn(
        "brk",
        F.when(
            (F.col("us") - F.lag("us").over(w) > 1800000000) | F.lag("us").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    wg = Window.partitionBy("user_id").orderBy("seq").rowsBetween(Window.unboundedPreceding, 0)
    sess = flag.withColumn("sid", F.sum("brk").over(wg))
    per = sess.groupBy("user_id", "sid").agg(F.count("*").alias("n"))
    return per.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.sum("n").alias("n_events"),
        (F.sum("n").cast("double") / F.count("*").cast("double")).alias("events_per_session"),
    )


@q(
    "rolling_rms",
    SQL_SEQ
    + """
SELECT user_id, event_id,
       sqrt((SUM(cents * cents) OVER
              (PARTITION BY user_id ORDER BY seq
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW))::DOUBLE
            / (COUNT(*) OVER
              (PARTITION BY user_id ORDER BY seq
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW))::DOUBLE) AS rms_cents
FROM seqd
""",
)
def rolling_rms(spark, sf_dir):
    """Rolling RMS, frame=4 right-aligned (caits rolling_rms,
    properties.py:111-172; rms_value fe/_statistical.py:237-249)."""
    ev = _ev(spark, sf_dir)
    wseq = Window.partitionBy("user_id").orderBy("us", "event_id")
    seqd = ev.withColumn("seq", F.row_number().over(wseq))
    wf = Window.partitionBy("user_id").orderBy("seq").rowsBetween(-3, 0)
    return seqd.select(
        "user_id",
        "event_id",
        F.sqrt(
            F.sum(F.col("cents") * F.col("cents")).over(wf).cast("double")
            / F.count("*").over(wf).cast("double")
        ).alias("rms_cents"),
    )


@q(
    "zcr_user",
    SQL_SEQ
    + """
, l AS (
  SELECT user_id, cents - 15000 AS c,
         lag(cents - 15000) OVER (PARTITION BY user_id ORDER BY seq) AS pc
  FROM seqd
)
SELECT user_id,
       SUM(CASE WHEN c * pc < 0 THEN 1 ELSE 0 END)::BIGINT AS n_crossings,
       COUNT(*)::BIGINT AS n,
       CASE WHEN COUNT(*) > 1 THEN
         SUM(CASE WHEN c * pc < 0 THEN 1 ELSE 0 END)::DOUBLE
           / (COUNT(*) - 1)::DOUBLE
       END AS zcr
FROM l GROUP BY user_id
""",
)
def zcr_user(spark, sf_dir):
    """Zero-crossing rate around the 150.00 level (caits zcr_value,
    fe/_statistical.py:324-342)."""
    ev = _ev(spark, sf_dir)
    wseq = Window.partitionBy("user_id").orderBy("us", "event_id")
    seqd = ev.withColumn("seq", F.row_number().over(wseq))
    w = Window.partitionBy("user_id").orderBy("seq")
    l = seqd.select(
        "user_id",
        (F.col("cents") - 15000).alias("c"),
        F.lag(F.col("cents") - 15000).over(w).alias("pc"),
    )
    cross = F.sum(F.when(F.col("c") * F.col("pc") < 0, 1).otherwise(0))
    return l.groupBy("user_id").agg(
        cross.cast("long").alias("n_crossings"),
        F.count("*").alias("n"),
        F.when(
            F.count("*") > 1, cross.cast("double") / (F.count("*") - 1).cast("double")
        ).alias("zcr"),
    )


@q(
    "dominant_minute",
    SQL_EV
    + """
, per AS (
  SELECT user_id, minute, SUM(cents) AS total FROM ev GROUP BY user_id, minute
), rk AS (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY total DESC, minute) AS r
  FROM per
)
SELECT user_id, minute AS peak_minute, total AS peak_total FROM rk WHERE r = 1
""",
)
def dominant_minute(spark, sf_dir):
    """argmax analog (caits dominant_frequency / compute_class,
    fe/_statistical.py:542-571) with deterministic tie-break."""
    ev = _ev(spark, sf_dir)
    per = ev.groupBy("user_id", "minute").agg(F.sum("cents").alias("total"))
    w = Window.partitionBy("user_id").orderBy(F.desc("total"), "minute")
    return (
        per.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select("user_id", F.col("minute").alias("peak_minute"), F.col("total").alias("peak_total"))
    )
