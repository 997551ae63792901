"""Deterministic sketches, stable sampling and exact order statistics.

  sketch_distinct_kmv  K-minimum-values distinct-count sketch: per
                       group, the K smallest 60-bit content hashes; the
                       estimate (K-1)/(kth/2^60) is fully deterministic
                       (unlike HLL++, whose register layout differs
                       across engines), so the DuckDB twin matches the
                       estimate bit-for-bit — a sketch with an exact
                       oracle.
  sample_hash_stable   Bernoulli sampling by hash threshold: the
                       industry-standard stable sample (same rows in
                       every run, engine, and shard layout — unlike
                       rand()-based sampling). Keep iff
                       hash60(doc_id) < p * 2^60.
  agg_length_percentiles
                       Exact nearest-rank length percentiles per
                       language — the standard corpus-quality report.
                       Nearest-rank (value at ceil(p/100 * n)) rather
                       than interpolated quantiles: interpolation
                       formulas differ across engines (and across
                       float summation orders), order statistics are
                       engine-independent integers.

All ride the scan + one shuffle at most; hashes are md5-derived
(functions/text.py hash15) so cross-engine reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as TX

KMV_K = 32
HASH_SPACE = float(1 << 60)  # hash15 yields 60-bit non-negative ints
SAMPLE_THRESHOLD = (1 << 60) // 10  # p = 0.1 of the hash space


def sketch_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinct-text estimate from the K smallest distinct
    content hashes. Shape: distinct -> per-group top-K by window ->
    tiny per-group aggregate; at 10^12 rows the top-K becomes a partial
    bottom-K aggregate, same math."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    h = TX.hash15(TX.norm_text(F.col("text")))
    d = docs.select("source", h.alias("h")).distinct()
    w = Window.partitionBy("source").orderBy(F.asc("h"))
    topk = d.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= KMV_K)
    agg = topk.groupBy("source").agg(
        F.count(F.lit(1)).alias("k_seen"),
        F.max("h").alias("kth_hash"),
    )
    exact = (
        docs.select("source", h.alias("h"))
        .groupBy("source")
        .agg(F.countDistinct("h").alias("n_exact"))
    )
    est = F.when(
        F.col("k_seen") < KMV_K, F.col("k_seen").cast("double")
    ).otherwise(
        (F.lit(float(KMV_K - 1)) * F.lit(HASH_SPACE))
        / F.col("kth_hash").cast("double")
    )
    return (
        agg.join(exact, "source")
        .select(
            "source",
            F.col("k_seen").cast("long").alias("k_seen"),
            "kth_hash",
            F.round(est, 4).alias("estimate"),
            "n_exact",
        )
    )


KMV_ORACLE_SQL = f"""
    WITH h AS (
        SELECT source,
               CAST(('0x' || substr(md5(trim(regexp_replace(
                   lower(coalesce(text, '')), '\\s+', ' ', 'g'))), 1, 15))
                   AS BIGINT) AS h
        FROM documents
    ),
    d AS (SELECT DISTINCT source, h FROM h),
    topk AS (
        SELECT source, h FROM (
            SELECT source, h,
                   row_number() OVER (PARTITION BY source ORDER BY h ASC) AS rn
            FROM d
        ) WHERE rn <= {KMV_K}
    ),
    agg AS (
        SELECT source, count(*) AS k_seen, max(h) AS kth_hash
        FROM topk GROUP BY source
    ),
    exact AS (SELECT source, count(DISTINCT h) AS n_exact FROM h GROUP BY source)
    SELECT agg.source,
           CAST(k_seen AS BIGINT) AS k_seen,
           kth_hash,
           round(CASE WHEN k_seen < {KMV_K} THEN CAST(k_seen AS DOUBLE)
                 ELSE ({float(KMV_K - 1)} * {HASH_SPACE})
                      / CAST(kth_hash AS DOUBLE) END, 4) AS estimate,
           n_exact
    FROM agg JOIN exact USING (source)
"""


def sample_hash_stable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable ~10% Bernoulli sample of documents by doc_id hash — the
    deterministic sampling primitive (repeatable across runs/engines/
    partitionings, unlike rand()). Pure scan-side filter."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    h = TX.hash15(F.col("doc_id").cast("string"))
    return docs.select("doc_id", h.alias("h"), "source").filter(
        F.col("h") < SAMPLE_THRESHOLD
    )


SAMPLE_ORACLE_SQL = f"""
    SELECT doc_id,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
               AS BIGINT) AS h,
           source
    FROM documents
    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
          AS BIGINT) < {SAMPLE_THRESHOLD}
"""

SPLIT_TRAIN_PCT = 80
SPLIT_VAL_PCT = 10  # test gets the remainder


def sample_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified train/val/test split with EXACT
    per-stratum proportions: within each source, documents are ranked
    by content-independent hash60(doc_id) (stable across runs, engines
    and shard layouts) and the first floor(80%·n) go to train, the
    next slice to val, the rest to test — so every stratum hits its
    quota exactly, not just in expectation like a pure hash-threshold
    split (sample_hash_stable). Integer threshold arithmetic
    ((pct·n) DIV 100) keeps both engines identical.

    Scale: one shuffle on the stratum key + a per-stratum sort of
    (hash, doc_id) pairs — 16 bytes a row, so a 10^12-doc stratum
    sorts ~16 TB spread over its partitions; when a single stratum is
    too hot for that, degrade to the O(1) scan-side hash-threshold
    split and accept binomial jitter in the proportions."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    h = TX.hash15(F.col("doc_id").cast("string"))
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    w_all = Window.partitionBy("source")
    ranked = docs.select("doc_id", "source", h.alias("h")).select(
        "doc_id",
        "source",
        "h",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    split = (
        F.when(
            F.col("rn") <= F.expr(f"({SPLIT_TRAIN_PCT} * n) DIV 100"), "train"
        )
        .when(
            F.col("rn")
            <= F.expr(f"(({SPLIT_TRAIN_PCT} + {SPLIT_VAL_PCT}) * n) DIV 100"),
            "val",
        )
        .otherwise("test")
    )
    return ranked.select(
        "doc_id", "source", split.alias("split"), F.col("rn").cast("long").alias("rn")
    )


SPLIT_ORACLE_SQL = f"""
    WITH ranked AS (
        SELECT doc_id, source,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                   AS BIGINT) AS h,
               row_number() OVER (PARTITION BY source ORDER BY
                   CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                       AS BIGINT), doc_id) AS rn,
               count(*) OVER (PARTITION BY source) AS n
        FROM documents
    )
    SELECT doc_id, source,
           CASE WHEN rn <= ({SPLIT_TRAIN_PCT} * n) // 100 THEN 'train'
                WHEN rn <= (({SPLIT_TRAIN_PCT} + {SPLIT_VAL_PCT}) * n) // 100
                     THEN 'val'
                ELSE 'test' END AS split,
           CAST(rn AS BIGINT) AS rn
    FROM ranked
"""


PERCENTILE_PS = (25, 50, 75, 90, 99)


def agg_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-language length percentiles via cumulative counts.

    Scale shape: groupBy (lang, len) FIRST — the map-side partial
    combine collapses 10^12 rows to at most |langs| x |distinct
    lengths| rows BEFORE the shuffle — then one small window over the
    distinct lengths computes the cumulative distribution, and the
    percentile is the first length whose cumulative count reaches the
    nearest-rank target ceil(p*n/100). This avoids the naive
    row_number-over-every-document sort (which puts the full corpus
    through one per-language sort partition) while staying EXACT,
    unlike approx_percentile. Rank arithmetic is integer-only
    ((p*n + 99) DIV 100), so no float divergence between engines.

    Reference parity: the reference profiles numeric columns with
    pandas describe() quantiles (src/processor/app/parsers/
    csv_parser.py analyze dtype/stats path); this is that statistic
    computed distributively and exactly.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = docs.select(
        "lang",
        F.length(F.coalesce(F.col("text"), F.lit(""))).cast("long").alias("len"),
    )
    counts = d.groupBy("lang", "len").agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = (
        Window.partitionBy("lang")
        .orderBy("len")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("lang")
    cum = counts.select(
        "lang",
        "len",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    # ceil(p*n/100) == (p*n + 99) DIV 100 for positive ints; integer
    # DIV keeps both engines in integer math (no float quotient).
    pct_cols = [
        F.min(
            F.when(
                F.col("cum")
                >= F.expr(f"CAST(({p} * n + 99) DIV 100 AS BIGINT)"),
                F.col("len"),
            )
        ).alias(f"p{p}")
        for p in PERCENTILE_PS
    ]
    return cum.groupBy("lang").agg(
        F.max("n").cast("long").alias("n_docs"), *pct_cols
    )


PERCENTILE_ORACLE_SQL = f"""
    WITH d AS (
        SELECT lang,
               CAST(length(coalesce(text, '')) AS BIGINT) AS len
        FROM documents
    ),
    c AS (SELECT lang, len, count(*) AS cnt FROM d GROUP BY lang, len),
    cum AS (
        SELECT lang, len,
               sum(cnt) OVER (PARTITION BY lang ORDER BY len
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               sum(cnt) OVER (PARTITION BY lang) AS n
        FROM c
    )
    SELECT lang,
           CAST(max(n) AS BIGINT) AS n_docs,
           {", ".join(
               f"CAST(min(CASE WHEN cum >= ({p} * n + 99) // 100 "
               f"THEN len END) AS BIGINT) AS p{p}"
               for p in PERCENTILE_PS
           )}
    FROM cum GROUP BY lang
"""
