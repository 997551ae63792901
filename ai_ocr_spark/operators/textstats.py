"""Text-analysis operators over the documents table.

  text_token_stats     whitespace + regex ("BPE-ish") token counts
  text_quality_scores  length / punctuation / stopword quality signals
                       with a composite 0-1 score
  text_langid          language ID: CJK char-range + stopword-profile
                       argmax (en/de/fr), mirroring the reference's
                       detector (langchain_extractor.py:245-294) extended
                       to more languages
  text_fingerprint     content fingerprint (md5 of canonical form) +
                       bottom-k shingle sketch (winnowing-style compact
                       signature)

Everything is a single projection over the scan — no shuffle, no UDF —
the per-row shape that runs at scan speed on 100 TB. All values are
exact across engines (integer counts, identical-order double formulas).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as TX


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _n_tokens(norm: Column, tok: Column) -> Column:
    return F.when(norm == "", F.lit(0)).otherwise(F.size(tok))


def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    norm = TX.norm_text(F.col("text"))
    tok = F.split(norm, " ")
    n_re = F.size(F.regexp_extract_all(norm, F.lit("[a-z0-9]+|[^a-z0-9 ]"), 0))
    return docs.select(
        "doc_id",
        _n_tokens(norm, tok).cast("long").alias("n_tokens_ws"),
        n_re.cast("long").alias("n_tokens_re"),
        F.length(norm).cast("long").alias("n_chars_norm"),
    )


def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score; the formula is written identically in the
    DuckDB oracle so the doubles match bit-for-bit."""
    docs = _docs(spark, sf_dir)
    norm = TX.norm_text(F.col("text"))
    tok = F.split(norm, " ")
    n_tok = _n_tokens(norm, tok)
    n_chars = F.length(norm)
    n_punct = n_chars - F.length(F.regexp_replace(norm, "[^a-z0-9 ]", ""))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_arr = F.array(*[F.lit(w) for w in TX.STOPWORDS_EN])
    n_stop = F.size(F.filter(tok, lambda t: F.array_contains(stop_arr, t)))
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    quality = (
        F.least(F.lit(1.0), n_tok / F.lit(50.0)) * 0.4
        + (F.lit(1.0) - punct_ratio) * 0.3
        + F.least(F.lit(1.0), stop_ratio * 5.0) * 0.3
    )
    return docs.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars"),
        n_tok.cast("long").alias("n_tokens"),
        n_punct.cast("long").alias("n_punct"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        quality.alias("quality"),
    )


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    tok_d = F.array_distinct(TX.tokens(F.col("text")))
    en = TX.stopword_hits(tok_d, TX.STOPWORDS_EN)
    de = TX.stopword_hits(tok_d, TX.STOPWORDS_DE)
    fr = TX.stopword_hits(tok_d, TX.STOPWORDS_FR)
    cjk = F.coalesce(F.col("text"), F.lit("")).rlike("[぀-ヿ一-鿿]")
    detected = (
        F.when(cjk, F.lit("ja"))
        .when((en >= de) & (en >= fr), F.lit("en"))
        .when(de >= fr, F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    return docs.select(
        "doc_id",
        en.cast("long").alias("en_hits"),
        de.cast("long").alias("de_hits"),
        fr.cast("long").alias("fr_hits"),
        detected.alias("detected_lang"),
    )


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5 fingerprint of the canonical form + bottom-4 sketch of 3-gram
    shingle hashes (a winnowing-style compact near-dup signature),
    emitted as a '|'-joined string for stable cross-engine comparison."""
    docs = _docs(spark, sf_dir)
    norm = TX.norm_text(F.col("text"))
    tok = F.split(norm, " ")
    sh = TX.word_shingles(tok, 3)
    bottomk = F.array_join(
        F.slice(
            F.array_sort(F.array_distinct(F.transform(sh, TX.md5_hex))), 1, 4
        ),
        "|",
    )
    return docs.select(
        "doc_id",
        TX.md5_hex(norm).alias("fingerprint"),
        bottomk.alias("bottomk_sketch"),
    )
