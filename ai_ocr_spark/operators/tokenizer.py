"""Tokenizer-training corpus primitive: BPE merge-pair counting.

The one major LLM-data pipeline stage with no representative elsewhere
in this repo: byte-pair-encoding training is rounds of "count adjacent
symbol pairs across the corpus, merge the argmax". The corpus-side
primitive of every round is the pair count, and its scale shape is the
whole trick:

  corpus -> tokens -> WORD COUNTS            [one shuffle, map-side
                                              combine; the corpus is
                                              read exactly once]
  distinct words -> adjacent char pairs      [explode over the
                                              VOCABULARY, weighted by
                                              word count — corpus
                                              occurrences never re-
                                              explode]
  pair -> sum(weight) -> top-K               [vocabulary-sized agg +
                                              TakeOrderedAndProject]

At 10^12 documents the vocabulary (unique words) grows ~Heaps-law
sublinearly, so the pair explode runs over millions of rows while the
corpus holds trillions — counting pairs on the deduplicated vocabulary
instead of raw text is what makes distributed BPE tractable (same
observation Hugging Face tokenizers' trainer makes single-node:
word-count first, pairs over unique words after).

Outputs the first merge round's table: top pairs by corpus frequency
with a deterministic (count DESC, pair ASC) order — exact integer
counts, so the DuckDB twin is trivial. Later rounds re-run this op on
vocab with the winning pair merged; the per-round cost is vocabulary-
sized, which is why the op reports the vocab/corpus compression too.

The reference has no tokenizer stage (its LLM calls are hosted-API,
langchain_extractor.py); this op exists for the training-data engine
the north rule targets, stated on its own terms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as TX

BPE_TOP_K = 40


def tokenizer_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tok = docs.select(F.explode(TX.tokens(F.col("text"))).alias("w")).filter(
        F.col("w") != ""
    )
    # corpus pass ends here: everything below is vocabulary-sized.
    # 1-char words have no pairs — and MUST be filtered before the
    # sequence() below: Spark's sequence(1, 0) counts DOWN and would
    # fabricate a bogus self-pair per single-char word (the same
    # footgun functions/text.word_shingles guards).
    vocab = tok.groupBy("w").agg(F.count(F.lit(1)).alias("n")).filter(
        F.length("w") >= 2
    )
    pairs = vocab.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.substring(F.col("w"), i, F.lit(2)),
            )
        ).alias("pair"),
        "n",
    )
    counted = pairs.groupBy("pair").agg(F.sum("n").alias("cnt"))
    # TakeOrderedAndProject trims to K rows first; the rank window then
    # runs over K rows, not the full pair table
    top = counted.orderBy(F.col("cnt").desc(), F.col("pair").asc()).limit(BPE_TOP_K)
    w = Window.orderBy(F.col("cnt").desc(), F.col("pair").asc())
    return top.select(
        F.row_number().over(w).cast("long").alias("rnk"),
        "pair",
        F.col("cnt").cast("long").alias("cnt"),
    )


BPE_ORACLE_SQL = f"""
    WITH tok AS (
        SELECT unnest(string_split(trim(regexp_replace(
                   lower(coalesce(text, '')), '\\s+', ' ', 'g')), ' ')) AS w
        FROM documents
    ),
    vocab AS (SELECT w, count(*) AS n FROM tok WHERE w <> '' GROUP BY w),
    pairs AS (
        SELECT unnest(list_transform(range(1, length(w)),
                      i -> substr(w, CAST(i AS INT), 2))) AS pair,
               n
        FROM vocab
    ),
    counted AS (SELECT pair, CAST(sum(n) AS BIGINT) AS cnt
                FROM pairs GROUP BY pair)
    SELECT CAST(row_number() OVER (ORDER BY cnt DESC, pair ASC) AS BIGINT)
               AS rnk,
           pair, cnt
    FROM counted
    ORDER BY cnt DESC, pair ASC
    LIMIT {BPE_TOP_K}
"""
