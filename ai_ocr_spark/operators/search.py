"""Inverted-index keyword retrieval over the document corpus.

The missing primitive next to dedup/ANN in a training-data engine:
given a handful of keyword queries, return the top-K documents per
query ranked by a tf-idf-family score. The classic distributed shape:

  scan -> explode tokens -> tf per (doc, token)      [one shuffle,
                                                      map-side combine]
  df per query term        [tiny: the posting lists of the query terms
                            only — the full vocabulary is never built]
  broadcast(query terms) JOIN tf                     [shuffle-free probe]
  groupBy (query, doc) sum  -> top-K per query       [one small shuffle]

Scoring is tf * idf_int with idf_int = (SCALE * N) DIV df — integer
arithmetic end to end, so the DuckDB twin matches bit-for-bit. The
textbook BM25 swap (log idf + length normalization) is a one-line
change held back deliberately: ln() is not bit-stable across engines
(same policy as text_unigram_rarity's LM-free quality proxy), and the
integer idf is a monotone transform of 1/df, preserving ranking.

At 10^12 docs the candidate set for a stop-word-ish term floods one
reducer per query; production engines answer that with impact-ordered
postings + WAND pruning. Here the per-query partition is bounded by
the synthetic vocabulary; the skew-split pattern to graduate to is the
broadcast-head used in text_unigram_rarity.

Reference parity: the reference ranks candidate doc types by keyword
hit scores (src/processor/app/classifiers/document_classifier.py
keyword-scoring loop); this is that scoring turned into corpus-wide
retrieval with ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as TX

SEARCH_TOP_K = 5
IDF_SCALE = 1_000_000
# keyword families mirroring the synthetic corpus' topic vocabulary
SEARCH_QUERIES: dict[str, list[str]] = {
    "q_stream": ["stream", "window", "watermark"],
    "q_table": ["table", "schema", "rows"],
    "q_vector": ["vector", "index", "search"],
}


def search_keyword_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tok = (
        docs.select("doc_id", F.explode(TX.tokens(F.col("text"))).alias("token"))
        .filter(F.col("token") != "")
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))

    qrows = [(q, t) for q, ts in SEARCH_QUERIES.items() for t in ts]
    qterms = spark.createDataFrame(qrows, "query_id string, token string")
    terms = qterms.select("token").distinct()

    # df over the query terms' posting lists only (tf is unique per
    # (doc, token), so count(*) == docs containing the term)
    dfreq = tf.join(F.broadcast(terms), "token").groupBy("token").agg(
        F.count(F.lit(1)).alias("df")
    )
    n_docs = docs.select(F.count(F.lit(1)).alias("n_docs"))
    weights = dfreq.crossJoin(F.broadcast(n_docs)).select(
        "token",
        F.expr(f"CAST(({IDF_SCALE} * n_docs) DIV df AS BIGINT)").alias("w"),
    )

    scored = (
        tf.join(F.broadcast(qterms), "token")
        .join(F.broadcast(weights), "token")
        .groupBy("query_id", "doc_id")
        .agg(F.sum(F.col("tf") * F.col("w")).alias("score"))
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w_rank))
        .filter(F.col("rnk") <= SEARCH_TOP_K)
        .select(
            "query_id",
            F.col("rnk").cast("long").alias("rnk"),
            "doc_id",
            F.col("score").cast("long").alias("score"),
        )
    )


def _values_clause() -> str:
    return ", ".join(
        f"('{q}', '{t}')" for q, ts in SEARCH_QUERIES.items() for t in ts
    )


SEARCH_ORACLE_SQL = f"""
    WITH tok AS (
        SELECT doc_id,
               unnest(string_split(trim(regexp_replace(
                   lower(coalesce(text, '')), '\\s+', ' ', 'g')), ' ')) AS token
        FROM documents
    ),
    tok2 AS (SELECT doc_id, token FROM tok WHERE token <> ''),
    tf AS (SELECT doc_id, token, count(*) AS tf
           FROM tok2 GROUP BY doc_id, token),
    q(query_id, token) AS (VALUES {_values_clause()}),
    dfreq AS (
        SELECT token, count(*) AS df FROM tf
        WHERE token IN (SELECT DISTINCT token FROM q)
        GROUP BY token
    ),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT q.query_id, tf.doc_id,
               CAST(sum(tf.tf * (({IDF_SCALE} * n.n_docs) // dfreq.df))
                    AS BIGINT) AS score
        FROM q
        JOIN tf USING (token)
        JOIN dfreq USING (token)
        CROSS JOIN n
        GROUP BY q.query_id, tf.doc_id
    ),
    ranked AS (
        SELECT query_id, doc_id, score,
               row_number() OVER (PARTITION BY query_id
                   ORDER BY score DESC, doc_id ASC) AS rnk
        FROM scored
    )
    SELECT query_id, CAST(rnk AS BIGINT) AS rnk, doc_id, score
    FROM ranked WHERE rnk <= {SEARCH_TOP_K}
"""
