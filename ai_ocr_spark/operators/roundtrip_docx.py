"""End-to-end docx extraction round-trip, oracle-checkable.

Builds one Word document per order from lineitem rows
(kernels.docx.emit_docx), runs the REAL extraction pipeline (zip sniff
'docx' -> word/document.xml parse -> paragraphs + body table -> header
heuristic -> labeled-field metadata with byte spans), and compares the
recovered paragraphs, items-table rows, and Dublin-Core properties
against a DuckDB reconstruction.

The reference pins python-docx with zero call sites
(/root/reference/requirements.txt:26) — the same declared-never-built
branch this repo filled for PDF and legacy xls; this operator is its
green-path evidence.

Document layout per order k:
  paragraph  'Order <k> contains <n> items.'
  paragraph  'Handled by clerk <k%13>.'
  table      header [linenumber, quantity, amount] + int rows
             sorted by (linenumber, partkey, qty, amount)
  core props title 'Order <k>', author 'clerk-<k%13>', fixed created
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline import PAGES_SCHEMA, extract_pages

if TYPE_CHECKING:
    import pandas as pd

N_DOCS = 50
CREATED = "2025-03-01T00:00:00Z"


def _docx_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    keys = li.select("l_orderkey").distinct().orderBy("l_orderkey").limit(N_DOCS)
    li = li.join(F.broadcast(keys), "l_orderkey")
    qty = F.col("l_quantity").cast("bigint")
    amt = F.floor(F.col("l_extendedprice"))
    items = li.groupBy("l_orderkey").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("l_linenumber").alias("ln"),
                    F.col("l_partkey").alias("pk"),
                    qty.alias("q"),
                    amt.alias("a"),
                )
            )
        ).alias("items")
    )

    def build(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from ai_ocr_spark.kernels.docx import emit_docx

        for pdf in batches:
            rows = []
            for k, its in zip(pdf["l_orderkey"], pdf["items"]):
                k = int(k)
                table: list[list[object]] = [["linenumber", "quantity", "amount"]]
                for it in its:
                    table.append([int(it["ln"]), int(it["q"]), int(it["a"])])
                payload = emit_docx(
                    [
                        f"Order {k} contains {len(its)} items.",
                        f"Handled by clerk {k % 13}.",
                        table,
                    ],
                    title=f"Order {k}",
                    author=f"clerk-{k % 13}",
                    created=CREATED,
                )
                rows.append(
                    {
                        "url": f"synthetic://docx/{k}",
                        "warc_ts": pd.Timestamp("2025-03-01") + pd.Timedelta(seconds=k),
                        "html": payload,
                        "text": None,
                        "lang": "en",
                    }
                )
            yield pd.DataFrame(rows)

    return items.mapInPandas(build, schema=PAGES_SCHEMA)


def pipeline_docx_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph text, items-table rows, and core properties recovered
    from docx bytes through the full kernel path."""
    pages = _docx_pages(spark, sf_dir)
    out = extract_pages(pages, run_id="docx", num_partitions=8)
    fields = F.col("fields")

    def fv(name: str):
        return F.try_element_at(
            F.filter(fields, lambda f: f["name"] == F.lit(name)), F.lit(1)
        )

    title = fv("title")
    # main_text layout: Document / Title / Author / Created /
    # Paragraphs / Tables / <p1> / <p2> — lines 7 and 8 are the body
    text_lines = F.split(F.col("main_text"), "\n")
    doc = out.select(
        F.regexp_extract("url", r"docx/(\d+)$", 1).cast("long").alias("l_orderkey"),
        "content_kind",
        F.size("tables").cast("long").alias("n_tables"),
        "valid",
        "confidence",
        title["value"].alias("title"),
        title["span_start"].cast("long").alias("title_start"),
        title["span_end"].cast("long").alias("title_end"),
        fv("author")["value"].alias("author"),
        fv("created")["value"].alias("created"),
        fv("n_paragraphs")["value"].alias("n_paragraphs"),
        fv("n_body_tables")["value"].alias("n_body_tables"),
        F.try_element_at(text_lines, F.lit(7)).alias("para1"),
        F.try_element_at(text_lines, F.lit(8)).alias("para2"),
        F.col("tables")[0].alias("t0"),
    )
    rows = doc.select(
        "*", F.posexplode(F.col("t0")["rows"]).alias("row_idx", "cells")
    )
    return rows.select(
        "l_orderkey",
        F.col("row_idx").cast("long").alias("row_idx"),
        F.col("cells")[0].alias("linenumber"),
        F.col("cells")[1].alias("quantity"),
        F.col("cells")[2].alias("amount"),
        "content_kind",
        "n_tables",
        "valid",
        "confidence",
        "title",
        "title_start",
        "title_end",
        "author",
        "created",
        "n_paragraphs",
        "n_body_tables",
        "para1",
        "para2",
    )


# main_text layout for spans: 'Document\nTitle: Order <k>\n...' — the
# title value starts at char 16 ('Document\n' = 9 + 'Title: ' = 7).
ORACLE_SQL = f"""
    WITH keys AS (
        SELECT DISTINCT l_orderkey FROM lineitem ORDER BY 1 LIMIT {N_DOCS}
    ),
    it AS (
        SELECT li.l_orderkey AS k,
               li.l_linenumber AS ln, li.l_partkey AS pk,
               CAST(li.l_quantity AS BIGINT) AS q,
               CAST(floor(li.l_extendedprice) AS BIGINT) AS a,
               count(*) OVER (PARTITION BY li.l_orderkey) AS n_items
        FROM lineitem li JOIN keys USING (l_orderkey)
    )
    SELECT k AS l_orderkey,
           CAST(row_number() OVER (PARTITION BY k ORDER BY ln, pk, q, a) - 1
                AS BIGINT) AS row_idx,
           CAST(ln AS VARCHAR) AS linenumber,
           CAST(q AS VARCHAR) AS quantity,
           CAST(a AS VARCHAR) AS amount,
           'docx' AS content_kind,
           CAST(1 AS BIGINT) AS n_tables,
           TRUE AS valid,
           CAST(1.0 AS DOUBLE) AS confidence,
           'Order ' || k AS title,
           CAST(16 AS BIGINT) AS title_start,
           CAST(22 + length(CAST(k AS VARCHAR)) AS BIGINT) AS title_end,
           'clerk-' || (k % 13) AS author,
           '{CREATED}' AS created,
           '2' AS n_paragraphs,
           '1' AS n_body_tables,
           'Order ' || k || ' contains ' || n_items || ' items.' AS para1,
           'Handled by clerk ' || (k % 13) || '.' AS para2
    FROM it
"""
