"""End-to-end xlsx extraction round-trip, oracle-checkable.

Builds one two-sheet workbook per order from lineitem rows
(kernels.xlsx.emit_xlsx), runs the REAL extraction pipeline (sniff
'xlsx' -> zip/XML parse -> multi-sheet scan -> header heuristic ->
labeled-field metadata), and compares both the recovered Items-sheet
rows and the S5 workbook metadata (title + span, author, created,
sheet/merged/formula counters) against a DuckDB reconstruction.

Reference parity: multi-sheet scan semantics
(src/api/app/parsers/excel_parser.py:40-113) and workbook
metadata/merged-cells/formula sampling (:331-392).

Workbook layout per order k:
  Items sheet    header [linenumber, quantity, amount] + int rows
                 sorted by (linenumber, partkey, qty, amount)
  Summary sheet  header [metric, value, rank]; B2 holds a real <f>
                 formula with the cached total; A1:C1 is merged
  core props     title 'Order <k>', author 'clerk-<k%13>', fixed created
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline import PAGES_SCHEMA, extract_pages

if TYPE_CHECKING:
    import pandas as pd

N_WORKBOOKS = 50
CREATED = "2025-03-01T00:00:00Z"


def _xlsx_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    keys = li.select("l_orderkey").distinct().orderBy("l_orderkey").limit(N_WORKBOOKS)
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

        from ai_ocr_spark.kernels.xlsx import emit_xlsx

        for pdf in batches:
            rows = []
            for k, its in zip(pdf["l_orderkey"], pdf["items"]):
                k = int(k)
                item_rows: list[list[object]] = [["linenumber", "quantity", "amount"]]
                total = 0
                for it in its:
                    item_rows.append([int(it["ln"]), int(it["q"]), int(it["a"])])
                    total += int(it["a"])
                summary = [
                    ["metric", "value", "rank"],
                    ["total", total, 1],
                    ["items", len(its), 2],
                ]
                payload = emit_xlsx(
                    [("Items", item_rows), ("Summary", summary)],
                    title=f"Order {k}",
                    author=f"clerk-{k % 13}",
                    created=CREATED,
                    merged={"Summary": ["A1:C1"]},
                    formulas={"Summary": {"B2": ("SUM(Items!C:C)", total)}},
                )
                rows.append(
                    {
                        "url": f"synthetic://xlsx/{k}",
                        "warc_ts": pd.Timestamp("2025-03-01") + pd.Timedelta(seconds=k),
                        "html": payload,
                        "text": None,
                        "lang": "en",
                    }
                )
            yield pd.DataFrame(rows)

    return items.mapInPandas(build, schema=PAGES_SCHEMA)


def pipeline_xlsx_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Items-sheet rows + S5 workbook metadata recovered from xlsx bytes
    through the full kernel path."""
    pages = _xlsx_pages(spark, sf_dir)
    out = extract_pages(pages, run_id="xlsx", num_partitions=8)
    fields = F.col("fields")

    def fv(name: str):
        return F.try_element_at(
            F.filter(fields, lambda f: f["name"] == F.lit(name)), F.lit(1)
        )

    title = fv("title")
    doc = out.select(
        F.regexp_extract("url", r"xlsx/(\d+)$", 1).cast("long").alias("l_orderkey"),
        "content_kind",
        F.size("tables").cast("long").alias("n_tables"),
        "valid",
        "confidence",
        title["value"].alias("title"),
        title["span_start"].cast("long").alias("title_start"),
        title["span_end"].cast("long").alias("title_end"),
        fv("author")["value"].alias("author"),
        fv("created")["value"].alias("created"),
        fv("n_sheets")["value"].alias("n_sheets"),
        fv("n_merged_cells")["value"].alias("n_merged_cells"),
        fv("n_formulas")["value"].alias("n_formulas"),
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
        "n_sheets",
        "n_merged_cells",
        "n_formulas",
    )


# main_text layout for spans: 'Workbook\nTitle: Order <k>\n...' — the
# title value starts at char 16 ('Workbook\n' = 9 + 'Title: ' = 7).
ORACLE_SQL = f"""
    WITH keys AS (
        SELECT DISTINCT l_orderkey FROM lineitem ORDER BY 1 LIMIT {N_WORKBOOKS}
    ),
    it AS (
        SELECT li.l_orderkey AS k,
               li.l_linenumber AS ln, li.l_partkey AS pk,
               CAST(li.l_quantity AS BIGINT) AS q,
               CAST(floor(li.l_extendedprice) AS BIGINT) AS a
        FROM lineitem li JOIN keys USING (l_orderkey)
    )
    SELECT k AS l_orderkey,
           CAST(row_number() OVER (PARTITION BY k ORDER BY ln, pk, q, a) - 1
                AS BIGINT) AS row_idx,
           CAST(ln AS VARCHAR) AS linenumber,
           CAST(q AS VARCHAR) AS quantity,
           CAST(a AS VARCHAR) AS amount,
           'xlsx' AS content_kind,
           CAST(2 AS BIGINT) AS n_tables,
           TRUE AS valid,
           CAST(1.0 AS DOUBLE) AS confidence,
           'Order ' || k AS title,
           CAST(16 AS BIGINT) AS title_start,
           CAST(22 + length(CAST(k AS VARCHAR)) AS BIGINT) AS title_end,
           'clerk-' || (k % 13) AS author,
           '{CREATED}' AS created,
           '2' AS n_sheets,
           '1' AS n_merged_cells,
           '1' AS n_formulas
    FROM it
"""
