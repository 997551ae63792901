"""End-to-end legacy .xls (OLE2/BIFF8) extraction round-trip.

The xls sibling of roundtrip_xlsx: builds one two-sheet BIFF8 workbook
per order from lineitem rows (kernels.xls.emit_xls — NUMBER records for
ints, SST/LABELSST for strings, one MERGEDCELLS on the Summary sheet),
runs the REAL extraction pipeline (OLE2 magic sniff -> compound-file
stream walk -> BIFF record scan + \\x05SummaryInformation property
set -> header heuristic), and compares the recovered Items rows plus
the full S5 surface — title (value AND span), author, created,
sheet/merged/formula counters — against a DuckDB reconstruction,
exactly like the xlsx twin.

Reference parity: xls acceptance (src/api/app/utils/file_validator.py:
15-57) and the extension dispatch it feeds
(src/processor/app/parsers/excel_parser.py:32-40).
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


def _xls_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
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

        from ai_ocr_spark.kernels.xls import emit_xls

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
                payload = emit_xls(
                    [("Items", item_rows), ("Summary", summary)],
                    merged={"Summary": [(0, 0, 0, 2)]},  # A1:C1
                    title=f"Order {k}",
                    author=f"clerk-{k % 13}",
                    created=CREATED,
                )
                rows.append(
                    {
                        "url": f"synthetic://xls/{k}",
                        "warc_ts": pd.Timestamp("2025-03-01")
                        + pd.Timedelta(seconds=k),
                        "html": payload,
                        "text": None,
                        "lang": "en",
                    }
                )
            yield pd.DataFrame(rows)

    return items.mapInPandas(build, schema=PAGES_SCHEMA)


def pipeline_xls_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Items-sheet rows + S5 counters recovered from BIFF8 bytes
    through the full kernel path."""
    pages = _xls_pages(spark, sf_dir)
    out = extract_pages(pages, run_id="xls", num_partitions=8)
    fields = F.col("fields")

    def fv(name: str):
        return F.try_element_at(
            F.filter(fields, lambda f: f["name"] == F.lit(name)), F.lit(1)
        )

    title = fv("title")
    doc = out.select(
        F.regexp_extract("url", r"xls/(\d+)$", 1).cast("long").alias("l_orderkey"),
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
# title value starts at char 16 ('Workbook\n' = 9 + 'Title: ' = 7),
# exactly like the xlsx twin.
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
           'xls' AS content_kind,
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
           '0' AS n_formulas
    FROM it
"""
