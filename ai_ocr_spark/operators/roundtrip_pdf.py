"""End-to-end PDF extraction round-trip, oracle-checkable.

Builds one small PDF per order from lineitem rows (kernels.pdf.emit_pdf
— the same emitter the parser must round-trip), runs the REAL extraction
pipeline (sniff 'pdf' -> object scan -> content-stream tokenize ->
x-y-cut -> reading order -> canonical main_text), and compares the
recovered text against a DuckDB string reconstruction. This is the
driver-level proof of the x-y-cut ordering (SURVEY §7.3 hard-part #2)
that previously had only unit-test coverage; reference capability:
requirements.txt:27-33 (PyPDF2/pdfplumber pinned, never wired).

Page layout (exercises both cut axes):

    (72, 750)  'Order Summary <k>'      — own block (50pt y-gap > 30)
    (72, 700-15i) 'Item <ln> qty <q>'   — left column block
    (400, 700-15i) 'Amt <a>'            — right column block (328pt x-gap)

Reading order is therefore title, whole left column, whole right column;
lines inside a block join with '\\n', blocks join with '\\n'. Every other
order's content stream is FlateDecode-compressed (k % 2 == 0), so the
zlib path is exercised under the oracle too.

PDF synthesis runs in a mapInPandas stage (fixture generation, not the
measured hot path); extraction runs through the standard fused kernel
stage.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline import PAGES_SCHEMA, extract_pages

if TYPE_CHECKING:
    import pandas as pd

N_PDFS = 40  # first N orderkeys make one synthetic PDF each


def _pdf_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    keys = li.select("l_orderkey").distinct().orderBy("l_orderkey").limit(N_PDFS)
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

        from ai_ocr_spark.kernels.pdf import emit_pdf

        for pdf in batches:
            rows = []
            for k, its in zip(pdf["l_orderkey"], pdf["items"]):
                k = int(k)
                runs = [(72.0, 750.0, f"Order Summary {k}")]
                for i, it in enumerate(its):
                    y = 700.0 - 15.0 * i
                    runs.append((72.0, y, f"Item {it['ln']} qty {it['q']}"))
                    runs.append((400.0, y, f"Amt {it['a']}"))
                payload = emit_pdf([runs], compress=(k % 2 == 0))
                rows.append(
                    {
                        "url": f"synthetic://pdf/{k}",
                        "warc_ts": pd.Timestamp("2025-03-01") + pd.Timedelta(seconds=k),
                        "html": payload,
                        "text": None,
                        "lang": "en",
                    }
                )
            yield pd.DataFrame(rows)

    return items.mapInPandas(build, schema=PAGES_SCHEMA)


def pipeline_pdf_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(orderkey, content_kind, main_text, doc_type, confidence)
    recovered from PDF bytes through the full kernel path."""
    pages = _pdf_pages(spark, sf_dir)
    out = extract_pages(pages, run_id="pdf", num_partitions=8)
    return out.select(
        F.regexp_extract("url", r"pdf/(\d+)$", 1).cast("long").alias("l_orderkey"),
        "content_kind",
        "main_text",
        "doc_type",
        "confidence",
    )


ORACLE_SQL = f"""
    WITH keys AS (
        SELECT DISTINCT l_orderkey FROM lineitem ORDER BY 1 LIMIT {N_PDFS}
    ),
    it AS (
        SELECT li.l_orderkey AS k,
               li.l_linenumber AS ln, li.l_partkey AS pk,
               CAST(li.l_quantity AS BIGINT) AS q,
               CAST(floor(li.l_extendedprice) AS BIGINT) AS a
        FROM lineitem li JOIN keys USING (l_orderkey)
    )
    SELECT k AS l_orderkey,
           'pdf' AS content_kind,
           'Order Summary ' || k || chr(10)
             || string_agg('Item ' || ln || ' qty ' || q, chr(10)
                           ORDER BY ln, pk, q, a) || chr(10)
             || string_agg('Amt ' || a, chr(10) ORDER BY ln, pk, q, a)
               AS main_text,
           'generic' AS doc_type,
           CAST(0.2 AS DOUBLE) AS confidence
    FROM it GROUP BY k
"""
