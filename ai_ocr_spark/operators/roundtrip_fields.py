"""End-to-end fields/validation/confidence round-trip, oracle-checkable.

Synthesizes one invoice HTML page per order from orders+customer+lineitem
(pure JVM string expressions), runs the REAL extraction pipeline, and
emits the extracted field VALUES, their BYTE SPANS into main_text, and
the full validation outcome (valid / errors / warnings / checks /
confidence) as flat columns. The DuckDB oracle reconstructs every one of
those — including the span offsets, via length arithmetic over the same
deterministic page layout — straight from the relational tables.

This pins the reference's core assertion set end-to-end (reference:
src/processor/app/tests/test_extraction.py:199-222 — invoice_number,
date, line-item count, `valid is True`, `schema_type == "invoice"`),
which was previously covered only by kernel-level pytest.

Two deterministic fault families keep the validator honest:
  * orderkey % 7 == 0  -> the Date line is omitted: required-field error,
    valid=false, degraded confidence (2/3 required ratio).
  * orderkey % 5 == 0  -> Total Amount = sum(items)+1: the
    invoice:line_items_sum_total cross-check fails (warning severity —
    valid stays true, confidence drops).

All cell values are ASCII and integer-derived (floor() on both engines —
Spark's double->long CAST truncates while DuckDB's rounds, so bare casts
of fractional doubles are banned here), hence byte span == char span and
every string renders identically in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datagen import _CHROME_FOOT, _CHROME_HEAD
from ..pipeline import extract_pages

N_INVOICES = 100  # first N orderkeys make one synthetic invoice each

_HEAD = _CHROME_HEAD.format(title="Invoice")


def _invoice_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    keys = li.select("l_orderkey").distinct().orderBy("l_orderkey").limit(N_INVOICES)
    li = li.join(F.broadcast(keys), "l_orderkey")

    qty = F.col("l_quantity").cast("bigint")  # integral by construction
    unit = F.floor(F.col("l_extendedprice") / F.col("l_quantity"))
    amt = F.floor(F.col("l_extendedprice"))
    line = F.concat(
        F.lit("Item: part-"), F.col("l_partkey").cast("string"),
        F.lit(" | Qty: "), qty.cast("string"),
        F.lit(" | Unit Price: "), unit.cast("string"),
        # no '$' here: item amounts must satisfy the all-numeric
        # line-item check; only Total Amount carries the currency mark
        # (normalize_amount strips it for the sum cross-check)
        F.lit(" | Amount: "), amt.cast("string"),
    )
    # full numeric sort key — mirrored in the oracle's ORDER BY
    sort_key = F.struct(
        F.col("l_linenumber"), F.col("l_partkey"), qty.alias("q"), amt.alias("a")
    )
    per = li.groupBy("l_orderkey").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(sort_key.alias("k"), line.alias("h")))
                ),
                lambda s: F.concat(F.lit("<p>"), s["h"], F.lit("</p>")),
            ),
            "",
        ).alias("items_html"),
        F.sum(amt).alias("subtotal"),
    )
    per = (
        per.join(orders, per.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    )
    k = F.col("l_orderkey")
    total = (F.col("subtotal") + F.when(k % 5 == 0, 1).otherwise(0)).cast("long")
    date_html = F.when(k % 7 == 0, F.lit("")).otherwise(
        F.concat(
            F.lit("<p>Date: "),
            F.date_format("o_orderdate", "yyyy-MM-dd"),
            F.lit("</p>"),
        )
    )
    html = F.concat(
        F.lit(_HEAD + "<h1>Invoice</h1><p>Invoice Number: INV-"),
        k.cast("string"),
        F.lit("</p>"),
        date_html,
        F.lit("<p>Customer: "), F.col("c_name"), F.lit("</p>"),
        F.col("items_html"),
        F.lit("<p>Total Amount: $"), total.cast("string"),
        F.lit("</p>" + _CHROME_FOOT),
    )
    return per.select(
        F.concat(F.lit("synthetic://invoice/"), k.cast("string")).alias("url"),
        F.timestamp_seconds(F.lit(1740787200) + k).alias("warc_ts"),
        F.encode(html, "UTF-8").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit("en").cast("string").alias("lang"),
    )


def pipeline_invoice_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extracted invoice fields + spans + validation verdicts, recovered
    from HTML through the full kernel path (parse -> strip -> type
    detect -> field extract -> schema validate -> confidence)."""
    pages = _invoice_pages(spark, sf_dir)
    out = extract_pages(pages, run_id="invoice", num_partitions=8)
    fields = F.col("fields")

    def fv(name: str):
        # try_element_at: the filtered array is EMPTY when the field was
        # not extracted (the %7 missing-date family) — ANSI element_at
        # would abort the job instead of yielding NULL
        return F.try_element_at(
            F.filter(fields, lambda f: f["name"] == F.lit(name)), F.lit(1)
        )

    inv, dt = fv("invoice_number"), fv("date")
    cu, ta = fv("customer"), fv("total_amount")
    checks = F.col("validation")["checks"]
    return out.select(
        F.regexp_extract("url", r"invoice/(\d+)$", 1).cast("long").alias("o_orderkey"),
        "doc_type",
        F.col("validation")["schema_type"].alias("schema_type"),
        "lang",
        "valid",
        "confidence",
        F.size(checks).cast("long").alias("n_checks"),
        F.size(F.filter(checks, lambda c: c["passed"])).cast("long").alias("n_passed"),
        F.size(F.col("validation")["errors"]).cast("long").alias("n_errors"),
        F.size(F.col("validation")["warnings"]).cast("long").alias("n_warnings"),
        F.size(
            F.filter(fields, lambda f: f["name"].endswith(".amount"))
        ).cast("long").alias("n_line_items"),
        inv["value"].alias("invoice_number"),
        inv["span_start"].cast("long").alias("inv_start"),
        inv["span_end"].cast("long").alias("inv_end"),
        dt["value"].alias("date_value"),
        dt["span_start"].cast("long").alias("date_start"),
        dt["span_end"].cast("long").alias("date_end"),
        cu["value"].alias("customer"),
        cu["span_start"].cast("long").alias("cust_start"),
        cu["span_end"].cast("long").alias("cust_end"),
        ta["value"].alias("total_amount"),
        ta["span_start"].cast("long").alias("total_start"),
        ta["span_end"].cast("long").alias("total_end"),
    )


# Span math (ASCII pages: byte == char offsets). main_text layout:
#   L0 'Invoice'                               len 7
#   L1 'Invoice Number: INV-<k>'               len 20+|k|
#   L2 'Date: <yyyy-mm-dd>'                    len 16 (omitted when k%7=0)
#   L3 'Customer: <c_name>'                    len 10+|c_name|
#   per item 'Item: ...'                       len(line)
#   LT 'Total Amount: $<T>'                    len 15+|T|
# lines joined by '\n'.
ORACLE_SQL = f"""
    WITH keys AS (
        SELECT DISTINCT l_orderkey FROM lineitem ORDER BY 1 LIMIT {N_INVOICES}
    ),
    it AS (
        SELECT li.l_orderkey AS k,
               li.l_linenumber AS ln, li.l_partkey AS pk,
               CAST(li.l_quantity AS BIGINT) AS q,
               CAST(floor(li.l_extendedprice) AS BIGINT) AS a,
               'Item: part-' || li.l_partkey
                 || ' | Qty: ' || CAST(CAST(li.l_quantity AS BIGINT) AS VARCHAR)
                 || ' | Unit Price: ' || CAST(CAST(floor(li.l_extendedprice / li.l_quantity) AS BIGINT) AS VARCHAR)
                 || ' | Amount: ' || CAST(CAST(floor(li.l_extendedprice) AS BIGINT) AS VARCHAR)
                 AS line
        FROM lineitem li JOIN keys USING (l_orderkey)
    ),
    agg AS (
        SELECT k,
               count(*) AS n_items,
               sum(a) AS subtotal,
               sum(length(line) + 1) AS items_len
        FROM it GROUP BY k
    ),
    base AS (
        SELECT agg.*, c.c_name,
               agg.subtotal + CASE WHEN agg.k % 5 = 0 THEN 1 ELSE 0 END AS total,
               agg.k % 7 <> 0 AS datep,
               CASE WHEN agg.k % 7 <> 0 THEN 8 ELSE 7 END AS n_checks,
               CASE WHEN agg.k % 7 = 0 THEN 1 ELSE 0 END
                 + CASE WHEN agg.k % 5 = 0 THEN 1 ELSE 0 END AS n_fail
        FROM agg
        JOIN orders o ON o.o_orderkey = agg.k
        JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    pos AS (
        SELECT base.*,
               CAST(k AS VARCHAR) AS kstr,
               CAST(total AS VARCHAR) AS tstr,
               29 + length(CAST(k AS VARCHAR)) AS pos_l2
        FROM base
    ),
    pos2 AS (
        SELECT pos.*,
               pos_l2 + CASE WHEN datep THEN 17 ELSE 0 END AS pos_l3
        FROM pos
    ),
    pos3 AS (
        SELECT pos2.*,
               pos_l3 + 11 + length(c_name) + items_len AS pos_lt
        FROM pos2
    )
    SELECT k AS o_orderkey,
           'invoice' AS doc_type,
           'invoice' AS schema_type,
           'en' AS lang,
           datep AS valid,
           round(0.5 * (CASE WHEN datep THEN 1.0 ELSE 2.0/3.0 END)
                 + 0.5 * ((n_checks - n_fail) / CAST(n_checks AS DOUBLE)), 4)
               AS confidence,
           CAST(n_checks AS BIGINT) AS n_checks,
           CAST(n_checks - n_fail AS BIGINT) AS n_passed,
           CAST(CASE WHEN datep THEN 0 ELSE 1 END AS BIGINT) AS n_errors,
           CAST(CASE WHEN k % 5 = 0 THEN 1 ELSE 0 END AS BIGINT) AS n_warnings,
           CAST(n_items AS BIGINT) AS n_line_items,
           'INV-' || kstr AS invoice_number,
           CAST(24 AS BIGINT) AS inv_start,
           CAST(28 + length(kstr) AS BIGINT) AS inv_end,
           CASE WHEN datep THEN strftime(o_orderdate, '%Y-%m-%d') END AS date_value,
           CAST(CASE WHEN datep THEN pos_l2 + 6 END AS BIGINT) AS date_start,
           CAST(CASE WHEN datep THEN pos_l2 + 16 END AS BIGINT) AS date_end,
           c_name AS customer,
           CAST(pos_l3 + 10 AS BIGINT) AS cust_start,
           CAST(pos_l3 + 10 + length(c_name) AS BIGINT) AS cust_end,
           '$' || tstr AS total_amount,
           CAST(pos_lt + 14 AS BIGINT) AS total_start,
           CAST(pos_lt + 15 + length(tstr) AS BIGINT) AS total_end
    FROM pos3
    JOIN orders o ON o.o_orderkey = pos3.k
"""
