"""Temporal join operators Spark lacks natively: as-of join and
bucketed range join, both in their scale shapes (no O(n^2) cross join,
no interval explode), with exact DuckDB twins.

These are the standard missing pieces when a training-data pipeline
aligns time-series features (as-of: "latest reference row at or before
each probe") or mines co-occurrence windows (range join: "pairs within
t seconds"). Spark has no ASOF JOIN; the union+running-last trick below
is the one-shuffle equivalent, and bucketed adjacency replaces the
quadratic interval join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

ASOF_RANGE_S = 1800  # range-join window (seconds)


def join_asof_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every lineitem (probe at l_shipdate), the
    customer's most recent order at or before that date (reference
    series = per-customer order dates).

    Scale shape: union the tagged sides, ONE shuffle on the key, a
    running last_value(ignore nulls) ordered by (date, is_probe) — refs
    sort before probes on the same date, giving <= semantics. No range
    explode, no per-probe subquery. Reference dates are pre-deduped
    (max orderkey per customer-date) so the as-of pick is unambiguous
    in both engines."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    refs = (
        orders.groupBy(
            F.col("o_custkey").alias("custkey"),
            F.to_date("o_orderdate").alias("d"),
        )
        .agg(
            F.max("o_orderkey").alias("ref_orderkey"),
            # max_by: the price of THAT order — independent max() would
            # pair the max orderkey with a different order's price when
            # a customer has several orders on one date
            F.max_by("o_totalprice", "o_orderkey").alias("ref_price"),
        )
        .select(
            "custkey",
            "d",
            F.lit(0).alias("is_probe"),
            "ref_orderkey",
            "ref_price",
            F.lit(None).cast("long").alias("l_orderkey"),
            F.lit(None).cast("long").alias("l_linenumber"),
        )
    )
    probes = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.to_date("l_shipdate").alias("d"),
            F.lit(1).alias("is_probe"),
            F.lit(None).cast("long").alias("ref_orderkey"),
            F.lit(None).cast("double").alias("ref_price"),
            "l_orderkey",
            F.col("l_linenumber").cast("long").alias("l_linenumber"),
        )
    )
    u = refs.unionByName(probes)
    w = (
        Window.partitionBy("custkey")
        .orderBy("d", "is_probe")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = u.select(
        "custkey",
        "d",
        "is_probe",
        "l_orderkey",
        "l_linenumber",
        F.last("ref_orderkey", ignorenulls=True).over(w).alias("asof_orderkey"),
        F.last("ref_price", ignorenulls=True).over(w).alias("asof_price"),
    )
    return out.filter(F.col("is_probe") == 1).select(
        "custkey",
        "l_orderkey",
        "l_linenumber",
        F.date_format("d", "yyyy-MM-dd").alias("ship_date"),
        "asof_orderkey",
        "asof_price",
    )


ASOF_ORACLE_SQL = """
    WITH refs AS (
        SELECT o_custkey AS custkey, CAST(o_orderdate AS DATE) AS d,
               0 AS is_probe,
               max(o_orderkey) AS ref_orderkey,
               arg_max(o_totalprice, o_orderkey) AS ref_price,
               CAST(NULL AS BIGINT) AS l_orderkey,
               CAST(NULL AS BIGINT) AS l_linenumber
        FROM orders GROUP BY 1, 2
    ),
    probes AS (
        SELECT o.o_custkey AS custkey, CAST(li.l_shipdate AS DATE) AS d,
               1 AS is_probe,
               CAST(NULL AS BIGINT) AS ref_orderkey,
               CAST(NULL AS DOUBLE) AS ref_price,
               li.l_orderkey,
               CAST(li.l_linenumber AS BIGINT) AS l_linenumber
        FROM lineitem li JOIN orders o ON li.l_orderkey = o.o_orderkey
    ),
    u AS (SELECT * FROM refs UNION ALL SELECT * FROM probes),
    r AS (
        SELECT custkey, d, is_probe, l_orderkey, l_linenumber,
               last_value(ref_orderkey IGNORE NULLS) OVER w AS asof_orderkey,
               last_value(ref_price IGNORE NULLS) OVER w AS asof_price
        FROM u
        WINDOW w AS (PARTITION BY custkey ORDER BY d, is_probe
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT custkey, l_orderkey, l_linenumber,
           strftime(d, '%Y-%m-%d') AS ship_date,
           asof_orderkey, asof_price
    FROM r WHERE is_probe = 1
"""


def range_join_event_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range self-join: pairs of events by the same user within
    ASOF_RANGE_S seconds, earlier event first.

    Scale shape: epoch-bucket the stream (bucket width == the range),
    explode the EARLIER side into (bucket, bucket+1), equi-join on
    (user, bucket). Every qualifying pair co-locates in exactly one
    bucket cell, so no distinct pass and no O(n^2) time join — the
    classic interval-bucketing rewrite."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    epoch = F.unix_timestamp(F.col("ts"))
    e = ev.select("user_id", "event_id", epoch.alias("ep"))
    bucket = F.floor(F.col("ep") / ASOF_RANGE_S)
    later = e.select("user_id", "event_id", "ep", bucket.alias("bk"))
    earlier = e.select(
        "user_id",
        F.col("event_id").alias("event_a"),
        F.col("ep").alias("ep_a"),
        F.explode(F.array(bucket, bucket + 1)).alias("bk"),
    )
    joined = later.alias("l").join(
        earlier.alias("e"),
        (F.col("l.user_id") == F.col("e.user_id"))
        & (F.col("l.bk") == F.col("e.bk"))
        & (
            (F.col("e.ep_a") < F.col("l.ep"))
            | (
                (F.col("e.ep_a") == F.col("l.ep"))
                & (F.col("e.event_a") < F.col("l.event_id"))
            )
        )
        & (F.col("l.ep") - F.col("e.ep_a") <= ASOF_RANGE_S),
    )
    return joined.select(
        F.col("l.user_id").alias("user_id"),
        F.col("e.event_a").alias("event_a"),
        F.col("l.event_id").alias("event_b"),
        (F.col("l.ep") - F.col("e.ep_a")).alias("gap_s"),
    )


RANGE_ORACLE_SQL = f"""
    WITH e AS (
        SELECT user_id, event_id,
               CAST(floor(epoch(ts)) AS BIGINT) AS ep
        FROM events
    )
    SELECT a.user_id,
           a.event_id AS event_a,
           b.event_id AS event_b,
           b.ep - a.ep AS gap_s
    FROM e a JOIN e b
      ON a.user_id = b.user_id
     AND (a.ep < b.ep OR (a.ep = b.ep AND a.event_id < b.event_id))
     AND b.ep - a.ep <= {ASOF_RANGE_S}
"""
