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


# --- robust daily-count anomaly detection (median/MAD) -------------------

ANOMALY_MAD_MULT = 2  # |n - med| > MULT * MAD flags a day; calibrated
# on the fixture stream so both verdicts fire at every SF (sf0.01:
# per-type MAD 5..7 over 30 days, max |dev| 15..20 -> a handful of
# anomalous days per type, most days quiet). 3*MAD would leave several
# types with zero anomalies; 2*MAD is also the consistency bound
# Hampel filters use at this sample size.


def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type daily-volume anomaly detection — the Hampel /
    median-MAD rule ops dashboards run over event streams (mean/stddev
    z-scores break on the very outliers being hunted; the median and
    the median absolute deviation are outlier-proof). A day is
    anomalous for a type when |n - median| > 2 * MAD.

    Exactness: medians are NEAREST-RANK LOWER medians (the value at
    row (cnt+1) DIV 2 of the sorted counts) — engine-independent
    integers, unlike interpolated medians (DuckDB's median() averages
    the middle pair into a float); the robust z-score is integer e6
    arithmetic with a MAD floor of 1 (truncating division on
    non-negative operands).

    Scale shape: ONE (event_type, day) count with map-side combine
    collapses 10^12 events to a calendar-sized frame; every window
    after that runs over |types| x |days| rows. The per-type ordering
    uses (value, day) so ties rank deterministically on both engines.

    Reference parity: the reference's metrics surface is request
    counters (src/api/app/services/extraction_service.py process
    metrics); this is the alerting layer a production deployment runs
    over exactly those counters, expressed over the events stream.
    """
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = (
        ev.select(
            "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return mad_rule(daily)


def mad_rule(daily: DataFrame) -> DataFrame:
    """The median/MAD verdict suffix over a (event_type, day, n) count
    frame — shared by the batch op above and the streaming twin
    (streaming/windows.stream_anomaly_mad), whose only delta is WHERE
    the counts come from (a continuously-maintained complete-mode
    aggregate instead of a batch groupBy)."""
    wt = Window.partitionBy("event_type")
    wr = Window.partitionBy("event_type").orderBy("n", "day")
    med = (
        daily.withColumn("ndays", F.count(F.lit(1)).over(wt))
        .withColumn("rn", F.row_number().over(wr))
        .withColumn(
            "med",
            F.max(
                F.when(
                    F.col("rn") == F.expr("(ndays + 1) DIV 2"), F.col("n")
                )
            ).over(wt),
        )
        .select(
            "event_type",
            "day",
            "n",
            "med",
            F.abs(F.col("n") - F.col("med")).alias("ad"),
        )
    )
    wr2 = Window.partitionBy("event_type").orderBy("ad", "day")
    out = (
        med.withColumn("ndays", F.count(F.lit(1)).over(wt))
        .withColumn("rn2", F.row_number().over(wr2))
        .withColumn(
            "mad",
            F.max(
                F.when(
                    F.col("rn2") == F.expr("(ndays + 1) DIV 2"), F.col("ad")
                )
            ).over(wt),
        )
    )
    return out.select(
        "event_type",
        "day",
        "n",
        F.col("med").cast("long").alias("med"),
        F.col("mad").cast("long").alias("mad"),
        F.expr("CAST((1000000 * ad) DIV greatest(mad, 1) AS BIGINT)").alias(
            "rz_e6"
        ),
        (F.col("ad") > F.lit(ANOMALY_MAD_MULT) * F.col("mad")).alias(
            "is_anomaly"
        ),
    )


ANOMALY_MAD_ORACLE_SQL = f"""
    WITH daily AS (
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    med AS (
        SELECT event_type, day, n,
               max(CASE WHEN rn = (ndays + 1) // 2 THEN n END)
                   OVER (PARTITION BY event_type) AS med
        FROM (
            SELECT event_type, day, n,
                   count(*) OVER (PARTITION BY event_type) AS ndays,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY n, day) AS rn
            FROM daily
        )
    ),
    ad AS (
        SELECT event_type, day, n, med, abs(n - med) AS ad FROM med
    ),
    mad AS (
        SELECT event_type, day, n, med, ad,
               max(CASE WHEN rn2 = (ndays + 1) // 2 THEN ad END)
                   OVER (PARTITION BY event_type) AS mad
        FROM (
            SELECT event_type, day, n, med, ad,
                   count(*) OVER (PARTITION BY event_type) AS ndays,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY ad, day) AS rn2
            FROM ad
        )
    )
    SELECT event_type, day, n,
           CAST(med AS BIGINT) AS med,
           CAST(mad AS BIGINT) AS mad,
           CAST((1000000 * ad) // greatest(mad, 1) AS BIGINT) AS rz_e6,
           ad > {ANOMALY_MAD_MULT} * mad AS is_anomaly
    FROM mad
"""
