"""Event-time windowed aggregation with watermark-bounded late data.

The reference has no event-time semantics (SURVEY §2.10), but a crawl
ingest stream does: pages arrive out of warc_ts order, and per-window
crawl-rate metrics need a bound on how late a page may be before its
window is finalized. Standard Structured Streaming shape:

    withWatermark(warc_ts, slack) -> groupBy(window(warc_ts, size)) -> agg

Append mode emits each window exactly once, when the watermark passes
its end — the streaming twin of the batch metrics rollup (A8).
State is O(open windows), bounded by the watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_crawl_metrics(
    pages_stream: DataFrame,
    window_size: str = "1 hour",
    late_slack: str = "2 hours",
) -> DataFrame:
    """Streaming pages -> per-(event-time-window, lang) crawl counters.

    Pages later than `late_slack` behind the max observed warc_ts are
    dropped (watermark semantics); everything else lands in its event-
    time window regardless of arrival order."""
    return (
        pages_stream.withWatermark("warc_ts", late_slack)
        .groupBy(
            F.window("warc_ts", window_size).alias("w"),
            F.col("lang"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum(F.length("html").cast("long")).alias("n_bytes"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n_pages",
            "n_bytes",
        )
    )


def stream_events_daily(spark: "SparkSession", sf_dir: str) -> DataFrame:
    """Oracle-checkable streaming query: readStream over the events
    table -> watermarked 1-day tumbling windows per event_type ->
    Trigger.AvailableNow drain into a memory sink -> the drained result
    as a batch DataFrame.

    Because AvailableNow drains ALL currently-available input and
    complete-mode aggregation holds every window, the final table equals
    the batch aggregation of the same data — which is exactly what the
    DuckDB twin computes (date_trunc-day groups; windows align because
    the session timezone is pinned UTC). This turns the Structured
    Streaming path (SURVEY §2.10) into a value-hash-checked surface
    instead of pytest-only coverage."""
    import uuid

    from pyspark.sql import SparkSession  # noqa: F401  (typing)

    # the NTZ->timestamp cast below reads the session timezone; pin UTC
    # so the window boundaries match the DuckDB twin even under a driver
    # session that didn't come from ai_ocr_spark.session.get_spark.
    # Saved/restored around the drain — a caller's session must not
    # inherit UTC as a side effect of running one streaming query.
    prior_tz = spark.conf.get("spark.sql.session.timeZone", None)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
        # the file source requires a DIRECTORY; select just the events
        # file from the table dir via pathGlobFilter
        stream = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .option("maxFilesPerTrigger", "1")
            .parquet(sf_dir)
        )
        # watermarks require TimestampType (not NTZ); session tz is
        # pinned UTC so the cast is value-preserving, reversed on output
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
        agg = (
            stream.withWatermark("ts", "1 day")
            .groupBy(F.window("ts", "1 day").alias("w"), F.col("event_type"))
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum(F.col("value").cast("decimal(28,8)")), 4)
                .cast("double")
                .alias("sum_value"),
            )
        )
        name = f"stream_events_{uuid.uuid4().hex[:8]}"
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = spark.table(name).select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            F.col("w.end").cast("timestamp_ntz").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
        # detach the result from the memory-sink temp view so the view
        # can be dropped — otherwise every invocation leaks a full
        # aggregate copy in the driver catalog for the session's
        # lifetime. Must happen inside the UTC pin: the NTZ casts above
        # evaluate at this collect.
        result = spark.createDataFrame(out.collect(), out.schema)
        spark.catalog.dropTempView(name)
        return result
    finally:
        if prior_tz is None:
            spark.conf.unset("spark.sql.session.timeZone")
        else:
            spark.conf.set("spark.sql.session.timeZone", prior_tz)


STREAM_EVENTS_DAILY_ORACLE = """
    SELECT date_trunc('day', ts) AS window_start,
           date_trunc('day', ts) + INTERVAL 1 DAY AS window_end,
           event_type,
           count(*) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(28,8))), 4) AS DOUBLE)
               AS sum_value
    FROM events GROUP BY 1, 2, 3
"""
