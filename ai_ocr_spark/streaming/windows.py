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
