"""Incremental pages ingest via Structured Streaming.

Replaces the reference's Redis queue decoupling (redis_client.py:121-185,
specification.md:304-316) with the Spark-native equivalent: a file-source
stream over the pages directory, exactly-once per file via the stream
checkpoint, `Trigger.AvailableNow` so each invocation drains everything
currently available and stops (the batch-friendly queue-drain semantics
of `brpop` without a broker).

At-least-once delivery from upstream is absorbed by dropDuplicates on
url within the watermark; the downstream extraction stage is idempotent
anyway (snapshot resume, catalog.py), so duplicates across restarts
cannot double-write.

No event-time windows/late-data semantics are needed (the reference has
none); the watermark exists only to bound the dropDuplicates state —
unbounded per-url state would OOM a 10^12-url stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..pipeline import PAGES_SCHEMA, extract_pages


def read_pages_stream(
    spark: SparkSession,
    src_dir: str,
    max_files_per_trigger: int | None = None,
    dedup_within_watermark: str | None = None,
) -> DataFrame:
    """File-source stream of pages parquet with the fixed input schema.

    maxFilesPerTrigger bounds per-micro-batch work (payloads are multi-MB
    binaries — a trigger that grabs 10k files would blow executor mem).

    dedup_within_watermark (e.g. '1 hour'): absorb at-least-once upstream
    delivery with dropDuplicatesWithinWatermark on url — per-url state is
    evicted once the watermark passes, so state stays bounded on a
    10^12-url stream. Off by default: the file source is already
    exactly-once per file, WARC backfills legitimately deliver
    arbitrarily late warc_ts (which a watermark would silently drop), and
    cross-run idempotence comes from the snapshot anti-join (catalog.py),
    not from stream state."""
    reader = (
        spark.readStream.schema(PAGES_SCHEMA)
        .format("parquet")
        .option("path", src_dir)
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.load()
    if dedup_within_watermark:
        df = df.withWatermark(
            "warc_ts", dedup_within_watermark
        ).dropDuplicatesWithinWatermark(["url"])
    return df


def ingest_available_now(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    run_id: str = "stream-0",
) -> None:
    """Drain everything currently in src_dir through the extraction
    pipeline into out_dir, then stop. Re-running picks up only new files
    (checkpoint = the queue cursor). Blocks until the drain completes."""
    pages = read_pages_stream(spark, src_dir)
    extracted = extract_pages(pages, run_id=run_id)
    q = (
        extracted.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()


def stream_dedup_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle surface for dropDuplicatesWithinWatermark (the
    at-least-once absorption knob above, rows-only since r1): every
    url is delivered twice — once per micro-batch, in deterministic
    mtime order — and the stream must emit exactly the FIRST delivery.

    Determinism by construction: within a batch every url is unique
    (batch k carries the doc_id%2==k member of each url pair), so the
    only dedup decisions are cross-batch, where state makes the
    outcome order-independent: batch 0's member wins. The DuckDB twin
    is therefore the even-doc_id projection — trivial SQL, but the
    Spark side exercises the real keyed dedup state across batches and
    the row count proves the re-deliveries were dropped."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from .util import detach, drain_available_now, write_ordered_file

    stage = tempfile.mkdtemp(prefix="stream_dedup_")
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        rows = docs.select(
            F.concat(
                F.lit("doc/"), F.floor(F.col("doc_id") / 2).cast("long").cast("string")
            ).alias("url"),
            F.timestamp_seconds(F.lit(1740787200) + F.col("doc_id")).alias("warc_ts"),
            "doc_id",
        )
        os.makedirs(os.path.join(stage, "in"))
        now = 1_700_000_000
        for k in range(2):
            write_ordered_file(
                rows.filter(F.col("doc_id") % 2 == k),
                os.path.join(stage, "in", f"b{k}.parquet"),
                now + 100 * k,
            )
        schema = spark.read.parquet(os.path.join(stage, "in")).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(stage, "in"))
            .withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
        )
        # wide watermark: state bounding is the production reason for
        # the watermark; the dedup SEMANTICS are what this row checks
        dd = stream.withWatermark("warc_ts", "30 days").dropDuplicatesWithinWatermark(
            ["url"]
        )
        name = drain_available_now(
            dd.select("url", "doc_id"),
            "append",
            os.path.join(stage, "ckpt"),
            prefix="stream_dedup",
        )
        out = spark.table(name).select(
            "url", F.col("doc_id").alias("kept_doc_id")
        )
        return detach(spark, out, name)
    finally:
        shutil.rmtree(stage, ignore_errors=True)


STREAM_DEDUP_URLS_ORACLE = """
    SELECT 'doc/' || CAST(doc_id // 2 AS VARCHAR) AS url,
           doc_id AS kept_doc_id
    FROM documents WHERE doc_id % 2 = 0
"""
