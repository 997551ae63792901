"""stream_join_attribution: the stream-stream interval join. The
drained result must equal the batch interval join (the op's
determinism contract — its watermark out-spans the fixture), and the
watermark-eviction semantics the docstring claims are pinned with a
tight watermark and a 3-file late-arrival split (CLAUDE.md: a 2-file
split never drops late rows)."""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from ai_ocr_spark.streaming.util import (
    detach,
    drain_available_now,
    write_ordered_file,
)
from ai_ocr_spark.streaming.windows import stream_join_attribution

SF = "/root/testdata/sf0.001"


def _batch_pairs(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    i = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("u"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("vts"),
    )
    c = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("cu"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("cts"),
    )
    return i.join(
        c,
        (F.col("u") == F.col("cu"))
        & (F.col("cts") >= F.col("vts"))
        & (F.col("cts") <= F.col("vts") + F.expr("INTERVAL 2 HOURS")),
    )


def test_drain_equals_batch_interval_join(spark):
    got = {
        (r.view_id, r.purchase_id)
        for r in stream_join_attribution(spark, SF).collect()
    }
    want = {
        (r.view_id, r.purchase_id) for r in _batch_pairs(spark, SF).collect()
    }
    assert got == want and got


def test_lag_is_exact_microseconds_and_nonnegative(spark):
    for r in stream_join_attribution(spark, SF).collect():
        micro = int(
            (r.purchase_ts - r.view_ts).total_seconds() * 1_000_000
        )
        assert abs(r.lag_us - micro) <= 1  # float total_seconds rounding
        assert 0 <= r.lag_us <= 2 * 3600 * 1_000_000


def test_tight_watermark_evicts_late_views(spark):
    """Pin the state-eviction semantics the op's 90-day watermark
    deliberately suppresses: with a 1-hour watermark, a (view,
    purchase) pair arriving two batches after the watermark passed
    day 1 never emits, while an in-watermark pair does."""
    prior_tz = spark.conf.get("spark.sql.session.timeZone", None)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    stage = tempfile.mkdtemp(prefix="stream_attr_evict_")
    try:
        from datetime import datetime

        def ev(eid, ts, uid, etype):
            return (
                eid,
                datetime.strptime(ts, "%Y-%m-%d %H:%M:%S"),
                uid,
                etype,
                1.0,
                None,
            )

        cols = "event_id long, ts timestamp, user_id long, " \
               "event_type string, value double, props string"
        D10, D10B, D1, D1B = (
            "2024-01-10 00:00:00",
            "2024-01-10 00:30:00",
            "2024-01-01 00:00:00",
            "2024-01-01 00:30:00",
        )
        batches = {
            # b0 advances both watermarks to ~day10 and seeds the
            # on-time pair (100, 200)
            ("views", 0): [ev(100, D10, 7, "view")],
            ("convs", 0): [ev(200, D10B, 7, "purchase")],
            # b1 keeps the watermark there (the late filter lags one
            # batch — CLAUDE.md — so the drop must happen in b2)
            ("views", 1): [ev(101, D10B, 8, "view")],
            ("convs", 1): [ev(201, D10B, 9, "purchase")],
            # b2 delivers a day-1 pair, 9 days below the watermark
            ("views", 2): [ev(102, D1, 5, "view")],
            ("convs", 2): [ev(202, D1B, 5, "purchase")],
        }
        now = 1_700_000_000
        for (side, k), rows in batches.items():
            d = os.path.join(stage, side)
            os.makedirs(d, exist_ok=True)
            df = spark.createDataFrame(rows, cols).withColumn(
                "ts", F.col("ts").cast("timestamp")
            )
            write_ordered_file(
                df, os.path.join(d, f"b{k}.parquet"), now + 100 * k
            )
        schema = spark.read.parquet(os.path.join(stage, "views")).schema

        def _read(side):
            return (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(os.path.join(stage, side))
            )

        views = _read("views").select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        ).withWatermark("view_ts", "1 hour")
        convs = _read("convs").select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        ).withWatermark("purchase_ts", "1 hour")
        joined = views.join(
            convs,
            F.expr(
                "v_user = c_user AND purchase_ts >= view_ts "
                "AND purchase_ts <= view_ts + INTERVAL 2 HOURS"
            ),
        )
        name = drain_available_now(
            joined, "append", os.path.join(stage, "ckpt"),
            prefix="attr_evict",
        )
        out = detach(spark, spark.table(name), name)
        pairs = {(r.view_id, r.purchase_id) for r in out.collect()}
        assert (100, 200) in pairs          # on-time pair emits
        assert (102, 202) not in pairs      # late pair evicted/dropped
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        if prior_tz is None:
            spark.conf.unset("spark.sql.session.timeZone")
        else:
            spark.conf.set("spark.sql.session.timeZone", prior_tz)
