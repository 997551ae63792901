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
        from .util import detach, drain_available_now

        name = drain_available_now(agg, "complete", prefix="stream_events")
        out = spark.table(name).select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            F.col("w.end").cast("timestamp_ntz").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
        # detach inside the UTC pin: the NTZ casts evaluate at collect
        return detach(spark, out, name)
    finally:
        if prior_tz is None:
            spark.conf.unset("spark.sql.session.timeZone")
        else:
            spark.conf.set("spark.sql.session.timeZone", prior_tz)


def stream_events_daily_append(spark: "SparkSession", sf_dir: str) -> DataFrame:
    """Append-mode twin of stream_events_daily with REAL watermark
    drops on both sides (VERDICT r2 next-round #8: the complete-mode
    drain can't show late-data exclusion, because complete mode keeps
    every window forever).

    Arrival order is made deterministic: the events table is split
    into three parquet files — batch k holds event_id % 3 == k — with
    forced mtimes so the file stream (maxFilesPerTrigger=1) processes
    them in that order. With a 1-day watermark over 1-day tumbling
    windows, Structured Streaming then provably excludes rows two ways:

      * late-row drop: a batch-2 row whose window closed under the
        batch-0 watermark (window_end <= max_ts(batch0) - 1 day) never
        reaches state (numRowsDroppedByWatermark > 0);
      * unemitted tail: windows not closed by the FINAL watermark
        (window_end > max_ts(all) - 1 day) are still open at drain end
        and are never emitted in append mode.

    Why batch 0's max governs batch 2 (measured on this Spark build
    with a 3-file controlled experiment, not assumed): the late filter
    in micro-batch k uses the watermark current when the batch's
    offsets were planned, which reflects event-time stats only through
    batch k-2 — one batch behind the watermark the progress log
    reports. A two-file split therefore never drops anything; three
    files make the drop real. Final emission does use the full-data
    watermark.

    The DuckDB twin reconstructs both rules from the same % 3 split —
    two scalar max() subqueries, a row filter, and a HAVING — so the
    value hash checks the watermark semantics, not just the sums.
    (The per-split files are written via the batch writer —
    driver-light; the windowed aggregation itself is the production
    streaming shape.)"""
    import os
    import shutil
    import tempfile

    from .util import detach, drain_available_now, write_ordered_file

    prior_tz = spark.conf.get("spark.sql.session.timeZone", None)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    stage = tempfile.mkdtemp(prefix="stream_append_")
    try:
        events = spark.read.parquet(f"{sf_dir}/events.parquet")
        schema = events.schema
        os.makedirs(os.path.join(stage, "in"))
        now = 1_700_000_000
        # pinned names + mtimes: the file stream source orders by
        # modification time, so batch order — and therefore the
        # watermark sequence — is deterministic
        for k in range(3):
            write_ordered_file(
                events.filter(F.col("event_id") % 3 == k),
                os.path.join(stage, "in", f"batch{k}.parquet"),
                now + 100 * k,
            )

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(stage, "in"))
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )
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
        name = drain_available_now(
            agg, "append", os.path.join(stage, "ckpt"), prefix="stream_append"
        )
        out = spark.table(name).select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            F.col("w.end").cast("timestamp_ntz").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
        # detach inside the UTC pin: the NTZ casts evaluate at collect
        return detach(spark, out, name)
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        if prior_tz is None:
            spark.conf.unset("spark.sql.session.timeZone")
        else:
            spark.conf.set("spark.sql.session.timeZone", prior_tz)


STREAM_EVENTS_DAILY_APPEND_ORACLE = """
    WITH m0 AS (SELECT max(ts) AS wm FROM events WHERE event_id % 3 = 0),
         ma AS (SELECT max(ts) AS wm FROM events),
         kept AS (
             -- the late filter in micro-batch k uses the watermark
             -- from batches <= k-2 (measured; see the operator
             -- docstring): batch-0/1 rows face no watermark, batch-2
             -- rows are dropped when their window already closed
             -- under the batch-0 watermark (max batch-0 ts - 1 day)
             SELECT e.* FROM events e, m0
             WHERE e.event_id % 3 <> 2
                OR date_trunc('day', e.ts) + INTERVAL 1 DAY
                   > m0.wm - INTERVAL 1 DAY
         )
    SELECT date_trunc('day', ts) AS window_start,
           date_trunc('day', ts) + INTERVAL 1 DAY AS window_end,
           event_type,
           count(*) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(28,8))), 4) AS DOUBLE)
               AS sum_value
    FROM kept, ma
    GROUP BY 1, 2, 3, ma.wm
    -- append mode emits only windows the FINAL watermark has closed
    HAVING date_trunc('day', ts) + INTERVAL 1 DAY <= ma.wm - INTERVAL 1 DAY
"""


STREAM_EVENTS_DAILY_ORACLE = """
    SELECT date_trunc('day', ts) AS window_start,
           date_trunc('day', ts) + INTERVAL 1 DAY AS window_end,
           event_type,
           count(*) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(28,8))), 4) AS DOUBLE)
               AS sum_value
    FROM events GROUP BY 1, 2, 3
"""


SESSION_GAP = "30 minutes"  # same inactivity gap as the batch sessionizer


def stream_session_windows(spark: "SparkSession", sf_dir: str) -> DataFrame:
    """Native Structured Streaming SESSION windows (F.session_window) —
    the stateful merging-window primitive the batch gaps-and-islands
    sessionizer (window_sessionize) emulates with two windows. Session
    windows only support append/update mode (state merges windows, so
    complete mode is unsupported); append emits a session once the
    watermark passes its end. To emit EVERY real session
    deterministically, the drain appends a second parquet file holding
    one sentinel row 200 days past max(ts): the final batch's watermark
    then clears all real sessions, while the sentinel's own session —
    still open at drain end — is the unemitted tail, filtered by its
    user_id = -1.

    Semantics under check: Spark merges events when the next arrives
    STRICTLY within gap of the session end (a new event exactly gap
    after the last opens a NEW session), and the emitted window end is
    last_event + gap. The DuckDB twin reconstructs both from scratch
    with the islands construction (new session when diff >= gap,
    session_end = max(ts) + gap), so the value hash pins the native
    session-window semantics against an independent derivation — not
    against another Spark query.

    Scale shape: state is O(open sessions per user), bounded by the
    watermark; the one shuffle keys on the session_window/user_id pair
    exactly like production sessionization."""
    import os
    import shutil
    import tempfile

    from .util import detach, drain_available_now, write_ordered_file

    prior_tz = spark.conf.get("spark.sql.session.timeZone", None)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    stage = tempfile.mkdtemp(prefix="stream_session_")
    try:
        events = spark.read.parquet(f"{sf_dir}/events.parquet")
        schema = events.schema
        os.makedirs(os.path.join(stage, "in"))
        now = 1_700_000_000
        write_ordered_file(
            events, os.path.join(stage, "in", "batch0.parquet"), now
        )
        sentinel = events.orderBy(F.col("ts").desc(), F.col("event_id")).limit(
            1
        ).select(
            F.lit(-1).cast("long").alias("event_id"),
            (F.col("ts") + F.expr("INTERVAL 200 DAYS")).alias("ts"),
            F.lit(-1).cast("long").alias("user_id"),
            F.lit("flush").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit(None).cast("string").alias("props"),
        )
        write_ordered_file(
            sentinel, os.path.join(stage, "in", "batch1.parquet"), now + 100
        )

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(stage, "in"))
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(
                F.session_window(F.col("ts"), SESSION_GAP).alias("w"),
                F.col("user_id"),
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum(F.col("value").cast("decimal(28,8)")), 4)
                .cast("double")
                .alias("session_value"),
            )
        )
        name = drain_available_now(
            agg, "append", os.path.join(stage, "ckpt"), prefix="stream_session"
        )
        out = (
            spark.table(name)
            .filter(F.col("user_id") >= 0)
            .select(
                "user_id",
                F.col("w.start").cast("timestamp_ntz").alias("session_start"),
                F.col("w.end").cast("timestamp_ntz").alias("session_end"),
                "n_events",
                "session_value",
            )
        )
        return detach(spark, out, name)
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        if prior_tz is None:
            spark.conf.unset("spark.sql.session.timeZone")
        else:
            spark.conf.set("spark.sql.session.timeZone", prior_tz)


SESSION_WINDOWS_ORACLE_SQL = """
    WITH s AS (
        -- EXACT timestamp arithmetic, not floor(epoch) seconds:
        -- session_window compares microsecond timestamps, so a pair
        -- 1799.9s apart whose floored diff is 1800 must MERGE (found
        -- as a 1-row mismatch at sf0.1; the batch window_sessionize
        -- twin floors on BOTH sides, so it is internally consistent
        -- but intentionally second-granular)
        SELECT user_id, event_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    t AS (
        SELECT *, sum(new_session) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS session_seq
        FROM s
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(28,8))), 4) AS DOUBLE)
               AS session_value
    FROM t
    GROUP BY user_id, session_seq
"""


def stream_quantiles_logbin(spark: "SparkSession", sf_dir: str) -> DataFrame:
    """The log-binned quantile sketch maintained AS STREAMING STATE —
    the mergeability claim of sketch_quantiles_logbin realized
    incrementally: documents arrive in three mtime-ordered micro-batch
    files, a complete-mode groupBy(lang, bin) count holds the histogram
    (state bounded at <=1024 bins x |langs| regardless of stream
    volume — this is why a log-binned histogram is the sketch a
    streaming profiler can afford), and the drained final table decodes
    to percentile estimates IDENTICAL to the batch sketch over the same
    rows. The oracle is therefore the batch twin's SQL verbatim: if the
    cross-batch state merge dropped or double-counted one row, the
    value hash breaks.

    Shape: the streaming aggregate is the sketch-build half (one
    map-side-combinable shuffle per micro-batch, constant state); the
    decode half (cumulative walk over the tiny histogram) runs batch
    on the drained result, exactly as a production job would read its
    continuously-maintained sketch table."""
    import os
    import shutil
    import tempfile

    from ..operators.sketch import _qs_bin_expr, _qs_decode
    from .util import detach, drain_available_now, write_ordered_file

    stage = tempfile.mkdtemp(prefix="stream_qsketch_")
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        rows = docs.select(
            "doc_id",
            "lang",
            F.length(F.coalesce(F.col("text"), F.lit("")))
            .cast("long")
            .alias("v"),
        )
        os.makedirs(os.path.join(stage, "in"))
        now = 1_700_000_000
        for k in range(3):
            write_ordered_file(
                rows.filter(F.col("doc_id") % 3 == k),
                os.path.join(stage, "in", f"b{k}.parquet"),
                now + 100 * k,
            )
        schema = spark.read.parquet(os.path.join(stage, "in")).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(stage, "in"))
        )
        hist = (
            stream.select("lang", _qs_bin_expr().alias("b"))
            .groupBy("lang", "b")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        name = drain_available_now(hist, "complete", prefix="stream_qsketch")
        out = _qs_decode(spark.table(name)).orderBy("lang")
        return detach(spark, out, name)
    finally:
        shutil.rmtree(stage, ignore_errors=True)


# --- stream-stream interval join (attribution shape) -------------------------

ATTR_WINDOW = "2 hours"     # conversion attributes to a view within 2h
ATTR_WATERMARK = "90 days"  # > the fixture span at every SF (see docstring)


def stream_join_attribution(spark: "SparkSession", sf_dir: str) -> DataFrame:
    """Stream-stream INTERVAL JOIN — the last Structured Streaming join
    surface the suite lacked (windows, sessions, dedup, arbitrary state
    are covered elsewhere): the ad-attribution shape, a 'purchase'
    stream inner-joined to the 'view' stream of the SAME user when the
    purchase lands within ATTR_WINDOW of the view. Spark buffers both
    sides as watermark-bounded state and emits a pair the moment both
    halves exist — the canonical two-stream enrichment every
    clickstream pipeline runs.

    Determinism contract: the drain uses a watermark (90 days) LARGER
    than the fixture's event span at any SF, so no state is evicted
    mid-drain and the emitted set is the COMPLETE interval join — the
    DuckDB twin is the plain batch interval join, hash-exact. The
    eviction semantics themselves (a view older than the watermark is
    dropped before its purchase arrives) are pinned separately in
    pytest with a 3-file late-arrival split and a tight watermark —
    CLAUDE.md: a 2-file split never drops late rows.

    Scale shape: state is O(events inside the watermark horizon) per
    side, keyed and co-shuffled on user_id (both sides exchange once
    into the same hash partitioning — the streaming symmetric hash
    join); the time bound lets Spark evict a buffered view the moment
    the purchase-side watermark passes view_ts + ATTR_WINDOW, so at a
    production 15-minute watermark the state is minutes of traffic,
    never the stream. lag_us is an exact integer both engines compute
    from microsecond epochs.
    """
    import os
    import shutil
    import tempfile

    from .util import detach, drain_available_now, write_ordered_file

    prior_tz = spark.conf.get("spark.sql.session.timeZone", None)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    stage = tempfile.mkdtemp(prefix="stream_attr_")
    try:
        events = spark.read.parquet(f"{sf_dir}/events.parquet")
        schema = events.schema
        now = 1_700_000_000
        for side, etype in (("views", "view"), ("convs", "purchase")):
            d = os.path.join(stage, side)
            os.makedirs(d)
            rows = events.filter(F.col("event_type") == etype)
            for k in (0, 1):
                write_ordered_file(
                    rows.filter(F.col("event_id") % 2 == k),
                    os.path.join(d, f"b{k}.parquet"),
                    now + 100 * k,
                )

        def _read(side: str) -> DataFrame:
            return (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(os.path.join(stage, side))
                .withColumn("ts", F.col("ts").cast("timestamp"))
            )

        views = _read("views").select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        ).withWatermark("view_ts", ATTR_WATERMARK)
        convs = _read("convs").select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        ).withWatermark("purchase_ts", ATTR_WATERMARK)
        joined = views.join(
            convs,
            F.expr(
                "v_user = c_user AND purchase_ts >= view_ts "
                f"AND purchase_ts <= view_ts + INTERVAL {ATTR_WINDOW}"
            ),
        )
        name = drain_available_now(
            joined, "append", os.path.join(stage, "ckpt"),
            prefix="stream_attr",
        )
        out = spark.table(name).select(
            F.col("v_user").alias("user_id"),
            "view_id",
            "purchase_id",
            F.col("view_ts").cast("timestamp_ntz").alias("view_ts"),
            F.col("purchase_ts").cast("timestamp_ntz").alias("purchase_ts"),
            (F.unix_micros(F.col("purchase_ts")) - F.unix_micros(F.col("view_ts")))
            .cast("long")
            .alias("lag_us"),
            "purchase_value",
        )
        return detach(spark, out, name)
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        if prior_tz is None:
            spark.conf.unset("spark.sql.session.timeZone")
        else:
            spark.conf.set("spark.sql.session.timeZone", prior_tz)


ATTRIBUTION_ORACLE_SQL = """
    SELECT i.user_id,
           i.event_id AS view_id,
           c.event_id AS purchase_id,
           i.ts AS view_ts,
           c.ts AS purchase_ts,
           CAST(epoch_us(c.ts) - epoch_us(i.ts) AS BIGINT) AS lag_us,
           c.value AS purchase_value
    FROM events i
    JOIN events c
      ON i.user_id = c.user_id
     AND i.event_type = 'view'
     AND c.event_type = 'purchase'
     AND c.ts >= i.ts
     AND c.ts <= i.ts + INTERVAL 2 HOUR
"""


def stream_anomaly_mad(spark: "SparkSession", sf_dir: str) -> DataFrame:
    """The MAD anomaly rule over a CONTINUOUSLY-MAINTAINED daily count
    table — the streaming twin of operators/temporal.events_anomaly_mad
    and the shape an alerting pipeline actually runs: events arrive in
    three mtime-ordered micro-batch files, a complete-mode
    groupBy(event_type, day) count holds the calendar-sized state (the
    same bound the batch op's first aggregate establishes — this is
    why daily rollups are the aggregate a stream can afford forever),
    and the Hampel verdict suffix (temporal.mad_rule, shared code)
    runs batch over the drained table, exactly as a production job
    reads its maintained counts.

    The oracle is the batch twin's SQL VERBATIM: if the cross-batch
    state merge dropped or double-counted one event, a count shifts
    and the value hash breaks — batch==stream equality is the checked
    contract, not a docstring claim (same witness pattern as
    stream_quantiles_logbin). date_format over the NTZ timestamps is
    timezone-free, so no session-tz pin is needed.
    """
    import os
    import shutil
    import tempfile

    from ..operators.temporal import mad_rule
    from .util import detach, drain_available_now, write_ordered_file

    stage = tempfile.mkdtemp(prefix="stream_anomaly_")
    try:
        ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
            "event_id", "event_type", "ts"
        )
        os.makedirs(os.path.join(stage, "in"))
        now = 1_700_000_000
        for k in range(3):
            write_ordered_file(
                ev.filter(F.col("event_id") % 3 == k),
                os.path.join(stage, "in", f"b{k}.parquet"),
                now + 100 * k,
            )
        schema = spark.read.parquet(os.path.join(stage, "in")).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(stage, "in"))
        )
        daily = (
            stream.select(
                "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
            )
            .groupBy("event_type", "day")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )
        name = drain_available_now(daily, "complete", prefix="stream_anomaly")
        out = mad_rule(spark.table(name))
        return detach(spark, out, name)
    finally:
        shutil.rmtree(stage, ignore_errors=True)
