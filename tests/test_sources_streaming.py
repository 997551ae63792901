"""Sources (sniffing, binaryFile, upload gate), streaming ingest, and
physical-plan audits (pushdown / pruning / broadcast)."""

import os

import pytest
from pyspark.sql import functions as F


def test_content_kind_sniffing(spark):
    from ai_ocr_spark.sources.pages import content_kind

    rows = [
        ("u1", b"%PDF-1.4 ..."),
        ("u2", b"<!DOCTYPE html><html><body>x</body></html>"),
        ("u3", b"<HTML><head></head></HTML>"),
        ("u4.csv", b"a,b,c\n1,2,3\n"),
        ("u5", b"plain words here"),
    ]
    df = spark.createDataFrame(rows, ["url", "html"]).select(
        "url", content_kind(F.col("html"), F.col("url")).alias("kind")
    )
    got = {r.url: r.kind for r in df.collect()}
    assert got == {
        "u1": "pdf", "u2": "html", "u3": "html", "u4.csv": "csv", "u5": "text"
    }


def test_csv_delimiter_and_encoding_sniff(spark):
    from ai_ocr_spark.sources.pages import sniff_csv_delimiter, sniff_encoding

    rows = [
        ("c1", b"a,b,c\n1,2,3\n"),
        ("c2", b"a;b;c\n1;2;3\n"),
        ("c3", b"a\tb\tc\n1\t2\t3\n"),
        ("c4", b"a|b|c\n1|2|3\n"),
        ("c5", b"\xef\xbb\xbfa,b\n"),
    ]
    df = spark.createDataFrame(rows, ["url", "html"]).select(
        "url",
        sniff_csv_delimiter(F.col("html")).alias("delim"),
        sniff_encoding(F.col("html")).alias("enc"),
    )
    got = {r.url: (r.delim, r.enc) for r in df.collect()}
    assert got["c1"] == (",", "utf-8")
    assert got["c2"] == (";", "utf-8")
    assert got["c3"] == ("\t", "utf-8")
    assert got["c4"] == ("|", "utf-8")
    assert got["c5"][1] == "utf-8-sig"


def test_upload_gate_reasons(spark):
    from ai_ocr_spark.sources.pages import upload_gate

    rows = [("ok", b"content"), ("empty", b"")]
    df = upload_gate(spark.createDataFrame(rows, ["url", "html"]))
    got = {r.url: (r.accepted, r.skip_reason) for r in df.collect()}
    assert got["ok"] == (True, None)
    assert got["empty"][0] is False


def test_binary_file_source(spark, tmp_path):
    from ai_ocr_spark.sources.pages import pages_from_binary_files

    p = tmp_path / "docs"
    p.mkdir()
    (p / "a.html").write_bytes(b"<html><body>hello</body></html>")
    (p / "b.html").write_bytes(b"<html><body>world</body></html>")
    df = pages_from_binary_files(spark, str(p))
    rows = df.collect()
    assert len(rows) == 2
    assert all(r.url.startswith("file://") for r in rows)
    assert {bytes(r.html)[:5] for r in rows} == {b"<html"}


def test_streaming_available_now_drains_and_resumes(spark, tmp_path):
    """Trigger.AvailableNow drains current files; a second run with the
    same checkpoint re-reads nothing (queue-cursor semantics)."""
    from ai_ocr_spark.datagen import write_pages_parquet
    from ai_ocr_spark.streaming.ingest import ingest_available_now

    src = tmp_path / "src"
    src.mkdir()
    write_pages_parquet(str(src / "part0.parquet"), 40)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    ingest_available_now(spark, str(src), out, ckpt, run_id="s1")
    n1 = spark.read.parquet(out).count()
    assert n1 == 40

    # drain again: nothing new -> no new rows
    ingest_available_now(spark, str(src), out, ckpt, run_id="s2")
    assert spark.read.parquet(out).count() == n1

    # add a new file -> only its rows are appended
    write_pages_parquet(str(src / "part1.parquet"), 10)
    ingest_available_now(spark, str(src), out, ckpt, run_id="s3")
    assert spark.read.parquet(out).count() == n1 + 10


def test_plan_html_pruned_in_metrics_query(spark, pages_parquet):
    """Queries that don't need the payload must not deserialize it."""
    from ai_ocr_spark.plans.audit import assert_column_pruned

    pages = spark.read.parquet(pages_parquet)
    q = pages.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    assert_column_pruned(q, "html")


def test_plan_filter_pushdown_to_scan(spark, pages_parquet):
    from ai_ocr_spark.plans.audit import assert_filter_pushed

    pages = spark.read.parquet(pages_parquet)
    q = pages.filter(F.col("lang") == "en").select("url")
    assert_filter_pushed(q, "lang")


def test_plan_dim_join_is_broadcast(spark):
    from ai_ocr_spark.operators.relational import join_nation_region_rollup
    from ai_ocr_spark.plans.audit import assert_broadcast_join

    q = join_nation_region_rollup(spark, "/root/testdata/sf0.001")
    assert_broadcast_join(q)


def test_windowed_crawl_metrics_event_time(spark, tmp_path):
    """Event-time windows finalize in append mode and reconcile with a
    batch recount over the same data."""
    from ai_ocr_spark.datagen import write_pages_parquet
    from ai_ocr_spark.streaming.ingest import read_pages_stream
    from ai_ocr_spark.streaming.windows import windowed_crawl_metrics

    src = tmp_path / "src"
    src.mkdir()
    write_pages_parquet(str(src / "a.parquet"), 60)

    # two micro-batches so the watermark advances between them
    stream = read_pages_stream(spark, str(src), max_files_per_trigger=1)
    agg = windowed_crawl_metrics(stream, window_size="1 day", late_slack="1 hour")
    # update mode: running per-window results each batch (append mode
    # would withhold windows until the watermark passes them — with a
    # bounded fixture that means the final batch emits nothing)
    q = (
        agg.writeStream.format("memory")
        .queryName("crawl_windows")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = (
        spark.sql("SELECT * FROM crawl_windows")
        .toPandas()
        .groupby(["window_start", "lang"], as_index=False)
        .last()
    )
    batch = (
        spark.read.parquet(str(src / "a.parquet"))
        .groupBy(F.window("warc_ts", "1 day"), "lang")
        .count()
        .toPandas()
    )
    # the last update per (window, lang) must equal the batch recount
    batch_counts = {
        (r["window"]["start"], r["lang"]): r["count"] for _, r in batch.iterrows()
    }
    assert len(got) > 0
    for _, r in got.iterrows():
        assert batch_counts[(r["window_start"], r["lang"])] == r["n_pages"]


def test_stream_events_daily_equals_batch(spark):
    from pyspark.sql import functions as F

    from ai_ocr_spark.streaming.windows import stream_events_daily

    sf = "/root/testdata/sf0.001"
    out = stream_events_daily(spark, sf).toPandas()
    assert len(out) > 0
    assert ((out["window_end"] - out["window_start"]).dt.days == 1).all()
    batch = (
        spark.read.parquet(f"{sf}/events.parquet")
        .groupBy(F.date_trunc("day", "ts").alias("window_start"), "event_type")
        .count()
        .toPandas()
    )
    assert out["n_events"].sum() == batch["count"].sum()


def test_warc_emit_parse_roundtrip_and_file_source(spark, tmp_path):
    import gzip

    from ai_ocr_spark.kernels.warc import emit_warc, first_response_body, parse_warc
    from ai_ocr_spark.sources.pages import pages_from_warc

    records = [
        ("https://a.example.com/1", "2025-03-01T00:00:00Z", b"<html><body><p>alpha one</p></body></html>"),
        ("https://b.example.com/2", "2025-03-01T00:00:01Z", b"plain beta text"),
        ("https://c.example.com/3", "2025-03-01T00:00:02Z", "utf8 é漢".encode()),
    ]
    stream = emit_warc(records)
    parsed = parse_warc(stream)
    assert [(r["url"], r["body"]) for r in parsed] == [
        (u, b) for u, _d, b in records
    ]
    assert first_response_body(stream) == records[0][2]
    # malformed never raises
    assert parse_warc(b"WARC/1.0\r\nbroken") == []
    assert parse_warc(stream[: len(stream) // 2])  # truncated: best effort

    # file source: plain + whole-file gzip, records flattened
    (tmp_path / "a.warc").write_bytes(stream)
    (tmp_path / "b.warc.gz").write_bytes(gzip.compress(stream))
    pages = pages_from_warc(spark, str(tmp_path) + "/*").toPandas()
    assert len(pages) == 2 * len(records)
    assert set(pages["url"]) == {u for u, _d, _b in records}
    assert pages["warc_ts"].notna().all()


def test_warc_payload_unwraps_in_extraction():
    from ai_ocr_spark.kernels.oracle import extract_one
    from ai_ocr_spark.kernels.warc import emit_warc

    payload = emit_warc(
        [("https://x.example.com/p", "2025-03-01T00:00:00Z",
          b"<html><body><p>warc wrapped words</p></body></html>")]
    )
    res = extract_one("https://x.example.com/p", payload)
    assert res["content_kind"] == "html"
    assert res["main_text"] == "warc wrapped words"


def test_warc_edge_cases_from_review():
    import gzip

    from ai_ocr_spark.kernels.oracle import analyze_payload
    from ai_ocr_spark.kernels.warc import emit_warc, parse_warc

    # non-ASCII IRI round-trips (headers are UTF-8, not latin-1)
    recs = parse_warc(emit_warc([("https://ex.com/café/資料", "2025-03-01T00:00:00Z", b"x")]))
    assert recs[0]["url"] == "https://ex.com/café/資料"
    # a text page QUOTING the magic is NOT swallowed as a container
    quoted = b"WARC/1.0 is the container format used by Common Crawl."
    kind, text, _t, _s = analyze_payload(quoted)
    assert kind == "text" and "container format" in text
    # nested transports unwrap iteratively (gzip(warc(gzip(html))))
    html = b"<html><body><p>deeply nested page</p></body></html>"
    nested = gzip.compress(
        emit_warc([("https://n.example.com/x", "2025-03-01T00:00:00Z", gzip.compress(html))])
    )
    kind2, text2, _t2, _s2 = analyze_payload(nested)
    assert kind2 == "html" and text2 == "deeply nested page"
    # pathological 50x-nested gzip: bounded unwrap, no RecursionError
    bomb = html
    for _ in range(50):
        bomb = gzip.compress(bomb)
    kind3 = analyze_payload(bomb)[0]
    assert kind3 == "binary"  # depth cap hit -> opaque, never a raise


def test_warc_negative_content_length_terminates():
    """A record with a negative Content-Length must not wedge the scan:
    i = hdr_end + 4 + clen moves the cursor BACKWARDS, and the
    \\r\\nWARC/ rescan re-finds the same record forever. parse_warc is
    called per-row on untrusted Common-Crawl payloads inside the fused
    kernel (contract: never raises, and — stronger — never hangs)."""
    from ai_ocr_spark.kernels.warc import emit_warc, parse_warc

    good = emit_warc([("https://ok.example.com/a", "2025-03-01T00:00:00Z", b"fine")])
    hostile = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: https://evil.example.com/x\r\n"
        b"Content-Length: -100\r\n"
        b"\r\n"
    )
    # hostile record first: the scan must stop (best effort), not loop
    recs = parse_warc(hostile + good)
    assert isinstance(recs, list)  # returned at all == no hang
    # sane records BEFORE the hostile one still come back
    recs2 = parse_warc(good + hostile)
    assert [r["url"] for r in recs2] == ["https://ok.example.com/a"]


def test_warc_incremental_stream_chunk_boundaries():
    """iter_warc_stream must yield exactly the records parse_warc sees
    regardless of how the byte stream is chunked — including chunks so
    small the 'WARC/' magic and header/payload boundaries straddle
    every split."""
    from ai_ocr_spark.kernels.warc import emit_warc, iter_warc_stream, parse_warc

    records = [
        (f"https://s{i}.example.com/{i}", "2025-03-01T00:00:00Z",
         ("payload %d " % i * 50).encode())
        for i in range(10)
    ]
    stream = emit_warc(records)
    want = [(r["url"], r["body"]) for r in parse_warc(stream)]
    for size in (1, 7, 64, 1024, len(stream)):
        chunks = [stream[o : o + size] for o in range(0, len(stream), size)]
        got = [(r["url"], r["body"]) for r in iter_warc_stream(chunks)]
        assert got == want, f"chunk size {size} diverged"


def test_warc_file_source_surfaces_errors_not_silent_drop(spark, tmp_path):
    """ADVICE r2: a failing WARC file must emit a countable warcerr://
    diagnostic row, never vanish (the r2 version silently `continue`d)."""
    import gzip

    from ai_ocr_spark.kernels.warc import emit_warc
    from ai_ocr_spark.sources.pages import WARC_ERROR_URL_PREFIX, pages_from_warc

    good = emit_warc(
        [("https://ok.example.com/a", "2025-03-01T00:00:00Z", b"<p>fine</p>")]
    )
    hostile = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"Content-Length: -100\r\n\r\n"
    )
    (tmp_path / "good.warc.gz").write_bytes(gzip.compress(good))
    # valid gzip magic, garbage body -> corrupt-transport error row
    (tmp_path / "corrupt.warc.gz").write_bytes(b"\x1f\x8b" + b"\x00" * 64)
    # good record then hostile record -> record rows AND an error row
    (tmp_path / "partial.warc").write_bytes(good + hostile)

    pages = pages_from_warc(spark, str(tmp_path) + "/*").toPandas()
    errs = pages[pages["url"].str.startswith(WARC_ERROR_URL_PREFIX)]
    oks = pages[~pages["url"].str.startswith(WARC_ERROR_URL_PREFIX)]
    assert len(oks) == 2  # one good record from each parseable file
    assert len(errs) == 2  # corrupt gzip + negative content-length
    reasons = set(u.rsplit("#", 1)[1] for u in errs["url"])
    assert reasons == {"corrupt gzip transport", "negative content-length"}


def test_asof_price_belongs_to_the_picked_order(spark):
    """max_by regression: asof_price must come from the SAME order as
    asof_orderkey when a customer has several orders on the as-of date."""
    import pandas as pd

    from ai_ocr_spark.operators.temporal import join_asof_orders

    out = join_asof_orders(spark, "/root/testdata/sf0.001").toPandas()
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").toPandas()
    price_of = dict(zip(orders["o_orderkey"], orders["o_totalprice"]))
    hit = out[out["asof_orderkey"].notna()].head(200)
    for _, r in hit.iterrows():
        assert r["asof_price"] == price_of[int(r["asof_orderkey"])]


def test_append_drain_provably_drops_late_rows_and_tail(spark):
    """The append-mode drain must differ from the complete-mode drain
    in BOTH documented ways: the unemitted tail (windows the final
    watermark left open) and late-row drops (batch-2 rows whose window
    closed under the batch-0 watermark). If either effect vanished the
    oracle would be value-checking a trivial copy of the batch rollup."""
    from ai_ocr_spark.streaming.windows import (
        stream_events_daily,
        stream_events_daily_append,
    )

    sf = "/root/testdata/sf0.001"
    full = stream_events_daily(spark, sf).toPandas()
    app = stream_events_daily_append(spark, sf).toPandas()
    assert len(app) < len(full)  # tail windows never emitted
    m = app.merge(
        full,
        on=["window_start", "window_end", "event_type"],
        suffixes=("_a", "_f"),
    )
    assert len(m) == len(app)  # every emitted window exists in batch
    assert (m["n_events_a"] < m["n_events_f"]).any()  # real late drops
    assert (m["n_events_a"] <= m["n_events_f"]).all()


def test_stream_session_windows_match_batch_islands(spark):
    """Native session_window sessions agree with the batch
    gaps-and-islands sessionizer on bounds and membership, sessions
    never overlap per user, and the sentinel flush row is excluded."""
    from ai_ocr_spark.operators.relational import window_sessionize
    from ai_ocr_spark.streaming.windows import stream_session_windows

    sf = "/root/testdata/sf0.001"
    got = stream_session_windows(spark, sf).toPandas()
    assert (got["user_id"] >= 0).all()  # sentinel filtered
    batch = window_sessionize(spark, sf).toPandas()
    assert len(got) == len(batch)
    g = got.sort_values(["user_id", "session_start"]).reset_index(drop=True)
    b = batch.sort_values(["user_id", "session_start"]).reset_index(drop=True)
    assert (g["user_id"] == b["user_id"]).all()
    assert (g["session_start"] == b["session_start"]).all()
    assert (g["n_events"] == b["n_events"]).all()
    assert (g["session_value"] == b["session_value"]).all()
    # session_window end = last event + gap (batch reports last event)
    import pandas as pd

    assert (
        g["session_end"] == b["session_end"] + pd.Timedelta(minutes=30)
    ).all()
    # no per-user overlap: each session starts at/after the prior end
    for _, grp in g.groupby("user_id"):
        e = grp["session_end"].shift(1).dropna()
        s = grp["session_start"].iloc[1:]
        assert (s.values >= e.values).all()


def test_wet_parse_selects_conversion_records_only():
    from ai_ocr_spark.kernels.warc import parse_warc, parse_wet

    wet = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\ninfo\r\n\r\n"
        b"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: u1\r\n"
        b"WARC-Date: d\r\nContent-Length: 11\r\n\r\nline1\nWARC/\r\n\r\n"
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: u2\r\n"
        b"Content-Length: 20\r\n\r\nHTTP/1.1 200 OK\r\n\r\nab\r\n\r\n"
        b"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: u3\r\n"
        b"Content-Length: 0\r\n\r\n\r\n\r\n"
    )
    recs = parse_wet(wet)
    # conversion records only; a payload containing a 'WARC/' lookalike
    # cannot desync the length-delimited walker
    assert [(r["url"], r["text"]) for r in recs] == [
        ("u1", "line1\nWARC/"),
        ("u3", ""),
    ]
    # the response path is unchanged: it still sees only u2
    assert [r["url"] for r in parse_warc(wet)] == ["u2"]


def test_wet_roundtrip_recovers_canonical_text(spark):
    from pyspark.sql import functions as F

    from ai_ocr_spark.operators.roundtrip import pipeline_wet_roundtrip

    sf = "/root/testdata/sf0.001"
    out = pipeline_wet_roundtrip(spark, sf).toPandas()
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    n = docs.count()
    assert len(out) == n  # every page re-ingested exactly once
    assert out["doc_id"].is_unique
    # byte-identical canon per url (the north-rule invariant through
    # extract -> WET serialize -> parse)
    canon = docs.select(
        "doc_id",
        F.trim(
            F.regexp_replace(
                F.replace(
                    F.coalesce(F.col("text"), F.lit("")),
                    F.lit("\u00a0"),
                    F.lit(" "),
                ),
                r"\s+",
                " ",
            )
        ).alias("canon"),
    ).toPandas()
    j = out.merge(canon, on="doc_id")
    assert (
        j["wet_text"].str.encode("utf-8") == j["canon"].str.encode("utf-8")
    ).all()


def test_cdx_offsets_enable_random_access(spark):
    from pyspark.sql import functions as F

    from ai_ocr_spark.kernels.warc import parse_wet
    from ai_ocr_spark.operators.roundtrip import (
        WET_BUCKET,
        _wet_record_expr,
        warc_cdx_index,
    )
    from ai_ocr_spark.pipeline import extract_pages, pages_from_documents

    sf = "/root/testdata/sf0.001"
    cdx = warc_cdx_index(spark, sf).toPandas()
    # rebuild the physical streams exactly as the WET writer does
    out = extract_pages(
        pages_from_documents(spark, sf), run_id="cdxtest", num_partitions=8
    )
    doc_id = F.regexp_extract("url", r"doc/(\d+)$", 1).cast("long")
    rec = _wet_record_expr(F.col("url"), F.col("main_text"))
    rows = (
        out.select(
            F.floor(doc_id / WET_BUCKET).cast("long").alias("bucket"),
            doc_id.alias("doc_id"),
            rec.alias("rec"),
        )
        .toPandas()
        .sort_values(["bucket", "doc_id"])
    )
    streams = {
        b: "".join(g["rec"]).encode("utf-8")
        for b, g in rows.groupby("bucket")
    }
    assert len(cdx) == len(rows)
    # every (offset, rec_len) is a ranged read that parses to EXACTLY
    # its own record — the random-access property CDX exists for
    for r in cdx.itertuples():
        b = int(r.filename.split("-")[1].split(".")[0])
        sl = streams[b][r.offset : r.offset + r.rec_len]
        got = parse_wet(sl)
        assert len(got) == 1 and got[0]["url"] == r.url
    # offsets tile each stream exactly: sum of lengths = stream size
    by_file = cdx.groupby("filename")["rec_len"].sum()
    for fname, total in by_file.items():
        b = int(fname.split("-")[1].split(".")[0])
        assert total == len(streams[b])


def test_stream_quantiles_equals_batch_sketch(spark):
    """The streaming-state sketch must decode to the exact batch
    result — cross-batch histogram merge loses or double-counts
    nothing."""
    from ai_ocr_spark.operators.sketch import sketch_quantiles_logbin
    from ai_ocr_spark.streaming.windows import stream_quantiles_logbin

    sf = "/root/testdata/sf0.001"
    a = (
        stream_quantiles_logbin(spark, sf)
        .toPandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    b = (
        sketch_quantiles_logbin(spark, sf)
        .toPandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    assert a.equals(b[a.columns])
