"""Tier-4: determinism, snapshot atomicity, idempotent resume (J5)."""

import json
import os

from pyspark.sql import functions as F

from ai_ocr_spark.catalog import SnapshotTable
from ai_ocr_spark.pipeline import extract_pages


def _hash_df(df):
    return (
        df.select(F.md5(F.concat_ws("\x1f", "url", "main_text", "doc_type")).alias("h"))
        .agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("long")).alias("s"))
        .collect()[0]["s"]
    )


def test_run_twice_identical(spark, pages_parquet):
    pages = spark.read.parquet(pages_parquet)
    h1 = _hash_df(extract_pages(pages, run_id="d1", num_partitions=4))
    h2 = _hash_df(extract_pages(pages, run_id="d2", num_partitions=7))
    assert h1 == h2  # partitioning must not change content


def test_snapshot_append_and_read(spark, pages_parquet, tmp_path):
    tbl = SnapshotTable(str(tmp_path / "extractions"))
    pages = spark.read.parquet(pages_parquet)
    out = extract_pages(pages.limit(40), run_id="s1")
    tbl.append(out, run_id="s1")
    back = tbl.read(spark)
    assert back.count() == 40
    assert len(tbl.snapshots()) == 1


def test_resume_processes_only_missing(spark, pages_parquet, tmp_path):
    tbl = SnapshotTable(str(tmp_path / "extractions"))
    pages = spark.read.parquet(pages_parquet)

    first = pages.filter(F.xxhash64("url") % 2 == 0)
    tbl.append(extract_pages(first, run_id="r1"), run_id="r1")
    n_first = tbl.read(spark).count()

    pending = tbl.pending(spark, pages)
    assert pending.count() == 240 - n_first
    tbl.append(extract_pages(pending, run_id="r2"), run_id="r2")

    done = tbl.read(spark)
    assert done.count() == 240  # no gaps
    assert done.select("url").distinct().count() == 240  # no duplicates

    # a third resume is a no-op
    assert tbl.pending(spark, pages).count() == 0


def test_uncommitted_snapshot_invisible(spark, pages_parquet, tmp_path):
    """A write that never reached the manifest (simulated crash) is not
    readable — the Iceberg atomicity guarantee."""
    root = str(tmp_path / "extractions")
    tbl = SnapshotTable(root)
    pages = spark.read.parquet(pages_parquet)
    tbl.append(extract_pages(pages.limit(10), run_id="ok"), run_id="ok")
    # orphan dir, as if the job died before commit
    extract_pages(pages.limit(30), run_id="crash").write.mode("overwrite").parquet(
        os.path.join(root, "snap-99999-crash")
    )
    assert tbl.read(spark).count() == 10
    # resume ignores the orphan too
    assert tbl.pending(spark, pages).count() == 230


def test_manifest_is_atomic_json(tmp_path, spark, pages_parquet):
    tbl = SnapshotTable(str(tmp_path / "t"))
    pages = spark.read.parquet(pages_parquet).limit(5)
    tbl.append(extract_pages(pages, run_id="a"), run_id="a")
    with open(tbl.manifest_path) as f:
        m = json.load(f)
    assert m["snapshots"][0]["run_id"] == "a"
    assert not [p for p in os.listdir(tbl.meta_dir) if ".tmp" in p]


def test_remove_snapshot_rolls_back(spark, pages_parquet, tmp_path):
    tbl = SnapshotTable(str(tmp_path / "rb"))
    pages = spark.read.parquet(pages_parquet)
    e1 = tbl.append(extract_pages(pages.limit(5), run_id="keep"), run_id="keep")
    e2 = tbl.append(extract_pages(pages.limit(9), run_id="drop"), run_id="drop")
    assert tbl.read(spark).count() == 14
    tbl.remove_snapshot(e2["dir"])
    assert [s["run_id"] for s in tbl.snapshots()] == ["keep"]
    assert tbl.read(spark).count() == 5
    assert not os.path.exists(os.path.join(tbl.root, e2["dir"]))


def test_concurrent_appends_both_commit(spark, pages_parquet, tmp_path):
    """Two threads appending to the same table must both end up in the
    manifest (flock-serialized commit, no lost update)."""
    import threading

    tbl = SnapshotTable(str(tmp_path / "cc"))
    pages = spark.read.parquet(pages_parquet)
    errs = []

    def do_append(run_id, n):
        try:
            tbl.append(extract_pages(pages.limit(n), run_id=run_id), run_id=run_id)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [
        threading.Thread(target=do_append, args=(f"t{k}", 3 + k)) for k in range(3)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    snaps = tbl.snapshots()
    assert sorted(s["run_id"] for s in snaps) == ["t0", "t1", "t2"]
    assert [s["id"] for s in snaps] == [0, 1, 2]
    assert tbl.read(spark).count() == 3 + 4 + 5


def test_cancel_run_leaves_no_committed_snapshot(spark, pages_parquet, tmp_path):
    """cancel_run(run_id) must abort an in-flight run (job-group cancel,
    reference cancel semantics src/processor/app/main.py:207-243) and —
    because the manifest commit happens only after a successful write —
    leave NO committed snapshot, so the next run starts clean."""
    import threading
    import time

    from ai_ocr_spark.pipeline import cancel_run, run_extraction_job

    # inflate the fixture so the run is reliably in flight when the
    # cancel lands (240 docs extract in well under a second at local[4])
    big = str(tmp_path / "bigpages")
    pages = spark.read.parquet(pages_parquet)
    pages.crossJoin(spark.range(60).select(F.col("id").alias("rep"))).select(
        F.concat_ws("/", "url", "rep").alias("url"), "warc_ts", "html", "text", "lang"
    ).write.parquet(big)

    out_root = str(tmp_path / "wh")
    run_id = "cancel-me"
    errs: list[Exception] = []

    def go():
        try:
            run_extraction_job(spark, big, out_root, run_id=run_id)
        except Exception as e:
            errs.append(e)

    t = threading.Thread(target=go)
    t.start()
    # wait until a job tagged with the run's group is actually running
    tracker = spark.sparkContext.statusTracker()
    deadline = time.time() + 60
    while time.time() < deadline and not tracker.getJobIdsForGroup(run_id):
        if not t.is_alive():
            break
        time.sleep(0.01)
    assert tracker.getJobIdsForGroup(run_id), "run finished before cancel"
    # re-issue until the run dies: cancelJobGroup only kills ACTIVE jobs,
    # and the first job the poll saw may be a short planning job
    deadline = time.time() + 120
    while t.is_alive() and time.time() < deadline:
        cancel_run(spark, run_id)
        t.join(timeout=0.05)
    t.join(timeout=120)
    assert not t.is_alive()
    assert errs, "cancel did not abort the run"
    assert SnapshotTable(f"{out_root}/extractions").snapshots() == []
    # the run's job group must not leak into the caller's thread state
    assert spark.sparkContext.getLocalProperty("spark.jobGroup.id") in (None, "")


def test_metrics_backfill_after_partial_commit(spark, pages_parquet, tmp_path):
    """Crash between the extractions append and the metrics append is
    healed by the next run (reconcile loop in run_extraction_job)."""
    from pyspark.sql import functions as F

    from ai_ocr_spark.pipeline import run_extraction_job

    out_root = str(tmp_path / "wh")
    ext_tbl = SnapshotTable(f"{out_root}/extractions")
    pages = spark.read.parquet(pages_parquet)
    # simulate the crash: extractions snapshot committed, metrics never written
    ext_tbl.append(
        extract_pages(pages.filter(F.xxhash64("url") % 2 == 0), run_id="crashed"),
        run_id="crashed",
    )
    assert SnapshotTable(f"{out_root}/metrics").read(spark) is None

    run_extraction_job(spark, pages_parquet, out_root, run_id="healer")
    met = SnapshotTable(f"{out_root}/metrics").read(spark)
    runs = {s["run_id"] for s in SnapshotTable(f"{out_root}/metrics").snapshots()}
    assert runs == {"crashed", "healer"}
    assert met.agg(F.sum("n_docs")).collect()[0][0] == 240


def test_compact_preserves_content_lineage_and_newer_snapshots(spark, tmp_path):
    from pyspark.sql import functions as F

    from ai_ocr_spark.catalog import SnapshotTable

    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
    )
    tbl = SnapshotTable(str(tmp_path / "t"))
    for k in range(4):
        tbl.append(docs.filter(F.col("doc_id") % 4 == k), run_id=f"inc-{k}")
    assert len(tbl.snapshots()) == 4

    entry = tbl.compact(spark, run_id="maint", expire_old=True)
    snaps = tbl.snapshots()
    assert len(snaps) == 1 and snaps[0]["dir"] == entry["dir"]
    # lineage of the rewritten snapshots survives
    assert entry["compacted_from"] == [f"inc-{k}" for k in range(4)]
    # content is identical: every row exactly once
    got = sorted(r["doc_id"] for r in tbl.read(spark).collect())
    assert got == list(range(100))
    # resume sees a fully-committed table
    assert tbl.pending(spark, docs).count() == 0
    # expire_old=True removed the rewritten dirs; a second compact is a no-op
    import os

    dirs = [
        d for d in os.listdir(tbl.root) if d.startswith("snap-")
    ]
    assert dirs == [entry["dir"]]
    assert tbl.compact(spark) == {}

    # an append AFTER compaction coexists with the compacted snapshot,
    # and snapshot ids stay unique (max+1, not len-based)
    tbl.append(
        spark.range(100, 110).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
        ),
        run_id="inc-late",
    )
    assert len(tbl.snapshots()) == 2
    assert tbl.read(spark).count() == 110
    ids = [s["id"] for s in tbl.snapshots()]
    assert len(ids) == len(set(ids))
    assert max(ids) > entry["id"]


def test_compact_default_keeps_old_dirs_for_inflight_readers(spark, tmp_path):
    from pyspark.sql import functions as F

    from ai_ocr_spark.catalog import SnapshotTable

    tbl = SnapshotTable(str(tmp_path / "t2"))
    for k in range(2):
        tbl.append(
            spark.range(10).select((F.col("id") + 100 * k).alias("doc_id")),
            run_id=f"inc-{k}",
        )
    old_dirs = [s["dir"] for s in tbl.snapshots()]
    # a reader captured the pre-compaction manifest
    import os

    pre_paths = [os.path.join(tbl.root, d) for d in old_dirs]
    tbl.compact(spark, run_id="maint")  # default: rewrite, do NOT expire
    # the old dirs still exist (unreferenced orphans), so the in-flight
    # reader's scan cannot hit FileNotFound
    assert all(os.path.isdir(p) for p in pre_paths)
    # but new readers see only the compacted snapshot
    assert [s["run_id"] for s in tbl.snapshots()] == ["maint"]
    assert tbl.read(spark).count() == 20
