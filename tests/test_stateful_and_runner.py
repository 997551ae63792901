"""End-to-end job runner + stateful streaming operator."""

import os

import pytest
from pyspark.sql import functions as F


def test_run_extraction_job_end_to_end_and_resume(spark, pages_parquet, tmp_path):
    from ai_ocr_spark.catalog import SnapshotTable
    from ai_ocr_spark.pipeline import run_extraction_job

    out_root = str(tmp_path / "warehouse")
    e1 = run_extraction_job(spark, pages_parquet, out_root, run_id="j1")
    assert e1["run_id"] == "j1"

    ext = SnapshotTable(f"{out_root}/extractions").read(spark)
    met = SnapshotTable(f"{out_root}/metrics").read(spark)
    assert ext.count() == 240
    m = met.agg(F.sum("n_docs").alias("n"), F.sum("n_err").alias("e")).collect()[0]
    assert m["n"] == 240
    # metrics partition counters reconcile with row-level lineage
    assert met.count() == ext.select("partition_id").distinct().count()

    # second run: everything committed -> no-op, no new snapshot
    assert run_extraction_job(spark, pages_parquet, out_root, run_id="j2") == {}
    assert len(SnapshotTable(f"{out_root}/extractions").snapshots()) == 1


def test_stateful_domain_counts_accumulate_across_batches(spark, tmp_path):
    """maxFilesPerTrigger=1 forces two micro-batches; GroupState must
    carry domain counters across them."""
    from ai_ocr_spark.datagen import write_pages_parquet
    from ai_ocr_spark.streaming.ingest import read_pages_stream
    from ai_ocr_spark.streaming.stateful import domain_running_counts

    src = tmp_path / "src"
    src.mkdir()
    write_pages_parquet(str(src / "a.parquet"), 30)
    write_pages_parquet(str(src / "b.parquet"), 30)  # same seed -> same urls

    stream = read_pages_stream(spark, str(src), max_files_per_trigger=1)
    counts = domain_running_counts(stream)
    q = (
        counts.writeStream.format("memory")
        .queryName("domain_counts")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # last update per domain must equal 2x the per-file count (two
    # identical batches accumulated in state)
    pdf = spark.sql("SELECT * FROM domain_counts").toPandas()
    final = pdf.groupby("domain").last()
    per_file = (
        spark.read.parquet(str(src / "a.parquet"))
        .select(F.regexp_extract("url", r"^[a-z]+://([^/]+)", 1).alias("d"))
        .groupBy("d")
        .count()
        .toPandas()
        .set_index("d")["count"]
    )
    for domain, row in final.iterrows():
        assert row["n_pages"] == 2 * per_file[domain]
    assert final["n_pages"].sum() == 60


def test_partitioned_snapshot_prunes_partitions(spark, pages_parquet, tmp_path):
    """Iceberg-style hidden partitioning on the parquet layout: filtering
    on the partition column must prune to matching directories
    (PartitionFilters in the scan, not a full-table read)."""
    from ai_ocr_spark.catalog import SnapshotTable
    from ai_ocr_spark.pipeline import extract_pages
    from ai_ocr_spark.plans.audit import formatted_plan

    tbl = SnapshotTable(str(tmp_path / "p"))
    pages = spark.read.parquet(pages_parquet)
    out = extract_pages(pages, run_id="p1").withColumn(
        "ds", F.date_format("warc_ts", "yyyy-MM-dd-HH")
    )
    tbl.append(out, run_id="p1", partition_by=["ds"])

    snap = f"{tbl.root}/{tbl.snapshots()[0]['dir']}"
    days = sorted(d.split("=")[1] for d in os.listdir(snap) if d.startswith("ds="))
    assert len(days) > 1  # datagen spreads warc_ts across hours

    q = spark.read.parquet(snap).filter(F.col("ds") == days[0]).select("url")
    plan = formatted_plan(q)
    assert "PartitionFilters" in plan and "ds" in plan
    # count only rows of that day — must match a full-scan recount
    # (project ds only: converting the deeply nested tables column
    # through Arrow->pandas has shown session-state-dependent crashes)
    full = spark.read.parquet(snap).select("ds").toPandas()
    assert q.count() == (full["ds"] == days[0]).sum()
