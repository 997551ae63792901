"""Shared plumbing for oracle-checkable streaming drains.

Two patterns used by the windowed and stateful oracle surfaces:

  write_ordered_file  one single-file parquet with a pinned name and
                      mtime — the file stream source orders batches by
                      modification time, so arrival order (and with it
                      the watermark sequence) becomes deterministic
  drain_available_now Trigger.AvailableNow into a memory sink, block
                      until drained, return the sink table name
  detach              copy a (bounded, already-aggregated) result out
                      of a memory-sink temp view so the view can be
                      dropped without invalidating the result
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def write_ordered_file(df: DataFrame, dst: str, mtime: int) -> None:
    """Write df as exactly one parquet file at dst with the given
    mtime. Goes through a temp directory because Spark writers only
    produce directories of part files."""
    tmp = dst + ".tmpdir"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(
        p for p in os.listdir(tmp)
        if p.endswith(".parquet") and not p.startswith("_")
    )
    shutil.move(os.path.join(tmp, part), dst)
    shutil.rmtree(tmp)
    os.utime(dst, (mtime, mtime))


def drain_available_now(
    df: DataFrame,
    output_mode: str,
    checkpoint_dir: str | None = None,
    prefix: str = "drain",
) -> str:
    """Drain a streaming DataFrame into a memory sink and return the
    sink's temp-view name (caller reads spark.table(name), then drops
    the view — see detach)."""
    name = f"{prefix}_{uuid.uuid4().hex[:8]}"
    w = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
    )
    if checkpoint_dir is not None:
        w = w.option("checkpointLocation", checkpoint_dir)
    w.start().awaitTermination()
    return name


def detach(spark: SparkSession, df: DataFrame, view_name: str) -> DataFrame:
    """Materialize df (bounded memory-sink output) into a standalone
    local-relation DataFrame and drop the backing temp view — without
    this, every drain leaks a full aggregate copy in the driver catalog
    for the session's lifetime."""
    result = spark.createDataFrame(df.collect(), df.schema)
    spark.catalog.dropTempView(view_name)
    return result
