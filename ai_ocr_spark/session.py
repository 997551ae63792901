"""SparkSession factory with engine defaults.

Tuned for the extraction workload (SURVEY.md §4): small Arrow batches
because rows carry multi-MB binary payloads; AQE on; shuffle partitions
sized for the local core count but overridable for cluster runs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ARROW_BATCH = 256  # rows per Arrow batch crossing the JVM<->Python boundary


def get_spark(
    app: str = "ai_ocr_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    b = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH))
        # payload tables carry multi-KB..MB binary rows: default 128 MB
        # scan splits under-parallelize them badly (a 370 MB file became
        # 3 scan tasks); 16 MB splits keep the decode stage wide. At
        # 100 TB the same setting bounds per-task memory for giant rows.
        .config("spark.sql.files.maxPartitionBytes", os.environ.get(
            "SPARK_GRAFT_MAX_PARTITION_BYTES", "16m"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
