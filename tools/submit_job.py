"""spark-submit entry point for the extraction job (north_rule invocation
path: `spark-submit --py-files dist/ai_ocr_spark.zip tools/submit_job.py
<pages_parquet> <out_root>`).

Build the zip with: python tools/build_dist.py
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession


def main() -> int:
    pages_path, out_root = sys.argv[1], sys.argv[2]
    run_id = sys.argv[3] if len(sys.argv) > 3 else None
    spark = SparkSession.builder.appName("ai_ocr_spark_extract").getOrCreate()
    # imported AFTER the session exists so --py-files distribution works
    from ai_ocr_spark.pipeline import run_extraction_job

    entry = run_extraction_job(spark, pages_path, out_root, run_id=run_id)
    if entry:
        print(f"committed snapshot {entry['dir']} (run_id={entry['run_id']})")
    else:
        print("nothing pending — output already complete")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
