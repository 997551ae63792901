"""Pure per-document kernels (no Spark imports allowed in this package).

These run inside Arrow-batched pandas UDF / mapInPandas stages; they must
stay importable without a SparkSession so Tier-1 tests (SURVEY.md §5) can
exercise them directly.
"""
