"""Operator inventory (SURVEY.md §2) as (spark, sf_dir) -> DataFrame
callables, plus the training-data operators (dedup, similarity, text
analysis, multimodal) the engine adds for 100 TB pipelines.

Every callable here is paired with an ANSI-SQL oracle in
``__spark_entry__.oracle_sql`` unless its semantics are not
SQL-expressible (noted per function).
"""
