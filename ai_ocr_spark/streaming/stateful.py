"""Custom stateful streaming operator: per-domain running extraction
counters via applyInPandasWithState.

The reference keeps job progress as mutable Postgres rows updated
mid-flight (db_client.py:142-201); the streaming-native equivalent is a
keyed state store: one state row per domain, updated per micro-batch,
emitted in Update mode. This is the pattern for any custom stateful
operator the engine needs (session windows, per-key rate limits,
incremental counters) — GroupState holds a small tuple per key, the
per-batch data arrives as pandas DataFrames (Arrow), and eviction is
explicit via timeouts when keys are unbounded.

State is (n_pages, n_bytes) per domain — O(domains) not O(pages), so it
holds at 10^12 pages / 10^8 domains.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:
    import pandas as pd

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_pages", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("domain", T.StringType()),
        T.StructField("n_pages", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def _update_domain_counts(
    key: tuple[Any, ...],
    pdfs: Iterator["pd.DataFrame"],
    state: GroupState,
) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    n_pages, n_bytes = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n_pages += len(pdf)
        n_bytes += int(pdf["n_bytes"].sum())
    state.update((n_pages, n_bytes))
    yield pd.DataFrame(
        {"domain": [key[0]], "n_pages": [n_pages], "n_bytes": [n_bytes]}
    )


def stream_stateful_domain_counts(spark, sf_dir: str) -> DataFrame:
    """Oracle surface for the applyInPandasWithState operator (the last
    §2.10 pytest-only row): pages synthesized from documents are split
    into two mtime-ordered files, domain_running_counts drains them
    with Trigger.AvailableNow in Update mode, and the FINAL state per
    domain (counters are monotonic, so max() over the update stream)
    must equal a batch recount — which the DuckDB twin reconstructs
    byte-exactly: n_bytes is the UTF-8 octet length of the page chrome
    plus the entity-escaped document text, rebuilt in SQL from the
    shared chrome-length constant."""
    import os
    import shutil
    import tempfile

    from ..pipeline import pages_from_documents
    from .util import detach, drain_available_now, write_ordered_file

    stage = tempfile.mkdtemp(prefix="stateful_oracle_")
    try:
        pages = pages_from_documents(spark, sf_dir)
        os.makedirs(os.path.join(stage, "in"))
        now = 1_700_000_000
        for k, digits in enumerate(("02468", "13579")):
            write_ordered_file(
                pages.filter(F.col("url").rlike(f"/doc/\\d*[{digits}]$")),
                os.path.join(stage, "in", f"b{k}.parquet"),
                now + 100 * k,
            )
        schema = spark.read.parquet(os.path.join(stage, "in")).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(stage, "in"))
        )
        name = drain_available_now(
            domain_running_counts(stream),
            "update",
            os.path.join(stage, "ckpt"),
            prefix="stateful",
        )
        out = (
            spark.table(name)
            .groupBy("domain")
            .agg(
                F.max("n_pages").alias("n_pages"),
                F.max("n_bytes").alias("n_bytes"),
            )
        )
        return detach(spark, out, name)
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def _chrome_overhead_bytes() -> int:
    from ..pipeline import _CHROME_FOOT, _DOC_CHROME_HEAD

    return len((_DOC_CHROME_HEAD + "<article><p>").encode()) + len(
        ("</p></article>" + _CHROME_FOOT).encode()
    )


def stateful_oracle_sql() -> str:
    """DuckDB twin: final per-domain totals over ALL documents; n_bytes
    rebuilt as chrome overhead + octet length of the entity-escaped
    text (the same three replaces as pipeline.html_escape_col, & first
    so later entities aren't double-escaped)."""
    return f"""
        SELECT source || '.example.com' AS domain,
               count(*) AS n_pages,
               CAST(sum(
                   {_chrome_overhead_bytes()}
                   + octet_length(encode(
                       replace(replace(replace(coalesce(text, ''),
                           '&', '&amp;'), '<', '&lt;'), '>', '&gt;')))
               ) AS BIGINT) AS n_bytes
        FROM documents
        GROUP BY source
    """


def domain_running_counts(pages_stream: DataFrame) -> DataFrame:
    """Streaming pages -> running (n_pages, n_bytes) per domain.

    The shuffle key is the domain — Zipf-skewed, but the state update is
    O(batch rows) per key and the emitted row is O(1), so a hot domain
    costs bandwidth, not state size."""
    domains = pages_stream.select(
        F.regexp_extract(F.col("url"), r"^[a-z]+://([^/]+)", 1).alias("domain"),
        F.length(F.col("html")).cast("long").alias("n_bytes"),
    )
    return domains.groupBy("domain").applyInPandasWithState(
        _update_domain_counts,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="Update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
