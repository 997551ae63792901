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
