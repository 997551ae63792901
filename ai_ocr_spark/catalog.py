"""Snapshot-manifest table layout: Iceberg semantics, parquet-backed.

No Iceberg runtime jar ships in this sandbox (SURVEY.md §7.1), so this
module provides the same three guarantees the engine needs from Iceberg
with a plain-parquet layout:

  * atomic append  — data lands in ``snap-<n>-<run_id>/`` first; the
    snapshot becomes visible only when the manifest JSON is atomically
    replaced (os.replace). A crashed write leaves an orphan dir that no
    reader ever sees.
  * snapshot reads — readers union exactly the committed snapshot dirs.
  * idempotent resume — ``pending()`` anti-joins the input against
    committed urls (SURVEY.md §2.3 J5), so re-running a failed job
    processes only missing documents and never duplicates.

On a real cluster, swap SnapshotTable for ``df.writeTo(...).append()``
on an Iceberg catalog; the pipeline code is layout-agnostic.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    def __init__(self, root: str):
        self.root = root
        self.meta_dir = os.path.join(root, "_snapshots")
        self.manifest_path = os.path.join(self.meta_dir, "manifest.json")

    # -- manifest ------------------------------------------------------------

    def _read_manifest(self) -> dict:
        try:
            with open(self.manifest_path) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return {"snapshots": []}

    def snapshots(self) -> list[dict]:
        return self._read_manifest()["snapshots"]

    def committed_dirs(self) -> list[str]:
        return [os.path.join(self.root, s["dir"]) for s in self.snapshots()]

    # -- read ------------------------------------------------------------------

    def read(self, spark: SparkSession) -> DataFrame | None:
        dirs = self.committed_dirs()
        if not dirs:
            return None
        return spark.read.parquet(*dirs)

    # -- write ------------------------------------------------------------------

    def append(
        self,
        df: DataFrame,
        run_id: str | None = None,
        partition_by: list[str] | None = None,
    ) -> dict:
        """Write df as a new snapshot; commit = atomic manifest replace.

        partition_by (e.g. a derived ds=days(warc_ts) column) gives the
        plain-parquet layout Iceberg-style partition pruning: readers
        filtering on the partition column scan only matching
        directories. At 10^12 rows this is what keeps time-range
        queries off the full table."""
        run_id = run_id or uuid.uuid4().hex[:12]
        manifest = self._read_manifest()
        n = len(manifest["snapshots"])
        snap_dir = f"snap-{n:05d}-{run_id}"
        out_path = os.path.join(self.root, snap_dir)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(out_path)
        entry = {
            "id": n,
            "dir": snap_dir,
            "run_id": run_id,
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        manifest["snapshots"].append(entry)
        os.makedirs(self.meta_dir, exist_ok=True)
        tmp = self.manifest_path + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self.manifest_path)  # the commit point
        return entry

    # -- resume -------------------------------------------------------------------

    def pending(self, spark: SparkSession, input_df: DataFrame, key: str = "url") -> DataFrame:
        """Input rows not yet in any committed snapshot (anti-join J5).

        At 10^12-row scale the committed side is large: Spark plans this
        as a shuffled sort-merge anti-join; a Bloom-filter pre-pass comes
        free via spark.sql.optimizer.runtime.bloomFilter (AQE) when the
        committed side fits its thresholds.
        """
        done = self.read(spark)
        if done is None:
            return input_df
        return input_df.join(done.select(key).distinct(), key, "left_anti")
