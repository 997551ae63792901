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
        # dir name is globally unique (uuid suffix) so two concurrent
        # appends never collide on the data path; the snapshot id is
        # assigned under the manifest lock at commit time
        snap_dir = f"snap-{run_id}-{uuid.uuid4().hex[:8]}"
        out_path = os.path.join(self.root, snap_dir)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(out_path)

        def commit(manifest: dict) -> dict:
            entry = {
                # max+1, NOT len: after a compaction shrinks the list,
                # len-based ids would collide with the compacted entry
                "id": max((s["id"] for s in manifest["snapshots"]), default=-1)
                + 1,
                "dir": snap_dir,
                "run_id": run_id,
                "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            }
            manifest["snapshots"].append(entry)
            return entry

        return self._with_manifest_lock(commit)

    def _with_manifest_lock(self, mutate):
        """Read-mutate-replace the manifest under an exclusive flock —
        concurrent appends serialize instead of losing the race (the
        Iceberg optimistic-commit equivalent for a local/posix fs; on an
        object store, swap for a conditional-put catalog)."""
        import fcntl

        os.makedirs(self.meta_dir, exist_ok=True)
        lock_path = os.path.join(self.meta_dir, "manifest.lock")
        with open(lock_path, "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            manifest = self._read_manifest()
            result = mutate(manifest)
            tmp = self.manifest_path + f".tmp-{uuid.uuid4().hex[:8]}"
            with open(tmp, "w") as f:
                json.dump(manifest, f, indent=1)
            os.replace(tmp, self.manifest_path)  # the commit point
        return result

    def remove_snapshot(self, snap_dir: str) -> None:
        """Roll back a committed snapshot (used for empty-append
        cleanup); data dir removed after the manifest no longer
        references it, so readers never see a dangling entry."""
        import shutil

        self._with_manifest_lock(
            lambda m: m["snapshots"].__setitem__(
                slice(None), [s for s in m["snapshots"] if s["dir"] != snap_dir]
            )
        )
        shutil.rmtree(os.path.join(self.root, snap_dir), ignore_errors=True)

    # -- maintenance ----------------------------------------------------------

    def compact(
        self,
        spark: SparkSession,
        run_id: str | None = None,
        expire_old: bool = False,
    ) -> dict:
        """Rewrite the committed snapshots into ONE (the small-files
        maintenance pass — Iceberg's rewrite_data_files + expire_snapshots
        in a single move). A 10^12-row table appended by thousands of
        incremental runs accumulates thousands of snapshot dirs; every
        read then unions thousands of parquet listings and the resume
        anti-join scans them all. Compaction reads the union once,
        writes a single snapshot, and swaps the manifest entries in one
        atomic commit.

        Crash/concurrency contract (same as append): data lands first,
        the manifest replace is the only commit point, so a reader
        OPENING the table sees either the full old snapshot list or the
        compacted one — never a gap. Snapshots committed by a
        concurrent append AFTER the compaction read are preserved: the
        commit removes exactly the entries it compacted, keeps
        everything newer. The compacted entry records the source
        run_ids under `compacted_from` so lineage survives.

        The old data dirs become unreferenced after the commit but are
        DELETED only with expire_old=True: a reader that captured the
        pre-compaction manifest may still be mid-scan over them
        (Iceberg splits this into rewrite_data_files + a later
        expire_snapshots behind a grace period for exactly that
        reason). Default keeps them as harmless orphans — the same
        state a crashed append leaves — for a later maintenance-window
        expiry."""
        import shutil

        sources = self.snapshots()
        if len(sources) <= 1:
            return {}
        df = spark.read.parquet(
            *[os.path.join(self.root, s["dir"]) for s in sources]
        )
        run_id = run_id or uuid.uuid4().hex[:12]
        snap_dir = f"snap-{run_id}-{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(os.path.join(self.root, snap_dir))
        compacted = {s["dir"] for s in sources}

        def commit(manifest: dict) -> dict:
            entry = {
                "id": max((s["id"] for s in manifest["snapshots"]), default=-1)
                + 1,
                "dir": snap_dir,
                "run_id": run_id,
                "committed_at": time.strftime(
                    "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
                ),
                "compacted_from": [s["run_id"] for s in sources],
            }
            manifest["snapshots"][:] = [entry] + [
                s for s in manifest["snapshots"] if s["dir"] not in compacted
            ]
            return entry

        entry = self._with_manifest_lock(commit)
        if expire_old:
            for d in compacted:
                shutil.rmtree(os.path.join(self.root, d), ignore_errors=True)
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
