"""S9: collection snapshot create / list / restore.

Reference: repo_qdrant.ml:262-343 — Qdrant snapshot endpoints returning
{name, location, created_at, size_bytes}, a listing, and a restore-from-
location.  Spark-native equivalent: a snapshot is an immutable parquet
copy of the collection DataFrame under ``<root>/<collection>/<name>`` plus
a tiny manifest; restore is a parquet read of that location.

Scale: create IS a distributed write (every executor copies its
partitions); list/restore touch only the manifest and footer metadata.
On a lakehouse the same surface maps onto Delta/Iceberg time travel — this
implementation keeps the contract with plain parquet so it runs anywhere.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_snapshot_manifest.json"


@dataclass
class SnapshotInfo:
    name: str
    location: str
    created_at: str
    size_bytes: int


JOURNAL = "_snapshot_journal.jsonl"


class SnapshotManager:
    """Filesystem-rooted snapshot registry for one or more collections.

    Besides the per-snapshot manifest, an append-only JSONL journal
    records every create with a timestamp and optional operator note
    (collection_command.ml's metadata journaling for audit/discovery)."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root.rstrip("/")

    def _collection_dir(self, collection: str) -> str:
        return f"{self.root}/{collection}"

    def create(
        self,
        df: DataFrame,
        collection: str,
        snapshot_name: Optional[str] = None,
        note: Optional[str] = None,
    ) -> SnapshotInfo:
        """Write an immutable copy; auto-names ``<collection>-snap-<n>``
        like the reference's server-generated names.  Refuses to overwrite
        (snapshots are immutable).  ``note`` lands in the audit journal."""
        if snapshot_name is None:
            existing = self.list(collection)
            snapshot_name = f"{collection}-snap-{len(existing) + 1:04d}"
        location = f"{self._collection_dir(collection)}/{snapshot_name}"
        if os.path.exists(location):
            raise FileExistsError(f"snapshot already exists: {location}")
        df.write.mode("error").parquet(location)
        size_bytes = sum(
            os.path.getsize(os.path.join(dirpath, f))
            for dirpath, _dirs, files in os.walk(location)
            for f in files
        )
        info = SnapshotInfo(
            name=snapshot_name,
            location=location,
            created_at=time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            size_bytes=size_bytes,
        )
        with open(os.path.join(location, MANIFEST), "w") as fh:
            json.dump(asdict(info), fh)
        record = dict(asdict(info), recorded_at=info.created_at)
        if note is not None and note.strip():
            record["note"] = note
        os.makedirs(self._collection_dir(collection), exist_ok=True)
        with open(
            os.path.join(self._collection_dir(collection), JOURNAL), "a"
        ) as fh:
            fh.write(json.dumps(record) + "\n")
        return info

    def read_journal(self, collection: str) -> List[dict]:
        """The append-only audit records, oldest first (blank lines
        tolerated, as in the reference's reader)."""
        path = os.path.join(self._collection_dir(collection), JOURNAL)
        if not os.path.isfile(path):
            return []
        out: List[dict] = []
        with open(path) as fh:
            for line in fh:
                if line.strip():
                    out.append(json.loads(line))
        return out

    def list(self, collection: str) -> List[SnapshotInfo]:
        """All snapshots of a collection, oldest-first by name."""
        cdir = self._collection_dir(collection)
        if not os.path.isdir(cdir):
            return []
        out: List[SnapshotInfo] = []
        for name in sorted(os.listdir(cdir)):
            manifest = os.path.join(cdir, name, MANIFEST)
            if os.path.isfile(manifest):
                with open(manifest) as fh:
                    out.append(SnapshotInfo(**json.load(fh)))
        return out

    def restore(self, location: str) -> DataFrame:
        """Read the snapshot back as the collection's new content."""
        if not os.path.isdir(location):
            raise FileNotFoundError(f"snapshot location missing: {location}")
        return self.spark.read.parquet(location)
