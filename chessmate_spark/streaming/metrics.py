"""A8 worker running rates + S8 collection bootstrap.

A8 (embedding_worker.ml:30-93): processed/failed counters, fen-char totals,
and wall-clock-derived jobs/min + chars/sec gauges, plus the textfile
exposition body the worker writes for Prometheus scraping.

S8 (repo_qdrant.ml:172-216; config.ml:95-97): ensure the vector collection
exists — create it with the vector config (size, distance) and payload
schema when missing, no-op when present.  Spark-native: the collection is
a parquet directory + a manifest carrying the vector/payload config.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- A8: worker metrics -----------------------------------------------------


@dataclass
class WorkerMetrics:
    """Driver-side counters for one worker loop (injectable clock)."""

    start_time: float
    processed: int = 0
    failed: int = 0
    fen_chars: float = 0.0

    def update(self, failed: bool, fen_length: float) -> None:
        self.processed += 1
        if failed:
            self.failed += 1
        self.fen_chars += fen_length

    def snapshot(self, now: Optional[float] = None):
        """(processed, failed, jobs_per_min, chars_per_sec) — elapsed is
        floored at 1 ms exactly like the reference."""
        if now is None:
            now = time.time()
        elapsed = max(0.001, now - self.start_time)
        jobs_per_min = self.processed / (elapsed / 60.0)
        chars_per_sec = self.fen_chars / elapsed
        return self.processed, self.failed, jobs_per_min, chars_per_sec

    def exposition(self, now: Optional[float] = None) -> str:
        """The textfile body the reference worker writes."""
        processed, failed, jobs_per_min, chars_per_sec = self.snapshot(now)
        return (
            f"embedding_jobs_processed_total {processed}\n"
            f"embedding_jobs_failed_total {failed}\n"
            f"embedding_worker_jobs_per_min {jobs_per_min:.6f}\n"
            f"embedding_worker_characters_per_sec {chars_per_sec:.6f}\n"
        )


def worker_rates_frame(
    spark: SparkSession, metrics: WorkerMetrics, now: Optional[float] = None
) -> DataFrame:
    """The A8 gauges as a one-row DataFrame (observability join surface)."""
    processed, failed, jobs_per_min, chars_per_sec = metrics.snapshot(now)
    return spark.createDataFrame(
        [(processed, failed, float(jobs_per_min), float(chars_per_sec))],
        "processed long, failed long, jobs_per_min double, chars_per_sec double",
    )


# --- S8: collection bootstrap ----------------------------------------------

VECTOR_SIZE_DEFAULT = 1536  # config.ml:95-97 (text-embedding-3-small)
DISTANCE_DEFAULT = "Cosine"

COLLECTION_MANIFEST = "_collection.json"

# payload schema mirrored from the reference's ensure payload
PAYLOAD_FIELDS = [
    ("game_id", "integer"),
    ("fen", "keyword"),
    ("white", "keyword"),
    ("black", "keyword"),
    ("opening_slug", "keyword"),
]


def collection_schema(dim: int) -> T.StructType:
    return T.StructType(
        [
            T.StructField("vector_id", T.StringType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
            T.StructField("game_id", T.LongType()),
            T.StructField("fen", T.StringType()),
            T.StructField("white", T.StringType()),
            T.StructField("black", T.StringType()),
            T.StructField("opening_slug", T.StringType()),
        ]
    )


def ensure_collection(
    spark: SparkSession,
    root: str,
    name: str,
    vector_size: int = VECTOR_SIZE_DEFAULT,
    distance: str = DISTANCE_DEFAULT,
) -> dict:
    """Create-if-not-exists.  Returns the collection manifest; ``created``
    tells whether this call made it.  Existing collections are validated
    against the requested vector config (mismatch = hard error, exactly
    what a silently-wrong distance metric deserves)."""
    location = os.path.join(root, name)
    manifest_path = os.path.join(location, COLLECTION_MANIFEST)
    if os.path.isfile(manifest_path):
        with open(manifest_path) as fh:
            manifest = json.load(fh)
        if (
            manifest["vectors"]["size"] != vector_size
            or manifest["vectors"]["distance"] != distance
        ):
            raise ValueError(
                f"collection {name} exists with vector config "
                f"{manifest['vectors']} != requested "
                f"{{'size': {vector_size}, 'distance': '{distance}'}}"
            )
        manifest["created"] = False
        return manifest
    empty = spark.createDataFrame([], collection_schema(vector_size))
    empty.write.mode("errorifexists").parquet(location)
    manifest = {
        "name": name,
        "location": location,
        "vectors": {"size": vector_size, "distance": distance},
        "payload_schema": {f: {"type": t} for f, t in PAYLOAD_FIELDS},
    }
    with open(manifest_path, "w") as fh:
        json.dump(manifest, fh)
    manifest["created"] = True
    return manifest
