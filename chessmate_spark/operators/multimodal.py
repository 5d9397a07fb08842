"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Pattern (SURVEY §7.2 step 10 / the training-data-pipeline extensions): media
travels as a ``binary`` column with a typed metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched ``mapInPandas``
stages so each executor processes whole record batches without per-row Python
overhead.

The actual image/audio decode is STUBBED — the container has no codec
libraries — behind ``_decode_image_stub``: if PIL/numpy codecs were present
the same UDF signature applies; the stub produces a deterministic fake
(dimensions + channel means derived from the blob's md5) so the Spark-side
plumbing (schema, partitioning, batch shape, null handling) is real and
tested end-to-end.

Binary-level features (length, digest, magic bytes, byte entropy) are real
computations, not stubs.
"""

from __future__ import annotations

import hashlib
import math
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "mime string, width int, height int, duration_ms int,"
    " sample_rate int, n_frames int"
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, decoded boolean, width int, height int,"
    " mean_r double, mean_g double, mean_b double, decode_note string"
)


def attach_fake_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic fake media rows for plumbing tests: the blob is the
    utf-8 text, metadata derived from its length."""
    blob = F.encode(F.coalesce(F.col(text_col), F.lit("")), "utf-8")
    meta = F.struct(
        F.lit("image/fake").alias("mime"),
        (F.length(F.col(text_col)) % 640 + 1).cast("int").alias("width"),
        (F.length(F.col(text_col)) % 480 + 1).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
        F.lit(None).cast("int").alias("sample_rate"),
        F.lit(1).cast("int").alias("n_frames"),
    )
    return df.select(
        F.col(id_col).alias("media_id"), blob.alias("blob"), meta.alias("meta")
    )


def binary_features(df: DataFrame, id_col: str = "media_id", blob_col: str = "blob") -> DataFrame:
    """Real binary-level features, all JVM-side: length, md5, magic bytes."""
    blob = F.col(blob_col)
    return df.select(
        F.col(id_col),
        F.length(blob).alias("blob_len"),
        F.md5(blob).alias("blob_md5"),
        F.lower(F.hex(F.substring(blob, 1, 4))).alias("magic_hex"),
    )


def _decode_image_stub(blob: bytes) -> dict:
    """STUB decode: deterministic fake image stats from the blob digest.

    Real deployment: replace the body with PIL.Image.open(BytesIO(blob)) and
    compute the same fields; the UDF signature and schema stay identical.
    """
    if blob is None:
        return {
            "decoded": False, "width": None, "height": None,
            "mean_r": None, "mean_g": None, "mean_b": None,
            "decode_note": "null blob",
        }
    digest = hashlib.md5(blob).digest()
    return {
        "decoded": True,
        "width": digest[0] * 4 + 16,
        "height": digest[1] * 4 + 16,
        "mean_r": digest[2] / 255.0,
        "mean_g": digest[3] / 255.0,
        "mean_b": digest[4] / 255.0,
        "decode_note": "stub-decoder (no codec libs in container)",
    }


def decode_image_features(df: DataFrame, id_col: str = "media_id", blob_col: str = "blob") -> DataFrame:
    """mapInPandas decode stage: Arrow batches in, feature rows out."""

    def batches(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in iterator:
            out = []
            for media_id, blob in zip(pdf[id_col], pdf[blob_col]):
                row = {"media_id": int(media_id)}
                row.update(_decode_image_stub(bytes(blob) if blob is not None else None))
                out.append(row)
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "decoded", "width", "height",
                    "mean_r", "mean_g", "mean_b", "decode_note",
                ],
            )

    return df.select(id_col, blob_col).mapInPandas(batches, IMAGE_FEATURES_SCHEMA)


def byte_entropy(df: DataFrame, id_col: str = "media_id", blob_col: str = "blob") -> DataFrame:
    """Shannon entropy of blob bytes — a real pandas-UDF computation used for
    corrupt/encrypted-media triage at scale."""

    def batches(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in iterator:
            out = []
            for media_id, blob in zip(pdf[id_col], pdf[blob_col]):
                if blob is None or len(blob) == 0:
                    out.append({"media_id": int(media_id), "entropy": 0.0})
                    continue
                data = bytes(blob)
                counts = [0] * 256
                for b in data:
                    counts[b] += 1
                n = len(data)
                ent = -sum(
                    (c / n) * math.log2(c / n) for c in counts if c
                )
                # floor-form rounding (portable_round): identical on the
                # DuckDB oracle side, unlike Python's round-half-even
                out.append({
                    "media_id": int(media_id),
                    "entropy": math.floor(ent * 1e6 + 0.5) / 1e6,
                })
            yield pd.DataFrame(out, columns=["media_id", "entropy"])

    return df.select(id_col, blob_col).mapInPandas(batches, "media_id long, entropy double")


def frame_sample(df: DataFrame, every_n: int, id_col: str = "media_id") -> DataFrame:
    """Video frame-sampling plan: one row per sampled frame index.  The frame
    decode itself would be a mapInPandas stage like the image path."""
    n_frames = F.coalesce(F.col("meta.n_frames"), F.lit(0))
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
    return df.select(
        F.col(id_col), F.explode(idx).alias("frame_index")
    ).filter(F.col("frame_index") < n_frames)
