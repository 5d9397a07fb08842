"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Pattern (SURVEY §7.2 step 10 / the training-data-pipeline extensions): media
travels as a ``binary`` column with a typed metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched ``mapInPandas``
stages so each executor processes whole record batches without per-row Python
overhead.

The image decode stage has THREE bodies behind one UDF signature/schema:
``codec="pil"`` decodes real bytes with PIL when the library is importable
(RGB convert, true dimensions + channel means; malformed bytes degrade to
``decoded=false`` rows, never task failures); without PIL, ``codec="auto"``
still REALLY decodes uncompressed 24-bit BMP with pure numpy
(``_decode_image_bmp`` — exercised by unit tests in this codec-less
container against hand-encoded bitmaps); and ``codec="stub"`` produces a
deterministic fake (dimensions + channel means derived from the blob's
md5).  The oracle entry pins ``codec="stub"`` — the deterministic output
the DuckDB oracle recomputes — while the real bodies are unit-tested
(BMP always, PIL wherever it exists).

Binary-level features (length, digest, magic bytes, byte entropy) are real
computations, not stubs.
"""

from __future__ import annotations

import hashlib
import math
from typing import Iterator

import numpy as np
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


def _pil_module():
    """PIL.Image when importable, else None — resolved per executor
    process, so a mixed cluster degrades per-task, not per-job."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def _decode_image_stub(blob: bytes) -> dict:
    """STUB decode: deterministic fake image stats from the blob digest
    (the ``codec='stub'`` body; same fields as the PIL body)."""
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


def _decode_image_bmp(blob: bytes) -> dict:
    """REAL decode for uncompressed 24-bit BMP, pure numpy — no codec
    library needed, so this container exercises a true decode path (PIL
    stays the general-format body where installed).  Unsupported variants
    raise ValueError; the caller falls through to the stub."""
    import numpy as np

    if blob is None or len(blob) < 54 or blob[:2] != b"BM":
        raise ValueError("not a BMP")
    offset = int.from_bytes(blob[10:14], "little")
    width = int.from_bytes(blob[18:22], "little", signed=True)
    height = int.from_bytes(blob[22:26], "little", signed=True)
    bpp = int.from_bytes(blob[28:30], "little")
    compression = int.from_bytes(blob[30:34], "little")
    if bpp != 24 or compression != 0 or width <= 0 or height == 0:
        raise ValueError("unsupported BMP variant")
    bottom_up = height > 0
    height = abs(height)
    row_bytes = (width * 3 + 3) // 4 * 4
    need = offset + row_bytes * height
    if len(blob) < need:
        raise ValueError("truncated BMP")
    rows = np.frombuffer(
        blob, dtype=np.uint8, count=row_bytes * height, offset=offset
    ).reshape(height, row_bytes)[:, : width * 3]
    px = rows.reshape(height, width, 3).astype(np.float64)
    if bottom_up:
        px = px[::-1]
    mean_b, mean_g, mean_r = px.mean(axis=(0, 1)) / 255.0  # BMP stores BGR
    return {
        "decoded": True,
        "width": width,
        "height": height,
        "mean_r": float(mean_r),
        "mean_g": float(mean_g),
        "mean_b": float(mean_b),
        "decode_note": "bmp-numpy",
    }


def encode_bmp(pixels) -> bytes:
    """Minimal 24-bit BMP encoder (tests/fixtures): ``pixels`` is an
    (h, w, 3) RGB uint8 array-like."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    height, width, _ = px.shape
    row_bytes = (width * 3 + 3) // 4 * 4
    # vectorized: flip vertically (bottom-up), swap RGB->BGR, pad each
    # row to the 4-byte boundary — no per-pixel Python
    rows = np.zeros((height, row_bytes), dtype=np.uint8)
    rows[:, : width * 3] = px[::-1, :, ::-1].reshape(height, width * 3)
    body = rows.tobytes()
    offset = 54
    size = offset + len(body)
    header = (
        b"BM"
        + size.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + offset.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + width.to_bytes(4, "little", signed=True)
        + height.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(body).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    return bytes(header) + bytes(body)


def _decode_image_pil(image_mod, blob: bytes) -> dict:
    """REAL decode: PIL open → RGB → dimensions + channel means.  Bad
    bytes become a ``decoded=false`` row (triage data), not a task error."""
    import io

    import numpy as np

    if blob is None:
        return {
            "decoded": False, "width": None, "height": None,
            "mean_r": None, "mean_g": None, "mean_b": None,
            "decode_note": "null blob",
        }
    try:
        with image_mod.open(io.BytesIO(blob)) as img:
            rgb = img.convert("RGB")
            width, height = rgb.size
            # one vectorized reduction over the (H*W, 3) pixel array —
            # never a per-pixel Python loop
            px = np.asarray(rgb, dtype=np.float64).reshape(-1, 3)
            means = (
                px.mean(axis=0) / 255.0 if px.size else np.zeros(3)
            )
            return {
                "decoded": True,
                "width": width,
                "height": height,
                "mean_r": float(means[0]),
                "mean_g": float(means[1]),
                "mean_b": float(means[2]),
                "decode_note": f"pil:{img.format or 'unknown'}",
            }
    except Exception as exc:
        return {
            "decoded": False, "width": None, "height": None,
            "mean_r": None, "mean_g": None, "mean_b": None,
            "decode_note": f"decode failed: {type(exc).__name__}",
        }


def decode_image_features(
    df: DataFrame,
    id_col: str = "media_id",
    blob_col: str = "blob",
    codec: str = "auto",
) -> DataFrame:
    """mapInPandas decode stage: Arrow batches in, feature rows out.

    ``codec``: ``"pil"`` (real decode; raises at runtime if PIL is
    missing), ``"stub"`` (deterministic md5-derived fake — the oracle
    body), or ``"auto"`` (PIL when importable, else stub).
    """
    if codec not in ("auto", "pil", "stub"):
        raise ValueError(f"unknown codec {codec!r}")

    def batches(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        image_mod = _pil_module() if codec in ("auto", "pil") else None
        if codec == "pil" and image_mod is None:
            raise ImportError("codec='pil' requested but PIL is not installed")

        def decode(blob):
            if image_mod is not None:
                return _decode_image_pil(image_mod, blob)
            if codec in ("auto",) and blob is not None and blob[:2] == b"BM":
                # no PIL, but uncompressed BMP decodes with numpy alone
                try:
                    return _decode_image_bmp(blob)
                except ValueError:
                    pass
            return _decode_image_stub(blob)

        for pdf in iterator:
            out = []
            for media_id, blob in zip(pdf[id_col], pdf[blob_col]):
                row = {"media_id": int(media_id)}
                row.update(decode(bytes(blob) if blob is not None else None))
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
                out.append(
                    {
                        "media_id": int(media_id),
                        "entropy": _blob_entropy(blob),
                    }
                )
            yield pd.DataFrame(out, columns=["media_id", "entropy"])

    return df.select(id_col, blob_col).mapInPandas(batches, "media_id long, entropy double")


def _blob_entropy(blob) -> float:
    """Shannon entropy of one blob: np.bincount over the byte view (no
    per-byte Python loop), floor-form rounding (portable_round semantics
    — identical on the DuckDB oracle side, unlike round-half-even)."""
    if blob is None or len(blob) == 0:
        return 0.0
    # np.frombuffer accepts anything with the buffer protocol (bytes,
    # memoryview, pyarrow Buffer) — no bytes() copy
    counts = np.bincount(np.frombuffer(blob, dtype=np.uint8), minlength=1)
    counts = counts[counts > 0]
    p = counts / counts.sum()
    ent = float(-(p * np.log2(p)).sum())
    return math.floor(ent * 1e6 + 0.5) / 1e6


def byte_entropy_arrow(
    df: DataFrame, id_col: str = "media_id", blob_col: str = "blob"
) -> DataFrame:
    """mapInArrow twin of ``byte_entropy``: consumes pyarrow
    RecordBatches directly — no Arrow→pandas materialization of the blob
    column, which matters when blobs are MBs (the pandas conversion
    copies every blob into a Python object per row; the Arrow buffer
    view does not).  Output is bit-identical to the pandas form (same
    numpy histogram + floor rounding), pinned by the shared m3 oracle."""
    import pyarrow as pa

    def batches(iterator):
        for batch in iterator:
            ids = batch.column(0)
            blobs = batch.column(1)
            # is_valid tests null WITHOUT materializing the blob (as_py()
            # would copy every multi-MB blob into Python bytes — the exact
            # copy this mapInArrow variant exists to avoid); as_buffer()
            # is a zero-copy view into the Arrow batch
            ents = [
                _blob_entropy(blobs[i].as_buffer() if blobs[i].is_valid else None)
                for i in range(batch.num_rows)
            ]
            yield pa.RecordBatch.from_arrays(
                [ids.cast(pa.int64()), pa.array(ents, pa.float64())],
                ["media_id", "entropy"],
            )

    return df.select(id_col, blob_col).mapInArrow(
        batches, "media_id long, entropy double"
    )


def frame_sample(df: DataFrame, every_n: int, id_col: str = "media_id") -> DataFrame:
    """Video frame-sampling plan: one row per sampled frame index.  The frame
    decode itself would be a mapInPandas stage like the image path."""
    n_frames = F.coalesce(F.col("meta.n_frames"), F.lit(0))
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
    return df.select(
        F.col(id_col), F.explode(idx).alias("frame_index")
    ).filter(F.col("frame_index") < n_frames)


def waveform_resample(
    df: DataFrame,
    id_col: str,
    samples_col: str,
    src_len: int,
    dst_len: int,
    value_alias: str = "value",
) -> DataFrame:
    """Linear-interpolation resampling of fixed-rate 1-D signal arrays
    (audio waveforms) from ``src_len`` to ``dst_len`` samples — the
    rate-normalization step an audio pipeline runs before feature
    extraction, as pure JVM expressions: one output row per target
    sample, position mapped back to the source grid, neighboring
    samples blended by the fractional offset.

    Embarrassingly parallel (no shuffle); double arithmetic evaluates
    left-to-right so results are bit-identical to any engine computing
    the same formula."""
    pos = F.col("_i").cast("double") * float(src_len - 1) / float(dst_len - 1)
    lo = F.floor(pos).cast("int")
    frac = pos - F.floor(pos)
    a = F.element_at(F.col(samples_col), lo + 1).cast("double")
    b = F.element_at(
        F.col(samples_col), F.least(lo + F.lit(2), F.lit(src_len))
    ).cast("double")
    val = a * (F.lit(1.0) - frac) + b * frac
    return df.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.lit(dst_len - 1))).alias("_i"),
        F.col(samples_col),
    ).select(
        F.col(id_col),
        F.col("_i").cast("bigint").alias("sample_idx"),
        val.alias(value_alias),
    )


IMAGE_RESIZE_SCHEMA = (
    "media_id long, resized boolean, out_width int, out_height int,"
    " out_blob binary, resize_note string"
)


def _resize_bmp(blob, factor: int) -> dict:
    """REAL resize for the numpy-BMP tier: decode the 24-bit bitmap,
    nearest-neighbor downsample by integer ``factor`` (stride slicing —
    one numpy op, no per-pixel Python), re-encode BMP."""
    meta = _decode_image_bmp(blob)  # raises ValueError on non-BMP
    offset = int.from_bytes(blob[10:14], "little")
    width, height = meta["width"], meta["height"]
    # raw signed height decides row order: positive = bottom-up storage
    # (flip to top-down before sampling), negative = already top-down —
    # flipping unconditionally would vertically mirror top-down inputs
    bottom_up = int.from_bytes(blob[22:26], "little", signed=True) > 0
    row_bytes = (width * 3 + 3) // 4 * 4
    rows = np.frombuffer(
        blob, dtype=np.uint8, count=row_bytes * height, offset=offset
    ).reshape(height, row_bytes)[:, : width * 3]
    px_bgr = rows.reshape(height, width, 3)
    if bottom_up:
        px_bgr = px_bgr[::-1]
    small = px_bgr[::factor, ::factor]
    out = encode_bmp(small[:, :, ::-1])  # encode_bmp takes RGB
    return {
        "resized": True,
        "out_width": small.shape[1],
        "out_height": small.shape[0],
        "out_blob": out,
        "resize_note": "bmp-numpy",
    }


def _resize_stub(blob, meta_width, meta_height, factor: int) -> dict:
    """STUB resize (codec-less formats): deterministic output dimensions
    ceil(dim / factor) from the metadata struct, blob truncated to the
    proportional byte count — the shape/plumbing contract without a
    codec, same philosophy as _decode_image_stub."""
    if blob is None:
        return {
            "resized": False, "out_width": None, "out_height": None,
            "out_blob": None, "resize_note": "null blob",
        }
    # metadata may be missing (NULL width/height arrive as NaN through
    # pandas): the byte-level resize still happens, dims stay unknown
    have_dims = meta_width == meta_width and meta_height == meta_height
    w = -(-int(meta_width) // factor) if have_dims else None
    h = -(-int(meta_height) // factor) if have_dims else None
    keep = max(1, len(blob) // (factor * factor))
    return {
        "resized": True,
        "out_width": w,
        "out_height": h,
        "out_blob": bytes(blob[:keep]),
        "resize_note": "stub-resizer (no codec libs in container)",
    }


def resize_images(
    df: DataFrame,
    factor: int = 2,
    id_col: str = "media_id",
    blob_col: str = "blob",
    codec: str = "auto",
) -> DataFrame:
    """mapInPandas resize stage (the brief's image-resize op): integer
    downsample by ``factor``.  Tiers mirror decode_image_features:
    ``auto`` uses the real numpy-BMP path for BMP bytes and the
    deterministic stub otherwise (PIL tier would slot in the same way);
    ``stub`` forces the oracle body.  Requires the ``meta`` struct of
    attach_fake_media (width/height feed the stub's output dims)."""
    if factor < 1:
        raise ValueError(f"factor must be >= 1, got {factor}")
    if codec not in ("auto", "stub"):
        raise ValueError(f"unknown codec {codec!r}")

    def batches(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in iterator:
            out = []
            for media_id, blob, w, h in zip(
                pdf[id_col], pdf[blob_col], pdf["_mw"], pdf["_mh"]
            ):
                b = bytes(blob) if blob is not None else None
                row = {"media_id": int(media_id)}
                if codec == "auto" and b is not None and b[:2] == b"BM":
                    try:
                        row.update(_resize_bmp(b, factor))
                        out.append(row)
                        continue
                    except ValueError:
                        pass
                row.update(_resize_stub(b, w, h, factor))
                out.append(row)
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "resized", "out_width", "out_height",
                    "out_blob", "resize_note",
                ],
            )

    keyed = df.select(
        F.col(id_col),
        F.col(blob_col),
        F.col("meta.width").alias("_mw"),
        F.col("meta.height").alias("_mh"),
    )
    return keyed.mapInPandas(batches, IMAGE_RESIZE_SCHEMA)
