"""Multimodal column plumbing tests: binary + metadata schema, Arrow-batched
decode stub, real binary features."""

import hashlib

import pytest
from pyspark.sql import functions as F

from chessmate_spark.operators.multimodal import (
    attach_fake_media,
    binary_features,
    byte_entropy,
    decode_image_features,
    frame_sample,
)


@pytest.fixture(scope="module")
def media(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, None), (4, "spark media pipeline")],
        "doc_id long, text string",
    )
    return attach_fake_media(df, "doc_id", "text")


def test_media_schema(media):
    assert dict(media.dtypes)["blob"] == "binary"
    meta_type = dict(media.dtypes)["meta"]
    assert "mime" in meta_type and "n_frames" in meta_type


def test_binary_features_real(media):
    rows = {r["media_id"]: r for r in binary_features(media).collect()}
    assert rows[1]["blob_len"] == len(b"hello world")
    assert rows[1]["blob_md5"] == hashlib.md5(b"hello world").hexdigest()
    assert rows[1]["magic_hex"] == b"hell".hex()
    assert rows[2]["blob_len"] == 0


def test_decode_stub_batch_shape(media):
    rows = {
        r["media_id"]: r
        for r in decode_image_features(media, codec="stub").collect()
    }
    assert len(rows) == 4
    r = rows[1]
    assert r["decoded"] is True
    assert r["width"] >= 16 and r["height"] >= 16
    assert 0.0 <= r["mean_r"] <= 1.0
    assert "stub" in r["decode_note"]
    # deterministic: same blob -> same fake stats
    digest = hashlib.md5(b"hello world").digest()
    assert r["width"] == digest[0] * 4 + 16


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def test_decode_auto_picks_available_codec(media):
    rows = decode_image_features(media, codec="auto").collect()
    notes = {r["decode_note"] for r in rows if r["decode_note"]}
    if _pil_available():
        # fake text blobs are not valid images: real codec flags them
        assert all(
            n.startswith(("decode failed", "null blob")) for n in notes
        )
    else:
        assert any("stub" in n for n in notes)


def test_decode_pil_without_pil_raises(spark, media):
    if _pil_available():
        pytest.skip("PIL installed; the missing-codec path can't trigger")
    with pytest.raises(Exception, match="PIL is not installed"):
        decode_image_features(media, codec="pil").collect()


def test_decode_pil_real_bitmap(spark):
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    img = PIL_Image.new("RGB", (8, 4), (255, 0, 0))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    df = spark.createDataFrame(
        [(1, bytearray(buf.getvalue())), (2, bytearray(b"not an image"))],
        "media_id long, blob binary",
    )
    rows = {
        r["media_id"]: r
        for r in decode_image_features(df, codec="pil").collect()
    }
    assert rows[1]["decoded"] is True
    assert (rows[1]["width"], rows[1]["height"]) == (8, 4)
    assert rows[1]["mean_r"] == pytest.approx(1.0)
    assert rows[1]["mean_g"] == pytest.approx(0.0)
    assert rows[1]["decode_note"] == "pil:PNG"
    assert rows[2]["decoded"] is False
    assert rows[2]["decode_note"].startswith("decode failed")


def test_decode_rejects_unknown_codec(media):
    with pytest.raises(ValueError, match="unknown codec"):
        decode_image_features(media, codec="jpeg2000")


def test_entropy(media):
    rows = {r["media_id"]: r for r in byte_entropy(media).collect()}
    assert rows[2]["entropy"] == 0.0
    assert rows[1]["entropy"] > 2.0  # natural text entropy


def test_frame_sample(media):
    frames = frame_sample(media, every_n=1).collect()
    # every fake media row has n_frames=1 -> exactly one frame each
    assert len(frames) == 4
    assert all(f["frame_index"] == 0 for f in frames)


def test_bmp_numpy_real_decode(spark):
    """No codec libs needed: a hand-encoded 24-bit BMP decodes for real."""
    import numpy as np

    from chessmate_spark.operators.multimodal import (
        decode_image_features,
        encode_bmp,
    )

    px = np.zeros((2, 3, 3), dtype=np.uint8)
    px[:, :, 0] = 255          # pure red image
    solid_red = encode_bmp(px)
    grad = np.arange(4 * 5 * 3, dtype=np.uint8).reshape(4, 5, 3)
    df = spark.createDataFrame(
        [(1, bytearray(solid_red)), (2, bytearray(encode_bmp(grad))),
         (3, bytearray(b"BMgarbage"))],
        "media_id long, blob binary",
    )
    rows = {r["media_id"]: r for r in
            decode_image_features(df, codec="auto").collect()}
    assert rows[1]["decoded"] and rows[1]["decode_note"] in ("bmp-numpy", "pil:BMP")
    assert (rows[1]["width"], rows[1]["height"]) == (3, 2)
    assert abs(rows[1]["mean_r"] - 1.0) < 1e-9
    assert rows[1]["mean_g"] == 0.0 and rows[1]["mean_b"] == 0.0
    assert rows[2]["decoded"] and (rows[2]["width"], rows[2]["height"]) == (5, 4)
    exp = grad.astype(float).mean(axis=(0, 1)) / 255.0
    assert abs(rows[2]["mean_r"] - exp[0]) < 1e-9
    assert abs(rows[2]["mean_g"] - exp[1]) < 1e-9
    assert abs(rows[2]["mean_b"] - exp[2]) < 1e-9
    # malformed BMP falls through to the stub, never a task failure
    assert rows[3]["decoded"] in (True, False)


def test_bmp_row_padding_roundtrip(spark):
    """Widths whose rows need 4-byte padding decode exactly."""
    import numpy as np

    from chessmate_spark.operators.multimodal import (
        _decode_image_bmp,
        encode_bmp,
    )

    for width in (1, 2, 3, 4, 5):
        px = ((np.arange(3 * width * 3) * 37) % 256).astype(np.uint8)
        px = px.reshape(3, width, 3)
        got = _decode_image_bmp(encode_bmp(px))
        assert (got["width"], got["height"]) == (width, 3)
        exp = px.astype(float).mean(axis=(0, 1)) / 255.0
        for key, val in zip(("mean_r", "mean_g", "mean_b"), exp):
            assert abs(got[key] - val) < 1e-9


def test_decode_pil_body_is_vectorized_and_correct():
    """Drive _decode_image_pil through a fake PIL module so the numpy
    channel-mean body runs even in this codec-less container (the real-PIL
    test above skips here)."""
    import numpy as np

    from chessmate_spark.operators.multimodal import _decode_image_pil

    arr = np.zeros((2, 3, 3), dtype=np.uint8)
    arr[..., 0] = 255          # pure red image
    arr[0, 0] = (0, 255, 0)    # one green pixel

    class FakeImg:
        format = "FAKE"
        size = (3, 2)

        def convert(self, mode):
            assert mode == "RGB"
            return self

        def __array__(self, dtype=None):
            return arr.astype(dtype) if dtype else arr

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

    class FakeMod:
        @staticmethod
        def open(fp):
            return FakeImg()

    out = _decode_image_pil(FakeMod, b"anything")
    assert out["decoded"] and (out["width"], out["height"]) == (3, 2)
    assert out["decode_note"] == "pil:FAKE"
    assert abs(out["mean_r"] - (5 * 255 / 6) / 255.0) < 1e-12
    assert abs(out["mean_g"] - (255 / 6) / 255.0) < 1e-12
    assert out["mean_b"] == 0.0


def test_byte_entropy_arrow_matches_pandas(spark):
    from chessmate_spark.operators.multimodal import (
        byte_entropy,
        byte_entropy_arrow,
    )

    rows = [
        (1, bytes(range(256)) * 3),       # uniform bytes -> entropy 8.0
        (2, b"aaaa"),                     # single symbol -> 0.0
        (3, b""),                         # empty -> 0.0
        (4, None),                        # null -> 0.0
        (5, b"abab" * 100),               # two symbols -> 1.0
    ]
    df = spark.createDataFrame(rows, "media_id long, blob binary")
    a = sorted(map(tuple, byte_entropy(df).collect()))
    b = sorted(map(tuple, byte_entropy_arrow(df).collect()))
    assert a == b
    vals = dict(a)
    assert vals[1] == 8.0 and vals[2] == 0.0 and vals[3] == 0.0
    assert vals[4] == 0.0 and vals[5] == 1.0


def test_resize_bmp_real_downsample(spark):
    import numpy as np

    from chessmate_spark.operators.multimodal import encode_bmp, resize_images
    from pyspark.sql import functions as F

    # 8x6 gradient image -> factor 2 -> 4x3, pixels = every other one
    px = np.arange(6 * 8 * 3, dtype=np.uint8).reshape(6, 8, 3)
    blob = encode_bmp(px)
    df = spark.createDataFrame(
        [(1, bytearray(blob), 8, 6)],
        "media_id long, blob binary, w int, h int",
    ).select(
        "media_id", "blob",
        F.struct(
            F.lit("image/bmp").alias("mime"),
            F.col("w").alias("width"), F.col("h").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(1).alias("n_frames"),
        ).alias("meta"),
    )
    row = resize_images(df, factor=2).collect()[0]
    assert row["resized"] and row["resize_note"] == "bmp-numpy"
    assert (row["out_width"], row["out_height"]) == (4, 3)
    # decode the output BMP and check the nearest-neighbor pixels
    from chessmate_spark.operators.multimodal import _decode_image_bmp

    meta = _decode_image_bmp(bytes(row["out_blob"]))
    assert (meta["width"], meta["height"]) == (4, 3)
    expect = px[::2, ::2].astype(np.float64)
    assert abs(meta["mean_r"] * 255.0 - expect[:, :, 0].mean()) < 1e-9
    assert abs(meta["mean_g"] * 255.0 - expect[:, :, 1].mean()) < 1e-9
    assert abs(meta["mean_b"] * 255.0 - expect[:, :, 2].mean()) < 1e-9


def test_resize_stub_dims_and_null(spark):
    from chessmate_spark.operators.multimodal import (
        attach_fake_media,
        resize_images,
    )

    docs = spark.createDataFrame(
        [(1, "hello world " * 10), (2, None)], "doc_id long, text string"
    )
    media = attach_fake_media(docs, "doc_id", "text")
    rows = {r["media_id"]: r for r in resize_images(media, factor=3).collect()}
    r1 = rows[1]
    assert r1["resized"] and r1["resize_note"].startswith("stub")
    # ceil(meta dims / 3)
    m = media.filter("media_id = 1").select("meta.width", "meta.height").first()
    assert r1["out_width"] == -(-m["width"] // 3)
    assert r1["out_height"] == -(-m["height"] // 3)
    assert len(r1["out_blob"]) >= 1
    # empty text -> blob of length 0 -> still resized=True with 1 byte? no:
    # doc 2 text None -> blob b"" (encode of '') -> keep=max(1, 0//9)=1 but
    # slice of empty is empty; contract: resized True, out_blob b""
    # doc 2: text None -> blob b"" and NULL meta dims; the byte resize
    # still happens, dims stay unknown
    r2 = rows[2]
    assert r2["resized"] is True and len(r2["out_blob"]) == 0
    assert r2["out_width"] is None and r2["out_height"] is None


def test_resize_topdown_bmp_not_mirrored(spark):
    """Top-down BMPs (negative stored height, rows already top-down) must
    resize without the vertical flip bottom-up storage needs."""
    import numpy as np

    from chessmate_spark.operators.multimodal import (
        _decode_image_bmp,
        _resize_bmp,
        encode_bmp,
    )

    px = np.arange(6 * 8 * 3, dtype=np.uint8).reshape(6, 8, 3)
    blob = bytearray(encode_bmp(px))
    # convert to top-down: negate height, reverse the row order in the body
    offset = int.from_bytes(blob[10:14], "little")
    row_bytes = (8 * 3 + 3) // 4 * 4
    blob[22:26] = (-6).to_bytes(4, "little", signed=True)
    body = bytes(blob[offset:])
    rows = [body[i * row_bytes:(i + 1) * row_bytes] for i in range(6)]
    blob[offset:] = b"".join(reversed(rows))
    td = bytes(blob)
    # sanity: the top-down blob decodes to the same means as the original
    a, b = _decode_image_bmp(bytes(encode_bmp(px))), _decode_image_bmp(td)
    assert abs(a["mean_r"] - b["mean_r"]) < 1e-12
    # resize both storage orders: identical downsampled pixels
    r_bu = _resize_bmp(bytes(encode_bmp(px)), 2)
    r_td = _resize_bmp(td, 2)
    m_bu = _decode_image_bmp(bytes(r_bu["out_blob"]))
    m_td = _decode_image_bmp(bytes(r_td["out_blob"]))
    for ch in ("mean_r", "mean_g", "mean_b"):
        assert abs(m_bu[ch] - m_td[ch]) < 1e-12, ch
