"""Real (non-fake) media decode path: vendored PPM/BMP parsers.

The container has no Pillow, so before r3 only the deterministic fake
path had ever executed. These tests run the REAL branch end-to-end —
CRYO_SPARK_FAKE_MEDIA unset — over payloads in the two uncompressed
formats the vendored parser covers (r2 verdict item 4).
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from cryo_spark import multimodal
from cryo_spark.multimodal import _parse_bmp, _parse_ppm


def ppm_bytes(img: np.ndarray, comment: bool = False) -> bytes:
    h, w, _ = img.shape
    head = b"P6\n"
    if comment:
        head += b"# a comment line\n"
    head += b"%d %d\n255\n" % (w, h)
    return head + img.tobytes()


def bmp_bytes(img: np.ndarray, bpp: int = 24, top_down: bool = False) -> bytes:
    h, w, _ = img.shape
    ch = bpp // 8
    pad = (-(w * ch)) % 4
    if ch == 4:
        px = np.concatenate(
            [img[..., ::-1], np.full((h, w, 1), 255, np.uint8)], axis=2)
    else:
        px = img[..., ::-1]  # RGB -> BGR
    order = range(h) if top_down else range(h - 1, -1, -1)
    raster = b"".join(px[y].tobytes() + b"\x00" * pad for y in order)
    data_off = 14 + 40
    size = data_off + len(raster)
    fh = (b"BM" + size.to_bytes(4, "little") + b"\x00\x00\x00\x00"
          + data_off.to_bytes(4, "little"))
    ih = ((40).to_bytes(4, "little")
          + w.to_bytes(4, "little", signed=True)
          + (-h if top_down else h).to_bytes(4, "little", signed=True)
          + (1).to_bytes(2, "little") + bpp.to_bytes(2, "little")
          + (0).to_bytes(4, "little") + len(raster).to_bytes(4, "little")
          + b"\x00" * 16)
    return fh + ih + raster


def _img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_parse_ppm_roundtrip():
    img = _img(5, 7, 1)
    for comment in (False, True):
        w, h, ch, px = _parse_ppm(ppm_bytes(img, comment=comment))
        assert (w, h, ch) == (7, 5, 3)
        assert (px.reshape(5, 7, 3) == img).all()


def test_parse_ppm_rejects_garbage():
    assert _parse_ppm(b"nonsense") is None
    assert _parse_ppm(b"P6\n3 3\n255\nshort") is None  # truncated raster
    assert _parse_ppm(b"P6\n3 3\n65535\n" + b"\0" * 54) is None  # 16-bit


def test_parse_bmp_all_layouts():
    img = _img(4, 5, 2)  # width 5 -> 24bpp rows need 1 pad byte
    for bpp in (24, 32):
        for top_down in (False, True):
            out = _parse_bmp(bmp_bytes(img, bpp=bpp, top_down=top_down))
            assert out is not None, (bpp, top_down)
            w, h, ch, px = out
            assert (w, h, ch) == (5, 4, 3)
            assert (px.reshape(4, 5, 3) == img).all(), (bpp, top_down)


def test_parse_bmp_rejects_unsupported():
    img = _img(2, 2)
    buf = bytearray(bmp_bytes(img))
    buf[30] = 1  # biCompression = RLE8
    assert _parse_bmp(bytes(buf)) is None
    assert _parse_bmp(b"BMtooshort") is None


def _media_df(spark, payloads):
    return spark.createDataFrame(
        [(f"m{i}", bytearray(p)) for i, p in enumerate(payloads)],
        "media_id string, payload binary",
    )


def test_extract_media_meta_real_path(spark):
    os.environ.pop("CRYO_SPARK_FAKE_MEDIA", None)
    imgs = [_img(3, 4, 10), _img(6, 2, 11), _img(4, 4, 12)]
    payloads = [ppm_bytes(imgs[0]), bmp_bytes(imgs[1]),
                bmp_bytes(imgs[2], bpp=32, top_down=True)]
    out = {r.media_id: r
           for r in multimodal.extract_media_meta(_media_df(spark, payloads))
           .collect()}
    dims = [(4, 3), (2, 6), (4, 4)]
    for i, (w, h) in enumerate(dims):
        r = out[f"m{i}"]
        assert (r.width, r.height, r.n_channels) == (w, h, 3)
        assert r.n_bytes == len(payloads[i])
        # feature = normalized 8-bin histogram of the REAL rgb bytes
        want = np.bincount(imgs[i].reshape(-1) >> 5, minlength=8)
        want = want / want.sum()
        assert np.allclose(np.asarray(r.feature), want, atol=1e-6), i
    assert out["m0"].magic.startswith("5036")  # 'P6'
    assert out["m1"].magic.startswith("424d")  # 'BM'


def test_extract_media_meta_real_path_rejects_other_formats(spark):
    os.environ.pop("CRYO_SPARK_FAKE_MEDIA", None)
    df = _media_df(spark, [b"\x89PNG\r\n\x1a\n not really"])
    with pytest.raises(Exception, match="PPM|Pillow"):
        multimodal.extract_media_meta(df).collect()


def test_resize_mixed_batch_builtin_precedes_fake(spark):
    """With the fake env set, a parseable PPM still takes the REAL path
    (same precedence as extract_media_meta — the two kernels must never
    disagree about one payload's decode model) while an unparseable
    payload falls back to the fake gather."""
    os.environ["CRYO_SPARK_FAKE_MEDIA"] = "1"
    spark.sparkContext.environment["CRYO_SPARK_FAKE_MEDIA"] = "1"
    try:
        img = _img(6, 8, 21)
        blob = bytes(range(7, 207))  # not PPM/BMP -> fake path
        out = {r.media_id: r
               for r in multimodal.resize_media(
                   _media_df(spark, [ppm_bytes(img), blob]),
                   width=4, height=3).collect()}
        # center sampling, Pillow-exact: floor((i+0.5)*scale)
        yi = ((2 * np.arange(3) + 1) * 6) // 6
        xi = ((2 * np.arange(4) + 1) * 8) // 8
        assert bytes(out["m0"].payload) == img[yi][:, xi].reshape(-1).tobytes()
        j = np.arange(36, dtype=np.int64)
        src = np.minimum((j * len(blob)) // 36, len(blob) - 1)
        want_fake = np.frombuffer(blob, np.uint8)[src].tobytes()
        assert bytes(out["m1"].payload) == want_fake
    finally:
        os.environ.pop("CRYO_SPARK_FAKE_MEDIA", None)
        spark.sparkContext.environment.pop("CRYO_SPARK_FAKE_MEDIA", None)


def test_resize_media_real_path(spark):
    os.environ.pop("CRYO_SPARK_FAKE_MEDIA", None)
    img = _img(6, 8, 20)
    payloads = [ppm_bytes(img), bmp_bytes(img)]
    out = {r.media_id: r
           for r in multimodal.resize_media(
               _media_df(spark, payloads), width=4, height=3).collect()}
    # center sampling, Pillow-exact: floor((i+0.5)*scale)
    yi = ((2 * np.arange(3) + 1) * 6) // 6
    xi = ((2 * np.arange(4) + 1) * 8) // 8
    want = img[yi][:, xi].reshape(-1).tobytes()
    for mid in ("m0", "m1"):
        r = out[mid]
        assert (r.width, r.height) == (4, 3)
        assert bytes(r.payload) == want, mid
