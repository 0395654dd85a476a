"""Pure-stdlib codec correctness + real multimodal decode path.

The PNG decoder must implement the full spec filter set, so beyond the
encode→decode round trip (our encoder emits filter 0 only) the tests
forward-apply each filter (Sub/Up/Average/Paeth per RFC 2083 §6) to
craft IDAT streams the encoder never produces, and assert exact pixel
recovery.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from trendengine_spark.operators.codecs import (
    is_png,
    png_decode,
    png_encode,
    wav_decode,
    wav_encode,
)


@pytest.mark.parametrize("shape", [(7, 5), (7, 5, 1), (6, 4, 2), (9, 3, 3), (5, 8, 4)])
def test_png_round_trip_exact(shape):
    rng = np.random.RandomState(42)
    a = rng.randint(0, 256, size=shape, dtype=np.uint8)
    out = png_decode(png_encode(a))
    expect = a if a.ndim == 3 else a[:, :, None]
    assert out.shape == expect.shape
    assert np.array_equal(out, expect)


def _filter_forward(arr: np.ndarray, ftype: int) -> bytes:
    """Apply a PNG filter to raw scanlines (RFC 2083 §6 forward
    direction) and assemble the uncompressed stream."""
    h, w, c = arr.shape
    stride = w * c
    flat = arr.reshape(h, stride).astype(np.int64)
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        line = flat[y]
        filt = np.zeros(stride, dtype=np.int64)
        for x in range(stride):
            left = line[x - c] if x >= c else 0
            up = prev[x]
            ul = prev[x - c] if x >= c else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) >> 1
            else:  # paeth
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
            filt[x] = (line[x] - pred) & 0xFF
        out.append(ftype)
        out.extend(filt.astype(np.uint8).tobytes())
        prev = line
    return bytes(out)


@pytest.mark.parametrize("ftype", [1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 3, 4])
def test_png_decode_all_spec_filters(ftype, channels):
    rng = np.random.RandomState(ftype * 10 + channels)
    a = rng.randint(0, 256, size=(6, 5, channels), dtype=np.uint8)
    raw = _filter_forward(a, ftype)

    def chunk(tag, payload):
        body = tag + payload
        return struct.pack(">I", len(payload)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", 5, 6, 8, color_type, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(png_decode(data), a)


def test_png_rejects_bad_and_unsupported():
    with pytest.raises(ValueError):
        png_decode(b"not a png at all")
    # 16-bit depth is unsupported, not silently wrong
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)

    def chunk(tag, payload):
        body = tag + payload
        return struct.pack(">I", len(payload)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    data = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    with pytest.raises(NotImplementedError):
        png_decode(data)


def test_is_png():
    assert is_png(png_encode(np.zeros((2, 2), dtype=np.uint8)))
    assert not is_png(b"JFIF....")


def test_wav_round_trip():
    rng = np.random.RandomState(7)
    samples = rng.randint(-(2**15), 2**15, size=(441, 2), dtype=np.int16)
    rate, out = wav_decode(wav_encode(44100, samples))
    assert rate == 44100
    assert out.dtype == np.int16
    assert np.array_equal(out, samples)


# ------------------------------------------------ Spark real-decode path
def test_multimodal_png_decode_real_path(spark):
    """End-to-end: PNGs generated executor-side, decoded FOR REAL by
    the stdlib decoder inside mapInPandas; values match the closed
    form the DuckDB oracle predicts."""
    from tests.conftest import SF_SMOKE
    from trendengine_spark.queries import all_queries

    rows = all_queries()["multimodal_png_decode"](spark, SF_SMOKE).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.width == 4 + r.doc_id % 13
        assert r.height == 4 + r.doc_id % 11
        assert r.mean_luma == (r.doc_id % 256) / 255.0


def test_resize_real_png_path(spark):
    """resize_images(fake=False) on real PNG payloads: nearest-neighbor
    downsample, decoded output dims and pixels verified exactly."""
    import pandas as pd

    from trendengine_spark.operators.multimodal import resize_images

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(30, 40, 3), dtype=np.uint8)
    payload = png_encode(img)
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1],
                "media": [payload],
                "media_meta": None,
            }
        ).astype({"doc_id": "int64"}),
        schema="doc_id long, media binary, media_meta struct<width:int,height:int>",
    )
    out = resize_images(df, max_side=16, fake=False).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.width, r.height) == (40, 30)
    assert (r.out_width, r.out_height) == (16, 12)
    dec = png_decode(bytes(r.media))
    ys = (np.arange(12) * 30 // 12).astype(int)
    xs = (np.arange(16) * 40 // 16).astype(int)
    assert np.array_equal(dec, img[ys][:, xs])


# ----------------------------------------------------------------- JPEG
def test_jpeg_constant_fill_roundtrip_exact():
    """Constant-fill grayscale with DC quant 8 decodes EXACTLY (the
    level-shifted DC is a multiple of the quant step; all AC zero) —
    the property the oracle-checked multimodal_jpeg_decode relies on."""
    from trendengine_spark.operators.codecs import jpeg_decode, jpeg_encode

    for g in (0, 1, 127, 128, 200, 255):
        img = np.full((19, 13), g, dtype=np.uint8)
        dec = jpeg_decode(jpeg_encode(img))
        assert dec.shape == (19, 13, 1)
        assert (dec == g).all(), (g, int(dec.min()), int(dec.max()))


def test_jpeg_gray_roundtrip_quant_bounded():
    """Random grayscale: encode/decode error bounded by quantization
    (q=1 → IDCT rounding only)."""
    from trendengine_spark.operators.codecs import jpeg_decode, jpeg_encode

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(24, 17), dtype=np.uint8)
    dec = jpeg_decode(jpeg_encode(img, dc_quant=1, ac_quant=1))[:, :, 0]
    assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 2


def test_jpeg_rgb_roundtrip_quant_bounded():
    """RGB 4:4:4: YCbCr forward/backward + q=1 quantization stays
    within a few levels per channel."""
    from trendengine_spark.operators.codecs import jpeg_decode, jpeg_encode

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
    dec = jpeg_decode(jpeg_encode(img, dc_quant=1, ac_quant=1))
    assert dec.shape == (16, 16, 3)
    assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 6


def test_jpeg_rejects_non_baseline():
    """Progressive SOF2 must raise, not mis-decode."""
    import pytest

    from trendengine_spark.operators.codecs import jpeg_decode, jpeg_encode

    img = np.full((8, 8), 100, dtype=np.uint8)
    payload = bytearray(jpeg_encode(img))
    sof = payload.find(b"\xff\xc0")
    payload[sof + 1] = 0xC2  # rewrite marker to progressive
    with pytest.raises(NotImplementedError, match="SOF2"):
        jpeg_decode(bytes(payload))


def test_jpeg_decode_feature_batch(spark):
    """decode_image_batch(fake=False) handles a mixed PNG/JPEG batch."""
    import pandas as pd

    from trendengine_spark.operators.codecs import jpeg_encode
    from trendengine_spark.operators.multimodal import decode_image_batch

    png_payload = png_encode(np.full((6, 5), 40, dtype=np.uint8))
    jpeg_payload = jpeg_encode(np.full((9, 12), 80, dtype=np.uint8))
    out = decode_image_batch(pd.Series([png_payload, jpeg_payload]), fake=False)
    assert list(out["width"]) == [5, 12]
    assert list(out["height"]) == [6, 9]
    assert abs(out["mean_luma"][0] - 40 / 255.0) < 1e-12
    assert abs(out["mean_luma"][1] - 80 / 255.0) < 1e-12


# ----------------------------------------------------------- AVI (RIFF/MJPEG)


def test_avi_mjpeg_round_trip_exact():
    from trendengine_spark.operators.codecs import (
        avi_mjpeg_encode,
        avi_parse,
        is_avi,
        jpeg_decode,
        jpeg_encode,
    )

    frames = [
        jpeg_encode(np.full((16, 16), v, dtype=np.uint8)) for v in (0, 77, 255)
    ]
    avi = avi_mjpeg_encode(frames, fps=2)
    assert is_avi(avi)
    p = avi_parse(avi)
    assert p["n_frames"] == 3
    assert p["us_per_frame"] == 500_000
    assert (p["width"], p["height"]) == (16, 16)
    # frame payloads come back byte-identical and still decode exactly
    assert p["frames"] == frames
    assert [int(jpeg_decode(f).mean()) for f in p["frames"]] == [0, 77, 255]


def test_avi_walker_skips_unknown_chunks():
    """The parser is a generic RIFF walker: JUNK padding chunks and
    unknown LISTs (as real muxers emit) must not derail it."""
    from trendengine_spark.operators.codecs import (
        avi_mjpeg_encode,
        avi_parse,
        jpeg_encode,
    )

    frames = [jpeg_encode(np.full((8, 8), 42, dtype=np.uint8))]
    avi = bytearray(avi_mjpeg_encode(frames, fps=1))
    junk = b"JUNK" + struct.pack("<I", 6) + b"abcdef"
    # splice JUNK right after the 'AVI ' form type, fix up RIFF size
    avi[12:12] = junk
    avi[4:8] = struct.pack("<I", len(avi) - 8)
    p = avi_parse(bytes(avi))
    assert p["frames"] == frames
    assert p["n_frames"] == 1


def test_avi_rejects_non_avi():
    from trendengine_spark.operators.codecs import avi_parse, is_avi

    assert not is_avi(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        avi_parse(b"\x89PNG not an avi")


def test_gif_lzw_roundtrip_and_cross_encoder():
    """LZW: dictionary encoder round trip on data forcing several
    code-width bumps and a 4096-entry reset; the independent
    literal-code encoder (uncompressed-GIF technique) cross-validates
    the decoder's bit unpacking and clear handling against a second
    spec-conformant producer."""
    import numpy as np

    from trendengine_spark.operators.codecs import (
        _lzw_decode,
        _lzw_encode,
        _lzw_encode_literal,
    )

    rng = np.random.RandomState(7)
    cases = [
        rng.randint(0, 256, 30000, dtype=np.uint8).tobytes(),  # dict reset
        bytes(4000),  # runs -> KwKwK codes
        bytes(range(256)) * 50,  # cyclic
        (np.arange(20000) % 251).astype(np.uint8).tobytes(),
    ]
    for data in cases:
        assert _lzw_decode(_lzw_encode(data, 8), 8) == data
        assert _lzw_decode(_lzw_encode_literal(data[:2000], 8), 8) == data[:2000]
    small = bytes([int(x) for x in rng.randint(0, 4, 3000)])
    assert _lzw_decode(_lzw_encode(small, 2), 2) == small


def test_gif_container_roundtrip():
    import numpy as np

    from trendengine_spark.operators.codecs import gif_decode, gif_encode, is_gif

    yy, xx = np.indices((19, 23))
    frames = [
        ((3 * xx + 5 * yy + f * 7) % 256).astype(np.uint8) for f in range(4)
    ]
    data = gif_encode(frames, delay_cs=4)
    assert is_gif(data)
    out = gif_decode(data)
    assert (out["width"], out["height"]) == (23, 19)
    assert out["delays_cs"] == [4, 4, 4, 4]
    assert len(out["frames"]) == 4
    for a, b in zip(frames, out["frames"]):
        assert (a == b).all()
    # grayscale identity palette
    assert (out["palette"][:, 0] == np.arange(256)).all()


def test_lzw_vectorized_bit_identical_to_scalar():
    """r8 (VERDICT r7 task 3): the production LZW encode (int-keyed
    table + one vectorized bit-pack) and decode (schedule-driven
    vectorized unpack + list-table expansion) must be BYTE-identical
    to the retained scalar reference implementations on gradients,
    randoms, KwKwK runs, table-reset-length data, low code sizes and
    truncated streams."""
    import random

    import numpy as np

    from trendengine_spark.operators.codecs import (
        _lzw_decode,
        _lzw_decode_scalar,
        _lzw_encode,
        _lzw_encode_literal,
        _lzw_encode_scalar,
    )

    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:22, 0:24]
    cases = [
        ((3 * xx + 5 * yy + 17) % 256).astype(np.uint8).tobytes(),
        b"",
        b"\x05",
        b"\x00" * 4000,  # KwKwK chains
        rng.integers(0, 256, 25000, dtype=np.uint8).tobytes(),  # reset
        bytes(range(256)) * 32,
        rng.integers(0, 2, 30000, dtype=np.uint8).tobytes(),
    ]
    random.seed(3)
    for mcs in (2, 4, 8):
        for d in cases:
            if mcs < 8:
                d = bytes(b % (1 << mcs) for b in d)
            e = _lzw_encode(d, mcs)
            assert e == _lzw_encode_scalar(d, mcs)
            assert _lzw_decode(e, mcs) == d
            # second producer: the literal-code encoder
            lit = _lzw_encode_literal(d[:300], mcs)
            assert _lzw_decode(lit, mcs) == d[:300]
            # truncated streams degrade identically (treat-as-end)
            for cut in (0, 1, len(e) // 3, len(e) - 1):
                t = e[:cut]
                assert _lzw_decode(t, mcs) == _lzw_decode_scalar(t, mcs)
