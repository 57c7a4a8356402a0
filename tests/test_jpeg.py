"""From-scratch baseline JPEG codec (sparkfuse.jpeg) — DC-exact round
trips, entropy-layer losslessness, IDCT vs the textbook definition,
foreign-encoder goldens, malformed-stream validation, and the Spark media
integration.

JPEG is lossy, so correctness rests on four independent legs:
  1. the ENTROPY layer (Huffman + DPCM + zigzag + byte stuffing + restart
     markers) is lossless by construction — pinned by exact coefficient
     equality between what the encoder quantized and what the decoder
     recovers;
  2. the TRANSFORM layer is pinned against the textbook DCT-II double-sum
     definition (not our own matrix identity), and by the DC-exact
     constant-block design that round-trips bit-exactly through the full
     lossy pipeline;
  3. FOREIGN golden: the CPython test suite ships a real 16x16 baseline
     4:2:0 JPEG of the Python logo (optimized Huffman tables, subsampled
     chroma — none of which our encoder emits), which must parse, decode
     to the right dims, and show the logo's structure (blue upper-left /
     yellow lower-right on black);
  4. the driver's media_decode oracle recomputes synth_jpeg_media's
     decoded stats from generation arithmetic, container-independent, so
     the JPEG leg is hash-checked end-to-end every round.
"""

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkfuse.jpeg import (
    BASE_QUANT_LUMA,
    ZIGZAG,
    _decode_to_coefficients,
    _fdct,
    _pad_edge8,
    _to_blocks,
    decode_jpeg,
    encode_jpeg,
    quality_scaled_tables,
)

_FOREIGN = "/root/.pyenv/versions/3.13.0/lib/python3.13/test/test_email/data/python.jpg"


def _mosaic(mid: int) -> np.ndarray:
    """synth_jpeg_media's documented generation arithmetic."""
    nbx, nby = 1 + mid % 4, 1 + mid % 3
    bx = np.arange(nbx)[None, :]
    by = np.arange(nby)[:, None]
    vals = (2 * ((mid + 3 * bx + 7 * by) % 128)).astype(np.uint8)
    return np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)


def _gradient(h: int, w: int) -> np.ndarray:
    return ((np.arange(h)[:, None] * 3 + np.arange(w)[None, :] * 5) % 256).astype(
        np.uint8
    )


# ---------------------------------------------------------------------------
# leg 2: DC-exact constant-block round trips through the full lossy pipeline
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mid", [0, 1, 2, 3, 5, 11, 1_000_000_007])
def test_constant_even_blocks_roundtrip_bit_exact(mid):
    img = _mosaic(mid)
    out = decode_jpeg(encode_jpeg(img))
    assert out.dtype == np.uint8 and out.shape == img.shape
    assert np.array_equal(out, img)


def test_odd_block_values_do_not_satisfy_the_exactness_contract():
    # documents WHY synth_jpeg_media doubles: odd v -> DC = 8*(v-128) is not
    # a multiple of 16, quantization moves it, and the round trip drifts
    img = np.full((8, 8), 101, np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert not np.array_equal(out, img)
    assert np.abs(out.astype(int) - 101).max() <= 2  # still within q/2 of DC


# ---------------------------------------------------------------------------
# leg 1: entropy layer is lossless (coefficient-level equality)
# ---------------------------------------------------------------------------


def _expected_coefficients(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    blocks = _to_blocks(_pad_edge8(plane.astype(np.float64)) - 128.0)
    return np.rint(_fdct(blocks) / q.astype(np.float64)).astype(np.int64)


@pytest.mark.parametrize("quality", [10, 50, 70, 95])
def test_entropy_layer_lossless_gray(quality):
    img = _gradient(40, 56)
    qluma, _ = quality_scaled_tables(quality)
    comps, qtables, w, h, _ = _decode_to_coefficients(
        encode_jpeg(img, quality=quality)
    )
    assert (w, h) == (56, 40)
    assert np.array_equal(qtables[comps[0].tq].reshape(8, 8), qluma)
    assert np.array_equal(
        comps[0].coeffs.reshape(-1, 8, 8), _expected_coefficients(img, qluma)
    )


def test_entropy_layer_lossless_rgb_and_noise():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (24, 17, 3)).astype(np.uint8)
    from sparkfuse.jpeg import _rgb_to_ycbcr

    ycc = _rgb_to_ycbcr(img)
    qluma, qchroma = quality_scaled_tables(85)
    comps, qtables, _, _, _ = _decode_to_coefficients(
        encode_jpeg(img, quality=85)
    )
    for ci, comp in enumerate(comps):
        q = qluma if ci == 0 else qchroma
        assert np.array_equal(
            comp.coeffs.reshape(-1, 8, 8),
            _expected_coefficients(ycc[..., ci], q),
        )


def test_restart_markers_do_not_change_pixels_and_are_validated():
    img = _gradient(40, 56)
    plain = decode_jpeg(encode_jpeg(img, quality=80))
    with_rst = encode_jpeg(img, quality=80, restart_interval=3)
    assert b"\xff\xd0" in with_rst or b"\xff\xd1" in with_rst
    assert np.array_equal(decode_jpeg(with_rst), plain)
    # removing one restart marker must fail loudly, not mis-decode
    broken = with_rst.replace(b"\xff\xd0", b"", 1)
    with pytest.raises(ValueError, match="restart"):
        decode_jpeg(broken)


def test_byte_stuffing_roundtrip():
    # white image drives large positive coefficients -> 0xFF-rich entropy
    # bytes; any stuffing bug would desynchronize the stream
    img = np.full((16, 16), 254, np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(img)), img)


# ---------------------------------------------------------------------------
# leg 2b: transform layer vs the textbook definition
# ---------------------------------------------------------------------------


def test_fdct_matches_textbook_double_sum():
    rng = np.random.default_rng(11)
    s = rng.integers(-128, 128, (8, 8)).astype(np.float64)
    ref = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = 1 / np.sqrt(2) if u == 0 else 1.0
            cv = 1 / np.sqrt(2) if v == 0 else 1.0
            acc = 0.0
            for x in range(8):
                for y in range(8):
                    acc += (
                        s[x, y]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            ref[u, v] = 0.25 * cu * cv * acc
    np.testing.assert_allclose(_fdct(s[None])[0], ref, atol=1e-9)


def test_idct_inverts_fdct():
    from sparkfuse.jpeg import _idct

    rng = np.random.default_rng(12)
    blocks = rng.integers(-128, 128, (5, 8, 8)).astype(np.float64)
    np.testing.assert_allclose(_idct(_fdct(blocks)), blocks, atol=1e-9)


# ---------------------------------------------------------------------------
# lossy-but-bounded general round trips
# ---------------------------------------------------------------------------


def test_gradient_error_bounded_and_improves_with_quality():
    img = _gradient(40, 56)
    errs = []
    for q in (30, 60, 90):
        out = decode_jpeg(encode_jpeg(img, quality=q))
        assert out.shape == img.shape
        errs.append(np.abs(out.astype(int) - img.astype(int)).max())
    assert errs[2] <= errs[0]
    assert errs[2] < 16


def test_rgb_smooth_image_nearly_exact():
    img = np.zeros((24, 24, 3), np.uint8)
    img[..., 0], img[..., 1], img[..., 2] = 100, 150, 200
    out = decode_jpeg(encode_jpeg(img, quality=75))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_non_multiple_of_8_dims_roundtrip():
    img = _gradient(33, 41)
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert out.shape == (33, 41)
    assert np.abs(out.astype(int) - img.astype(int)).max() < 24


# ---------------------------------------------------------------------------
# leg 3: foreign golden (CPython test suite, optimized tables + 4:2:0)
# ---------------------------------------------------------------------------


def test_foreign_python_logo_decodes():
    buf = open(_FOREIGN, "rb").read()
    px = decode_jpeg(buf)
    assert px.shape == (16, 16, 3) and px.dtype == np.uint8
    # the logo: blue upper-left lobe, yellow lower-right lobe, black frame
    ul = px[2:6, 2:8].reshape(-1, 3).mean(0)
    lr = px[9:13, 6:12].reshape(-1, 3).mean(0)
    assert ul[2] > ul[0] and ul[2] > 80  # blue dominant
    assert lr[0] > 150 and lr[1] > 110 and lr[2] < lr[1]  # yellow dominant
    assert px[0, 0].max() < 30 and px[-1, 0].max() < 30  # black corners
    # regression pin on the full decoded raster
    import zlib

    assert zlib.crc32(px.tobytes()) == 1186401612


def test_sixteen_bit_dqt_branch():
    # rewrite our 8-bit DQT segment as the spec's 16-bit (Pq=1) form; the
    # decode must be identical
    img = _gradient(24, 24)
    buf = bytearray(encode_jpeg(img, quality=60))
    i = buf.find(b"\xff\xdb")
    (seglen,) = struct.unpack(">H", buf[i + 2 : i + 4])
    assert seglen == 67  # Pq/Tq byte + 64 8-bit entries
    entries = bytes(buf[i + 5 : i + 69])
    wide = struct.pack(">H", 2 + 1 + 128) + bytes([0x10]) + b"".join(
        struct.pack(">H", e) for e in entries
    )
    out = bytes(buf[: i + 2]) + wide + bytes(buf[i + 69 :])
    assert np.array_equal(decode_jpeg(out), decode_jpeg(bytes(buf)))


# ---------------------------------------------------------------------------
# validation: out-of-envelope inputs fail loudly, never mis-decode
# ---------------------------------------------------------------------------


def test_remaining_modes_raise_by_name():
    # arithmetic coding (SOF9/SOF10) and Huffman lossless (SOF3,
    # tests/test_jpeg_lossless.py) decode for real now; the named-raise
    # boundary moved to arithmetic-lossless / hierarchical / differential
    buf = bytearray(encode_jpeg(_gradient(16, 16)))
    i = buf.find(b"\xff\xc0")
    buf[i + 1] = 0xCB
    with pytest.raises(NotImplementedError, match="arithmetic.*lossless"):
        decode_jpeg(bytes(buf))
    buf[i + 1] = 0xC5
    with pytest.raises(NotImplementedError, match="differential"):
        decode_jpeg(bytes(buf))


# ---------------------------------------------------------------------------
# progressive mode (SOF2: spectral selection + successive approximation)
# ---------------------------------------------------------------------------

_FOREIGN_PROGRESSIVE = [
    # (path, is_color, min_whiteish_fraction, crc32 of decoded pixels)
    (
        "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/"
        "multi-channel/grayscale.jpg",
        False,
        None,
        3528785342,
    ),
    ("/usr/share/doc/nodejs/full-white-stripe.jpg", True, 0.9, 4044904123),
    ("/usr/share/doc/nodejs/thin-white-stripe.jpg", True, 0.8, 2445012792),
]


@pytest.mark.parametrize("shape", [(16, 16), (24, 40), (7, 13), (64, 48)])
def test_progressive_decode_equals_baseline_decode_gray(shape):
    """Progressive is entropy packaging over the SAME quantized
    coefficients — decodes must agree bit-for-bit with baseline. This
    exercises every progressive path the encoder's scan script emits:
    DC first, AC first with band splits, DC refinement, AC refinement."""
    rng = np.random.default_rng(11)
    img = (
        np.add.outer(np.arange(shape[0]) * 3, np.arange(shape[1]) * 2)
        + rng.integers(0, 30, shape)
    ).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=50))
    prog = decode_jpeg(encode_jpeg(img, quality=50, progressive=True))
    assert np.array_equal(base, prog)


def test_progressive_decode_equals_baseline_decode_rgb():
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (33, 27, 3)).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=75))
    prog = decode_jpeg(encode_jpeg(img, quality=75, progressive=True))
    assert np.array_equal(base, prog)


def test_progressive_mosaic_roundtrip_bit_exact():
    """The DC-exact contract holds through the progressive scan script too
    (DC survives the Al=1 split + refinement; every AC stays zero)."""
    for mid in (0, 9, 42):
        img = _mosaic(mid)
        assert np.array_equal(
            decode_jpeg(encode_jpeg(img, progressive=True)), img
        )


def test_progressive_stream_is_really_sof2_multiscan():
    buf = encode_jpeg(_gradient(24, 16), progressive=True)
    assert b"\xff\xc2" in buf and b"\xff\xc0" not in buf
    # scan script: DC first + 2 AC bands + DC refine + 2 AC refine = 6 SOS
    assert buf.count(b"\xff\xda") == 6
    buf3 = encode_jpeg(
        np.zeros((8, 8, 3), dtype=np.uint8), progressive=True
    )
    # color: AC scans are per component -> 1 + 3*2 + 1 + 3*2 = 14 SOS
    assert buf3.count(b"\xff\xda") == 14


def test_progressive_rejects_restart_interval():
    with pytest.raises(ValueError, match="baseline-only"):
        encode_jpeg(_gradient(8, 8), progressive=True, restart_interval=2)


@pytest.mark.parametrize("path,color,whiteish,crc", _FOREIGN_PROGRESSIVE)
def test_foreign_progressive_files_decode(path, color, whiteish, crc):
    """Foreign-encoder progressive JPEGs (libjpeg-era scan scripts with
    multi-block EOB runs and successive approximation — paths this
    repo's own encoder deliberately does not emit): the Spark
    distribution's mllib grayscale image and the nodejs documentation
    white-stripe images. Content checks are externally predictable
    (white-stripe files are mostly white); the CRC pins regressions."""
    import os
    import zlib

    if not os.path.exists(path):
        pytest.skip(f"foreign golden {path} not on disk")
    px = decode_jpeg(open(path, "rb").read())
    if color:
        assert px.ndim == 3 and px.shape[2] == 3
        assert float((px >= 250).mean()) >= whiteish
    else:
        assert px.ndim == 2
        # full-range, plausibly-exposed photograph
        assert px.min() == 0 and px.max() == 255
        assert 100 < float(px.mean()) < 180
    assert zlib.crc32(px.tobytes()) == crc


def test_not_a_jpeg_raises():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n\x1a\nnot a jpeg")


def test_truncated_scan_raises():
    buf = encode_jpeg(_gradient(64, 64), quality=95)
    with pytest.raises(ValueError):
        decode_jpeg(buf[: len(buf) // 2])


def test_encoder_rejects_bad_inputs():
    with pytest.raises(ValueError, match="uint8"):
        encode_jpeg(np.zeros((8, 8), np.float32))
    with pytest.raises(ValueError, match="gray"):
        encode_jpeg(np.zeros((8, 8, 4), np.uint8))
    with pytest.raises(ValueError, match="quality"):
        encode_jpeg(np.zeros((8, 8), np.uint8), quality=0)


def test_quality_scaling_monotone_and_anchored():
    qluma50, _ = quality_scaled_tables(50)
    assert np.array_equal(qluma50, BASE_QUANT_LUMA)
    q95, _ = quality_scaled_tables(95)
    q5, _ = quality_scaled_tables(5)
    assert (q95 <= qluma50).all() and (qluma50 <= q5).all()
    assert q95.min() >= 1 and q5.max() <= 255
    # the exactness anchor the oracle depends on
    assert BASE_QUANT_LUMA[0, 0] == 16


def test_zigzag_is_a_permutation_with_the_spec_prefix():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    assert ZIGZAG[:10].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]


# ---------------------------------------------------------------------------
# leg 4: Spark integration (dispatch + the driver-row contract's local twin)
# ---------------------------------------------------------------------------


def test_decode_image_dispatches_jpeg():
    from sparkfuse.multimodal import decode_image

    img = _mosaic(7)
    assert np.array_equal(decode_image(encode_jpeg(img)), img)


def test_jpeg_composes_with_resize_into_png(spark):
    # decode(JPEG) -> nearest resize -> re-encode PNG (lossless: resizing
    # must not add a second lossy generation) -> decoded stats stay exact
    from sparkfuse.multimodal import (
        media_decode_stats,
        resize_images,
        resize_nearest,
        synth_jpeg_media,
    )

    ids = spark.range(12).select(F.col("id").alias("media_id"))
    out = resize_images(synth_jpeg_media(ids), out_h=10, out_w=14)
    got = {r["media_id"]: r for r in media_decode_stats(out).collect()}
    mimes = {r["mime"] for r in out.select("mime").collect()}
    assert mimes == {"image/png"}
    for mid in range(12):
        ref = resize_nearest(_mosaic(mid), 10, 14).astype(np.int64)
        r = got[mid]
        assert (r["width"], r["height"]) == (14, 10)
        assert r["checksum"] == int(ref.sum())
        assert r["peak"] == int(ref.max())


def test_synth_jpeg_media_stats_match_generation_arithmetic(spark):
    from sparkfuse.multimodal import media_decode_stats, synth_jpeg_media

    ids = spark.range(40).select(F.col("id").alias("media_id"))
    got = {
        r["media_id"]: r
        for r in media_decode_stats(synth_jpeg_media(ids)).collect()
    }
    assert len(got) == 40
    for mid in range(40):
        img = _mosaic(mid)
        r = got[mid]
        assert r["kind"] == "image"
        assert (r["width"], r["height"]) == (img.shape[1], img.shape[0])
        assert r["checksum"] == int(img.astype(np.int64).sum())
        assert r["peak"] == int(img.max())
