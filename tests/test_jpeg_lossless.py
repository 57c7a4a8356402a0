"""Lossless JPEG (T.81 process 14, SOF3): hand-derived spec goldens +
exact round-trips.

No lossless-capable foreign decoder exists in this container (system
libjpeg is API v62; lossless landed in libjpeg-turbo 3.0), so the golden
below is derived BY HAND from the T.81 text — Annex H.1.2.1 prediction,
F.1.2.1 Huffman categories/EXTEND, B.2.3 headers — with every byte built
by struct here, no calls into sparkfuse.jpegll. The decoder is pinned
against those bytes and the encoder must reproduce them bit-for-bit.
"""

import struct

import numpy as np
import pytest

from sparkfuse.jpeg import decode_jpeg
from sparkfuse.jpegll import decode_jpeg_lossless, encode_jpeg_lossless

LL_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1]
LL_VALS = list(range(17))


def _seg(marker, body):
    return struct.pack(">BBH", 0xFF, marker, 2 + len(body)) + body


def _golden_2x2():
    """[[100,101],[98,99]] gray, predictor 1, P=8, Pt=0 — worked by hand:

    sample (0,0): pred = 2^7 = 128, diff −28 → SSSS 5 (code 11110),
      extra −28+31 = 3 → 00011
    sample (0,1): row 0 uses Ra=100, diff +1 → SSSS 1 (01), extra 1
    sample (1,0): col 0 uses Rb=100, diff −2 → SSSS 2 (10), extra 01
    sample (1,1): Ra=98, diff +1 → SSSS 1 (01), extra 1

    bits 11110 00011 01 1 10 01 01 1 → pad-1s → F0 DC BF (no 0xFF, so
    no stuffing). Category codes are the canonical enumeration of the
    2,2,2,3..16 length table (s0=00 s1=01 s2=10 s3=110 s4=1110 s5=11110).
    """
    img = np.array([[100, 101], [98, 99]], dtype=np.uint8)
    dht = bytes([0x00] + LL_BITS + LL_VALS)
    sof = struct.pack(">BHHB", 8, 2, 2, 1) + struct.pack(">BBB", 1, 0x11, 0)
    sos = bytes([1, 1, 0x00, 1, 0, 0])  # 1 comp, Ss=pred 1, Se=0, AhAl=0
    payload = (
        b"\xff\xd8"
        + _seg(0xC4, dht)
        + _seg(0xC3, sof)
        + _seg(0xDA, sos)
        + bytes([0xF0, 0xDC, 0xBF])
        + b"\xff\xd9"
    )
    return img, payload


def test_hand_derived_golden_decodes():
    img, payload = _golden_2x2()
    out = decode_jpeg_lossless(payload)
    assert out.dtype == np.uint8 and np.array_equal(out, img)


def test_encoder_reproduces_hand_derived_bytes():
    img, payload = _golden_2x2()
    assert encode_jpeg_lossless(img, predictor=1) == payload


def test_public_decode_jpeg_dispatches_sof3():
    img, payload = _golden_2x2()
    assert np.array_equal(decode_jpeg(payload), img)


@pytest.mark.parametrize("predictor", [1, 2, 3, 4, 5, 6, 7])
def test_roundtrip_exact_all_predictors_gray(predictor):
    rng = np.random.default_rng(predictor)
    img = rng.integers(0, 256, (23, 31), dtype=np.uint8)
    out = decode_jpeg_lossless(encode_jpeg_lossless(img, predictor=predictor))
    assert np.array_equal(out, img)


def test_roundtrip_exact_rgb_verbatim_components():
    rng = np.random.default_rng(99)
    img = rng.integers(0, 256, (17, 13, 3), dtype=np.uint8)
    out = decode_jpeg_lossless(encode_jpeg_lossless(img, predictor=4))
    # components come back VERBATIM (no YCbCr convention in lossless)
    assert out.shape == (17, 13, 3) and np.array_equal(out, img)


def test_roundtrip_16bit_with_half_range_wrap():
    # extremes force the mod-2^16 wrap and the SSSS=16 no-extra-bits path:
    # 0 after 65535 under predictor 1 is a -65535 true difference ≡ +1,
    # and a +/-32768 wrapped difference appears in the checker rows
    img = np.array(
        [[0, 65535, 0, 65535], [32768, 0, 32768, 65535], [1, 32769, 2, 40000]],
        dtype=np.uint16,
    )
    for predictor in (1, 2, 7):
        out = decode_jpeg_lossless(encode_jpeg_lossless(img, predictor=predictor))
        assert out.dtype == np.uint16 and np.array_equal(out, img)


def test_roundtrip_16bit_random():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 65536, (19, 11), dtype=np.uint16)
    out = decode_jpeg_lossless(encode_jpeg_lossless(img, predictor=5))
    assert np.array_equal(out, img)


def test_point_transform_truncates_then_restores_scale():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (9, 9), dtype=np.uint8)
    out = decode_jpeg_lossless(
        encode_jpeg_lossless(img, predictor=2, point_transform=2)
    )
    assert np.array_equal(out, (img >> 2) << 2)


def test_single_row_and_single_column():
    row = np.arange(256, dtype=np.uint8).reshape(1, 256)
    col = np.arange(256, dtype=np.uint8).reshape(256, 1)
    for img in (row, col):
        for predictor in (1, 2, 6):
            assert np.array_equal(
                decode_jpeg_lossless(encode_jpeg_lossless(img, predictor)), img
            )


def test_fill_bytes_before_markers_are_skipped():
    # T.81 B.1.1.2: any marker may be preceded by any number of 0xFF fill
    # bytes — real DNG/DICOM writers emit them; the frame dispatch and the
    # lossless header walk must both skip them
    img, payload = _golden_2x2()
    filled = payload[:2]
    i = 2
    while i < len(payload):
        if payload[i] == 0xFF and payload[i + 1] in (0xC4, 0xC3, 0xDA):
            filled += b"\xff\xff"  # two fill bytes before each segment
        nxt = payload.find(b"\xff", i + 2)
        nxt = len(payload) if nxt < 0 else nxt
        filled += payload[i:nxt]
        i = nxt
    assert np.array_equal(decode_jpeg_lossless(filled), img)
    assert np.array_equal(decode_jpeg(filled), img)  # dispatch skips fills


def test_truncated_header_raises_value_error():
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg_lossless(b"\xff\xd8\xff\xc4")


def test_named_raises():
    img = np.zeros((4, 4), dtype=np.uint8)
    with pytest.raises(ValueError, match="predictor"):
        encode_jpeg_lossless(img, predictor=0)
    with pytest.raises(ValueError, match="point transform"):
        encode_jpeg_lossless(img, point_transform=8)
    with pytest.raises(ValueError, match="out of range"):
        encode_jpeg_lossless(np.full((4, 4), 300, dtype=np.int64), precision=8)
    # subsampled lossless stream: patch the SOF sampling byte
    _, payload = _golden_2x2()
    bad = bytearray(payload)
    sof_off = payload.index(b"\xff\xc3")
    bad[sof_off + 4 + 6 + 1] = 0x22  # h=v=2
    with pytest.raises(NotImplementedError, match="subsampled"):
        decode_jpeg_lossless(bytes(bad))


def test_restart_intervals_rejected_with_named_reason():
    # splice a DRI segment + a fake RSTO into the golden stream
    img, payload = _golden_2x2()
    sos_off = payload.index(b"\xff\xda")
    scan_start = sos_off + 2 + 8  # SOS header is 8 bytes long here
    with_dri = (
        payload[:sos_off]
        + _seg(0xDD, struct.pack(">H", 1))
        + payload[sos_off:scan_start]
        + payload[scan_start : scan_start + 1]
        + b"\xff\xd0"
        + payload[scan_start + 1 :]
    )
    with pytest.raises(NotImplementedError, match="restart"):
        decode_jpeg_lossless(with_dri)


def test_media_decode_stats_lossless_population(spark):
    # the driver-row shape: synth SOF3 payloads (predictors cycling 1..7
    # by id) decoded back through media_decode_stats must reproduce the
    # generation formula exactly — the same arithmetic the DuckDB oracle
    # recomputes
    from sparkfuse.multimodal import media_decode_stats, synth_lossless_jpeg_media

    ids = spark.range(4_000_000_000, 4_000_000_021).withColumnRenamed("id", "media_id")
    got = {
        r["media_id"]: r
        for r in media_decode_stats(synth_lossless_jpeg_media(ids)).collect()
    }
    assert len(got) == 21
    for mid, r in got.items():
        w, h = 4 + mid % 9, 3 + mid % 5
        x = np.arange(w)[None, :, None]
        y = np.arange(h)[:, None, None]
        c = np.arange(3)[None, None, :]
        px = ((mid + x + 2 * y + 3 * c) % 256).astype(np.int64)
        assert (r["width"], r["height"]) == (w, h)
        assert r["checksum"] == int(px.sum()) and r["peak"] == int(px.max())


def test_prediction_residuals_compress_smooth_images():
    # a gradient is near-perfectly predicted by selector 4/7 — the stream
    # must be far smaller than raw; noise must stay near raw size + headers
    y, x = np.mgrid[0:64, 0:64]
    smooth = ((y + x) * 2).clip(0, 255).astype(np.uint8)
    noise = np.random.default_rng(0).integers(0, 256, (64, 64), dtype=np.uint8)
    sm = len(encode_jpeg_lossless(smooth, predictor=4))
    nz = len(encode_jpeg_lossless(noise, predictor=4))
    assert sm < 64 * 64 // 3 < 64 * 64 < nz < 64 * 64 * 2
