"""Arithmetic-coded JPEG (SOF9/SOF10): conformance by FOREIGN interop.

The QM coder cannot be certified by self-round-trip alone (an encoder and
decoder sharing a wrong table would agree with each other), so this suite
drives the system libjpeg-turbo as the foreign implementation through a
tiny C helper (tools/arith_jpeg_helper.c) compiled at session scope:

  * libjpeg-encoded SOF9 and SOF10 streams decode HERE to the exact
    quantized coefficients libjpeg itself reports (jpeg_read_coefficients
    — the entropy layer is lossless, so equality is bit-level, immune to
    IDCT rounding differences),
  * streams encoded HERE decode in libjpeg to the exact coefficients,
  * the compiled-in Table D.3 copy inside libjpeg's .so equals
    jpegarith.QM_TABLE byte for byte.

Helper-backed tests skip when gcc / jpeglib.h / the runtime .so are
absent; the self-consistency tests (arithmetic ≡ baseline ≡ progressive
decode over this repo's own encoder) always run.
"""

from __future__ import annotations

import glob
import itertools
import shutil
import struct
import subprocess

import numpy as np
import pytest

from sparkfuse.jpeg import _decode_to_coefficients, decode_jpeg, encode_jpeg
from sparkfuse.jpegarith import QM_TABLE, QMDecoder, QMEncoder, new_stats

_HELPER_SRC = "tools/arith_jpeg_helper.c"


def _find_libjpeg() -> str | None:
    for pat in (
        "/lib/*/libjpeg.so*",
        "/usr/lib/*/libjpeg.so*",
        "/usr/lib/libjpeg.so*",
    ):
        hits = [h for h in glob.glob(pat) if not h.endswith(".a")]
        if hits:
            return sorted(hits)[-1]
    return None


@pytest.fixture(scope="module")
def helper(tmp_path_factory):
    import os

    src = os.path.join(os.path.dirname(__file__), "..", _HELPER_SRC)
    if shutil.which("gcc") is None or not os.path.exists(
        "/usr/include/jpeglib.h"
    ):
        pytest.skip("no gcc + jpeglib.h: foreign-interop tests unavailable")
    exe = str(tmp_path_factory.mktemp("arith") / "helper")
    subprocess.run(
        ["gcc", "-O2", "-o", exe, src, "-ljpeg"], check=True
    )
    return exe


def _libjpeg_encode(helper, tmp, img, quality=75, sub=1, rst=0, prog=0):
    h, w = img.shape[:2]
    nc = 1 if img.ndim == 2 else 3
    raw = tmp / "t.raw"
    jpg = tmp / "t.jpg"
    raw.write_bytes(img.tobytes())
    subprocess.run(
        [helper, "enc", str(w), str(h), str(nc), str(quality), str(sub),
         str(rst), str(prog), str(raw), str(jpg)],
        check=True,
    )
    return jpg.read_bytes()


def _libjpeg_coefs(helper, tmp, payload: bytes):
    """(height_blocks, width_blocks, 64) int64 per component, via
    jpeg_read_coefficients."""
    jpg = tmp / "c.jpg"
    binf = tmp / "c.coef"
    jpg.write_bytes(payload)
    out = subprocess.run(
        [helper, "coef", str(jpg), str(binf)],
        check=True, capture_output=True, text=True,
    )
    lines = out.stdout.strip().split("\n")
    nc = int(lines[0])
    dims = [tuple(map(int, ln.split())) for ln in lines[1 : 1 + nc]]
    raw = np.frombuffer(binf.read_bytes(), dtype="<i2").astype(np.int64)
    comps, off = [], 0
    for _, wb, hb in dims:
        n = wb * hb * 64
        comps.append(raw[off : off + n].reshape(hb, wb, 64))
        off += n
    return comps


def _my_coefs(payload: bytes):
    comps, _, _, _, _ = _decode_to_coefficients(payload)
    return [c.coeffs.reshape(c.bh, c.bw, 64) for c in comps]


def _assert_coef_parity(helper, tmp, payload: bytes):
    ref = _libjpeg_coefs(helper, tmp, payload)
    mine = _my_coefs(payload)
    assert len(ref) == len(mine)
    for r, m in zip(ref, mine):
        # libjpeg reports actual block dims; this decoder's grid is
        # MCU-padded (the padding blocks are dummies coded in the stream)
        assert np.array_equal(m[: r.shape[0], : r.shape[1]], r)


def _noise(h, w, nc, seed):
    rng = np.random.default_rng(seed)
    shape = (h, w) if nc == 1 else (h, w, 3)
    return rng.integers(0, 256, shape, dtype=np.uint8)


def _smooth(h, w, nc):
    g = (np.add.outer(np.arange(h), np.arange(w)) % 256).astype(np.uint8)
    if nc == 1:
        return g
    return np.stack([(g.astype(np.int64) * s % 256).astype(np.uint8)
                     for s in (1, 2, 3)], axis=-1)


# ---------------------------------------------------------------------------
# the Table D.3 pin: our constants == the foreign implementation's
# ---------------------------------------------------------------------------


def test_qm_table_matches_system_libjpeg():
    so = _find_libjpeg()
    if so is None:
        pytest.skip("no libjpeg runtime on this box")
    data = open(so, "rb").read()
    # first entry packed as Qe<<16 | NMPS<<8 | SWITCH<<7 | NLPS, 64-bit
    first = (0x5A1D << 16) | (1 << 8) | (1 << 7) | 1
    idx = data.find(struct.pack("<Q", first))
    if idx < 0:
        pytest.skip("QM table not found in this libjpeg build")
    vals = struct.unpack_from("<114Q", data, idx)
    extracted = tuple(
        (v >> 16, (v >> 8) & 0x7F, v & 0x7F, (v >> 7) & 1) for v in vals
    )
    assert extracted == QM_TABLE


# ---------------------------------------------------------------------------
# raw QM coder round-trip (no JPEG structure): random decision streams
# with adaptive and fixed bins survive encode->flush->decode
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_qm_coder_roundtrip_random_decisions(seed):
    rng = np.random.default_rng(seed)
    # skewed bits stress the estimation state machine; a handful of bins
    bits = (rng.random(5000) < 0.9).astype(int).tolist()
    bins = rng.integers(0, 8, 5000).tolist()
    enc = QMEncoder()
    st_e = new_stats(8)
    for b, i in zip(bits, bins):
        enc.encode(st_e, i, b)
    stream = enc.flush()
    dec = QMDecoder(stream)
    st_d = new_stats(8)
    got = [dec.decode(st_d, i) for i in bins]
    assert got == bits
    assert bytes(st_e) == bytes(st_d)  # estimators stayed in lockstep


# ---------------------------------------------------------------------------
# self-consistency (no helper needed): entropy packaging is lossless
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("nc", [1, 3])
def test_arith_equals_baseline_equals_progressive(nc):
    img = _noise(33, 17, nc, seed=3)
    base = decode_jpeg(encode_jpeg(img, quality=75))
    arith = decode_jpeg(encode_jpeg(img, quality=75, arithmetic=True))
    prog = decode_jpeg(encode_jpeg(img, quality=75, progressive=True))
    assert np.array_equal(base, arith)
    assert np.array_equal(base, prog)


def test_arith_stream_markers_and_size():
    img = _smooth(64, 64, 1)
    huff = encode_jpeg(img, quality=75)
    arith = encode_jpeg(img, quality=75, arithmetic=True)
    assert b"\xff\xc9" in arith and b"\xff\xcc" in arith  # SOF9 + DAC
    assert b"\xff\xc4" not in arith  # no Huffman tables
    # adaptive QM coding beats this encoder's fixed-length Huffman tables
    assert len(arith) < len(huff)


def test_arith_restart_roundtrip():
    img = _noise(64, 48, 3, seed=4)
    jpg = encode_jpeg(img, quality=50, restart_interval=3, arithmetic=True)
    assert b"\xff\xd0" in jpg  # RST0 present
    assert np.array_equal(decode_jpeg(jpg), decode_jpeg(encode_jpeg(img)))


def test_progressive_arith_encode_declared():
    with pytest.raises(NotImplementedError, match="SOF10"):
        encode_jpeg(_noise(8, 8, 1, 0), arithmetic=True, progressive=True)


# ---------------------------------------------------------------------------
# foreign interop: decode libjpeg's arithmetic streams (SOF9 and SOF10)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "h,w,nc,q,sub,rst,prog",
    [
        (16, 16, 1, 75, 1, 0, 0),
        (33, 17, 1, 25, 1, 0, 0),   # partial MCUs
        (33, 17, 1, 95, 1, 2, 0),   # restarts
        (32, 24, 3, 75, 1, 0, 0),   # 4:4:4 color
        (32, 24, 3, 75, 2, 0, 0),   # 4:2:0 (dummy blocks in the stream)
        (33, 17, 3, 50, 2, 2, 0),   # 4:2:0 + partial MCU + restarts
        (16, 16, 1, 75, 1, 0, 1),   # SOF10 progressive gray
        (32, 24, 3, 75, 2, 0, 1),   # SOF10 progressive 4:2:0
        (33, 17, 3, 50, 2, 2, 1),   # SOF10 + restarts
    ],
)
def test_decode_libjpeg_arith_stream(helper, tmp_path, h, w, nc, q, sub,
                                     rst, prog):
    for img in (_noise(h, w, nc, seed=h * w + nc), _smooth(h, w, nc)):
        payload = _libjpeg_encode(
            helper, tmp_path, img, quality=q, sub=sub, rst=rst, prog=prog
        )
        marker = b"\xff\xca" if prog else b"\xff\xc9"
        assert marker in payload
        _assert_coef_parity(helper, tmp_path, payload)


# ---------------------------------------------------------------------------
# foreign interop: libjpeg decodes OUR arithmetic streams
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "h,w,nc,q,rst",
    [
        (16, 16, 1, 75, 0),
        (33, 17, 1, 25, 0),
        (32, 24, 3, 95, 0),
        (33, 17, 3, 50, 3),  # restarts
    ],
)
def test_libjpeg_decodes_our_arith_stream(helper, tmp_path, h, w, nc, q, rst):
    for img in (_noise(h, w, nc, seed=h + w + nc), _smooth(h, w, nc)):
        payload = encode_jpeg(
            img, quality=q, restart_interval=rst, arithmetic=True
        )
        _assert_coef_parity(helper, tmp_path, payload)


def test_pixels_match_libjpeg_within_idct_rounding(helper, tmp_path):
    """Full-pipeline sanity beside the exact coefficient pins: this
    decoder's float IDCT and libjpeg's integer islow IDCT may differ by a
    rounding step, never more."""
    img = _noise(32, 32, 1, seed=11)
    payload = _libjpeg_encode(helper, tmp_path, img, quality=75)
    mine = decode_jpeg(payload).astype(np.int64)
    jpg = tmp_path / "p.jpg"
    raw = tmp_path / "p.raw"
    jpg.write_bytes(payload)
    out = subprocess.run(
        [helper, "dec", str(jpg), str(raw)],
        check=True, capture_output=True, text=True,
    )
    w, h, nc = map(int, out.stdout.split())
    ref = np.frombuffer(raw.read_bytes(), dtype=np.uint8).reshape(
        h, w
    ).astype(np.int64)
    assert np.abs(mine - ref).max() <= 1
