"""Lossless JPEG (ITU-T T.81 process 14, SOF3) — from scratch on the
repo's own bit/Huffman layer (sparkfuse.jpeg).

Not JPEG-LS (that is ISO 14495/T.87): this is the original 1992 lossless
mode — per-sample spatial prediction (Annex H.1.2.1's seven predictors)
with the prediction ERROR entropy-coded through DC-style Huffman
categories (SSSS 0..16, SSSS=16 carrying no extra bits for the
half-range wrap), all arithmetic modulo 2^16 (H.1.2.1). It is the format
DNG/medical (DICOM) pipelines still ship, which is why a training-data
media path meets it.

Scope (named raises past it): Huffman entropy coding only (SOF3; the
SOF11 arithmetic variant stays a declared stub), sampling factors 1x1
(lossless streams in the wild are unsubsampled — subsampling would be
lossy), restart intervals rejected (T.81 H.2.2's reset wording is loose
enough that independent decoders disagree; with no lossless-capable
foreign decoder in this container — system libjpeg is API v62, lossless
landed in libjpeg-turbo 3.0 — we refuse rather than self-certify an
interpretation). Components are carried VERBATIM: lossless JPEG has no
YCbCr convention, so 3-component output is whatever the encoder stored
(typically RGB), returned unconverted.

Certification without a foreign decoder: the entropy layer and the
prediction chain are pinned by HAND-DERIVED bitstreams computed from the
T.81 text alone (tests/test_jpeg_lossless.py builds the golden bytes
with no calls into this module), plus exact round-trips across all seven
predictors, 8- and 16-bit precisions, the SSSS=16 wrap, and point
transforms. decode via the public `sparkfuse.jpeg.decode_jpeg`, which
dispatches SOF3 here.

Scale shape: identical to every other codec in the repo — decode is a
per-image kernel under `mapInPandas` over byte-bounded partitions
(multimodal.media_repartition_by_bytes); parallelism across images is
the throughput story, not per-image speed.
"""

from __future__ import annotations

import struct

import numpy as np

from sparkfuse.jpeg import (
    _BitReader,
    _BitWriter,
    _build_decode_lut,
    _dht_body,
    _scan_extent,
    _seg,
)

# Category code lengths for the difference alphabet 0..16: the classic
# lossless table (2,2,2 then 3..16) — Kraft-complete enough to be legal,
# short for the near-zero categories prediction makes dominant.
_LL_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1]
_LL_VALS = list(range(17))


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the JPEG canonical enumeration (C.2)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _predict(x: np.ndarray, predictor: int, default: int) -> np.ndarray:
    """Encoder-side prediction grid (int64): Annex H.1.2.1. First sample
    uses the default 2^(P-Pt-1); the rest of row 0 uses Ra; column 0 uses
    Rb; interior samples use the selected predictor."""
    h, w = x.shape
    xi = x.astype(np.int64)
    pred = np.empty((h, w), dtype=np.int64)
    pred[0, 0] = default
    if w > 1:
        pred[0, 1:] = xi[0, :-1]
    if h > 1:
        pred[1:, 0] = xi[:-1, 0]
    if h > 1 and w > 1:
        ra = xi[1:, :-1]
        rb = xi[:-1, 1:]
        rc = xi[:-1, :-1]
        if predictor == 1:
            p = ra
        elif predictor == 2:
            p = rb
        elif predictor == 3:
            p = rc
        elif predictor == 4:
            p = ra + rb - rc
        elif predictor == 5:
            p = ra + ((rb - rc) >> 1)
        elif predictor == 6:
            p = rb + ((ra - rc) >> 1)
        else:  # 7
            p = (ra + rb) >> 1
        pred[1:, 1:] = p
    return pred


def encode_jpeg_lossless(
    img: np.ndarray,
    predictor: int = 1,
    point_transform: int = 0,
    precision: int | None = None,
) -> bytes:
    """SOF3 bytes from integer samples: (H, W) or (H, W, C), C <= 4 (the
    scan-component limit). ``precision`` defaults to 8 for uint8 input and
    16 otherwise; ``point_transform`` (Pt) right-shifts samples by Pt
    before prediction, the spec's lossy-by-truncation knob — the decoder
    returns samples << Pt. Round-trip is bit-exact at Pt=0."""
    a = np.asarray(img)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or not (1 <= a.shape[2] <= 4):
        raise ValueError("expected (H, W) or (H, W, C<=4) samples")
    if not np.issubdtype(a.dtype, np.integer):
        raise ValueError("lossless JPEG takes integer samples")
    if precision is None:
        precision = 8 if a.dtype == np.uint8 else 16
    if not 2 <= precision <= 16:
        raise ValueError("precision must be in [2, 16]")
    if not 1 <= predictor <= 7:
        raise ValueError("predictor selector must be in [1, 7]")
    if not 0 <= point_transform < precision:
        raise ValueError("point transform must be in [0, precision)")
    if int(a.min()) < 0 or int(a.max()) >= (1 << precision):
        raise ValueError(f"samples out of range for {precision}-bit precision")
    h, w, nc = a.shape
    if h > 0xFFFF or w > 0xFFFF:
        raise ValueError("image dimensions exceed the 16-bit JPEG limit")
    pt = point_transform
    default = 1 << (precision - pt - 1)

    # per-component differences, modulo 2^16 (H.1.2.1), mapped to the
    # symmetric range so |d| <= 32768 and d = +/-32768 becomes SSSS 16
    shifted = (a.astype(np.int64) >> pt).transpose(2, 0, 1)
    diffs = np.empty((nc, h, w), dtype=np.int64)
    for c in range(nc):
        d = (shifted[c] - _predict(shifted[c], predictor, default)) & 0xFFFF
        diffs[c] = np.where(d >= 0x8000, d - 0x10000, d)

    codes = _canonical_codes(_LL_BITS, _LL_VALS)
    bw = _BitWriter()
    # MCU order with 1x1 factors: one sample per component, raster order
    seq = diffs.transpose(1, 2, 0).reshape(-1)
    mags = np.abs(seq)
    ssss = np.zeros(len(seq), dtype=np.int64)
    nzm = mags > 0
    ssss[nzm] = np.frexp(mags[nzm].astype(np.float64))[1]  # bit_length <= 16
    for d, s in zip(seq.tolist(), ssss.tolist()):
        code, length = codes[s]
        bw.put(code, length)
        if 0 < s < 16:  # SSSS 16 (|d| = 32768) carries no extra bits
            bw.put(d if d >= 0 else d + (1 << s) - 1, s)
    bw.pad_to_byte()

    sof = struct.pack(">BHHB", precision, h, w, nc) + b"".join(
        struct.pack(">BBB", c + 1, 0x11, 0) for c in range(nc)
    )
    sos = (
        bytes([nc])
        + b"".join(struct.pack(">BB", c + 1, 0x00) for c in range(nc))
        + bytes([predictor, 0, pt])
    )
    return (
        b"\xff\xd8"
        + _seg(0xC4, _dht_body(0, 0, _LL_BITS, _LL_VALS))
        + _seg(0xC3, sof)
        + _seg(0xDA, sos)
        + bytes(bw.out)
        + b"\xff\xd9"
    )


def _reconstruct(d: np.ndarray, predictor: int, default: int) -> np.ndarray:
    """Decoder-side inverse of `_predict`: rebuild the sample grid from
    differences, every addition modulo 2^16. Row 0 and column 0 follow the
    fixed Ra/Rb rules; predictors 1-3 reconstruct vectorized (cumsum /
    shifted-row adds), 4-7 need Ra of the row being built, so those run a
    per-row scalar walk."""
    h, w = d.shape
    du = d.astype(np.uint16)  # mod-2^16 arithmetic for free
    r = np.empty((h, w), dtype=np.uint16)
    row0 = du[0].copy()
    row0[0] = (int(row0[0]) + default) & 0xFFFF
    r[0] = np.cumsum(row0, dtype=np.uint16)
    if predictor == 2:  # Rb everywhere below row 0: column cumsum
        r[1:] = du[1:]
        np.cumsum(r, axis=0, dtype=np.uint16, out=r)
        return r
    for y in range(1, h):
        prev = r[y - 1]
        if predictor == 1:
            row = du[y].copy()
            row[0] = (int(row[0]) + int(prev[0])) & 0xFFFF  # column 0: Rb
            r[y] = np.cumsum(row, dtype=np.uint16)
        elif predictor == 3:
            r[y, 0] = (int(prev[0]) + int(du[y, 0])) & 0xFFFF
            r[y, 1:] = prev[:-1] + du[y, 1:]
        else:
            ri = r[y]
            ri[0] = (int(prev[0]) + int(du[y, 0])) & 0xFFFF
            pv = prev.astype(np.int64)
            dy = d[y]
            ra = int(ri[0])
            for x in range(1, w):
                rb = int(pv[x])
                rc = int(pv[x - 1])
                if predictor == 4:
                    p = ra + rb - rc
                elif predictor == 5:
                    p = ra + ((rb - rc) >> 1)
                elif predictor == 6:
                    p = rb + ((ra - rc) >> 1)
                else:
                    p = (ra + rb) >> 1
                ra = (p + int(dy[x])) & 0xFFFF
                ri[x] = ra
    return r


def decode_jpeg_lossless(payload: bytes) -> np.ndarray:
    """Exact samples from SOF3 bytes: (H, W) for one component, else
    (H, W, C) carried verbatim (no color transform — see module
    docstring). dtype uint8 when precision <= 8, else uint16; a nonzero
    point transform comes back as reconstructed << Pt."""
    buf = bytes(payload)
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    htables: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    precision = W = H = None
    comp_ids: list[int] = []
    comp_tbl: dict[int, int] = {}
    restart_interval = 0
    scan = None
    i = 2
    while i + 1 < len(buf):
        if buf[i] != 0xFF:
            raise ValueError(f"bad marker alignment at byte {i}")
        m = buf[i + 1]
        if m == 0xFF:  # fill byte (B.1.1.2): any marker may be 0xFF-padded
            i += 1
            continue
        if m == 0xD9:
            break
        if m == 0x01 or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        if i + 4 > len(buf):
            raise ValueError("truncated JPEG segment header")
        (seglen,) = struct.unpack(">H", buf[i + 2 : i + 4])
        body = buf[i + 4 : i + 2 + seglen]
        if m == 0xC3:
            if precision is not None:
                raise ValueError("multiple SOF segments")
            precision = body[0]
            if not 2 <= precision <= 16:
                raise ValueError(f"bad lossless precision {precision}")
            H, W = struct.unpack(">HH", body[1:5])
            nc = body[5]
            for c in range(nc):
                cid, samp = body[6 + 3 * c], body[7 + 3 * c]
                if samp != 0x11:
                    raise NotImplementedError(
                        "subsampled lossless JPEG (1x1 factors only)"
                    )
                comp_ids.append(cid)
        elif m in (0xC7, 0xCB, 0xCF):
            raise NotImplementedError(
                "arithmetic/differential lossless JPEG (Huffman SOF3 only)"
            )
        elif m == 0xC4:
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 15
                bits = list(body[j + 1 : j + 17])
                nv = sum(bits)
                if tc == 0:
                    htables[th] = _build_decode_lut(
                        bits, list(body[j + 17 : j + 17 + nv])
                    )
                j += 17 + nv
        elif m == 0xDD:
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif m == 0xDA:
            if precision is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            if ns != len(comp_ids):
                raise NotImplementedError(
                    "multi-scan lossless JPEG (one interleaved scan only)"
                )
            for s in range(ns):
                cs, tt = body[1 + 2 * s], body[2 + 2 * s]
                if cs not in comp_ids:
                    raise ValueError(f"scan references unknown component {cs}")
                comp_tbl[cs] = tt >> 4
            predictor = body[1 + 2 * ns]
            se, ahal = body[2 + 2 * ns], body[3 + 2 * ns]
            if not 1 <= predictor <= 7 or se != 0:
                raise ValueError(f"bad lossless scan header Ss={predictor} Se={se}")
            pt = ahal & 15
            data_end = _scan_extent(buf, i + 2 + seglen)
            scan = (predictor, pt, buf[i + 2 + seglen : data_end])
            i = data_end
            continue
        i += 2 + seglen
    if scan is None:
        raise ValueError("JPEG stream has no scan data")
    predictor, pt, data = scan
    if restart_interval and b"\xff" in data:
        for j in range(len(data) - 1):
            if data[j] == 0xFF and 0xD0 <= data[j + 1] <= 0xD7:
                raise NotImplementedError(
                    "restart intervals in lossless JPEG (decoders disagree "
                    "on the H.2.2 reset; re-encode without DRI)"
                )
    if pt >= precision:
        raise ValueError("point transform >= precision")
    nc = len(comp_ids)
    luts = []
    for cid in comp_ids:
        t = htables.get(comp_tbl.get(cid, 0))
        if t is None:
            raise ValueError("scan references undefined Huffman table")
        luts.append(t)

    rdr = _BitReader(data.replace(b"\xff\x00", b"\xff"))
    n = H * W
    diffs = np.empty((n, nc), dtype=np.int64)
    for k in range(n):
        row = diffs[k]
        for c in range(nc):
            sym, ln = luts[c]
            s = rdr.decode(sym, ln)
            if s == 16:
                row[c] = 32768
            elif s > 16:
                raise ValueError(f"bad difference category {s}")
            else:
                row[c] = rdr.receive_extend(s)

    default = 1 << (precision - pt - 1)
    planes = [
        _reconstruct(diffs[:, c].reshape(H, W), predictor, default)
        for c in range(nc)
    ]
    out = planes[0] if nc == 1 else np.stack(planes, axis=-1)
    out = out.astype(np.uint32) << pt
    return out.astype(np.uint8 if precision <= 8 else np.uint16)
