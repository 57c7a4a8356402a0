"""From-scratch JPEG codec (baseline, progressive AND arithmetic-coded) —
no codec library required.

Closes the JPEG entries on the declared-stub list (rounds 3-5: "JPEG needs
a codec library this container doesn't ship"): everything DCT-mode JPEG
actually needs is integer/float math and bit twiddling, all implemented
here from the public specification (ITU-T T.81 / ISO 10918-1).

Scope (validated; everything else fails loudly rather than mis-decoding):

  * decode: baseline sequential DCT (SOF0/SOF1), progressive DCT
    (SOF2 — spectral selection, successive approximation with DC/AC
    refinement and EOB runs, per T.81 G.2), AND the arithmetic-coded
    modes SOF9 (sequential) / SOF10 (progressive) via the QM coder in
    jpegarith.py (T.81 Annexes D/F/G, DAC conditioning honored) — every
    arithmetic decode path is interop-certified bit-exactly at the
    quantized-coefficient level against the system libjpeg-turbo
    (tests/test_jpeg_arith.py). 8-bit precision, grayscale and
    3-component YCbCr with any integer subsampling ratio (4:4:4, 4:2:2,
    4:2:0 — box/replication upsampling), interleaved or single-component
    scans, restart intervals, arbitrary DQT/DHT tables (16-bit quantizers
    included). Huffman LOSSLESS (SOF3) streams dispatch to the
    sparkfuse.jpegll decoder (T.81 process 14 — exact samples, see that
    module); only arithmetic-lossless (SOF11), hierarchical and
    differential modes raise NotImplementedError by name. Foreign
    progressive goldens: the Spark
    distribution's mllib grayscale.jpg and the nodejs doc white-stripe
    images (tests/test_jpeg.py — content-predictable + CRC-pinned).
  * encode: baseline sequential, grayscale or RGB (always 4:4:4 — chroma
    subsampling is deliberately NOT offered on the encode side because it
    is not integer-exact, the same policy as the Y4M codec's Cmono/C444
    restriction); ``progressive=True`` emits a SOF2 successive-
    approximation scan script over the SAME quantized coefficients
    (progressive is entropy packaging, not extra loss — decodes agree
    bit-for-bit with baseline, which the tests pin); ``arithmetic=True``
    emits SOF9 with default DAC conditioning, same coefficients again,
    and the streams decode bit-identically in libjpeg. Quantization
    tables are this library's own frequency-ramped tables scaled by the
    common 5000/q // 200-2q quality rule; Huffman tables are fixed-length
    canonical tables (DC: 12 symbols @5 bits, AC: 162 symbols @8 bits)
    written into DHT like any other — T.81 permits arbitrary tables, and
    fixed lengths keep the encoder a single pass. The DECODER takes
    whatever tables the file declares (the foreign CPython-test-suite
    golden ships optimized tables), so decode generality does not rest on
    the encoder's choices.

Exactness contract (what the driver's oracle leans on): an image made of
constant 8x8 blocks whose values are EVEN round-trips bit-exactly at the
default quality — the DCT of a constant block is DC-only with DC =
8*(v-128), the default table's q[0][0] = 16 divides it, and every AC
coefficient quantizes to zero — so ``synth_jpeg_media``'s decoded stats
are recomputable by pure generation arithmetic, the same oracle contract
as the WAV/PPM/PNG/Y4M paths. General images round-trip within the
quantization error bound; the entropy+zigzag+DPCM layers are pinned
losslessly by coefficient-level equality tests, and the IDCT against the
textbook double-sum definition.

Speed shape: Huffman coding is the only per-symbol Python loop (a 16-bit
lookahead LUT resolves every code in one table hit); DCT/IDCT, dequant,
level shift, upsampling and color transform are whole-component numpy.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constant tables
# ---------------------------------------------------------------------------


def _zigzag() -> np.ndarray:
    """Natural (row-major) index for each zigzag position, generated from
    the traversal rule rather than hand-typed."""
    order = []
    for s in range(15):
        ys = range(s, -1, -1) if s % 2 == 0 else range(s + 1)
        for y in ys:
            x = s - y
            if y < 8 and x < 8:
                order.append(y * 8 + x)
    return np.array(order, dtype=np.int64)


ZIGZAG = _zigzag()  # zigzag position -> natural index
UNZIGZAG = np.argsort(ZIGZAG)  # natural index -> zigzag position

# this library's base quantization tables (quality 50). q[0][0]=16 is the
# exactness anchor (see module docstring); the ramp mirrors the perceptual
# low-to-high-frequency shape without copying Annex K's suggested values.
_uv = np.add.outer(np.arange(8), np.arange(8))
BASE_QUANT_LUMA = (16 + 6 * _uv).clip(1, 255).astype(np.int64)
BASE_QUANT_CHROMA = (17 + 9 * _uv).clip(1, 255).astype(np.int64)
del _uv

# orthonormal DCT-II basis: S = M @ s @ M.T, s = M.T @ S @ M
_M = np.cos((2 * np.arange(8)[None, :] + 1) * np.arange(8)[:, None] * np.pi / 16)
_M *= 0.5
_M[0] *= 1 / np.sqrt(2.0)

# fixed-length canonical Huffman tables for the ENCODER (decoder reads DHT):
# DC symbols 0..11 all 5 bits, AC symbols all 8 bits. Canonical code of the
# i-th symbol at a single length is simply i.
_DC_BITS = [0] * 16
_DC_BITS[4] = 12  # 12 codes of length 5 (BITS is 1-indexed by length)
_DC_VALS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_AC_BITS = [0] * 16
_AC_BITS[7] = len(_AC_SYMBOLS)  # 162 codes of length 8
_AC_VALS = list(_AC_SYMBOLS)


def quality_scaled_tables(quality: int = 50) -> tuple[np.ndarray, np.ndarray]:
    """(luma, chroma) quant tables at ``quality`` via the common mapping:
    scale = 5000/q for q<50 else 200-2q; t' = clip((t*scale+50)//100, 1, 255).
    quality=50 returns the base tables unchanged (scale=100)."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be in 1..100, got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (BASE_QUANT_LUMA, BASE_QUANT_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


# ---------------------------------------------------------------------------
# block <-> plane helpers (whole-component numpy)
# ---------------------------------------------------------------------------


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) with H,W multiples of 8 -> (n_blocks, 8, 8) in raster order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _from_blocks(blocks: np.ndarray, h8: int, w8: int) -> np.ndarray:
    return (
        blocks.reshape(h8 // 8, w8 // 8, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(h8, w8)
    )


def _fdct(blocks: np.ndarray) -> np.ndarray:
    return np.einsum("ux,nxy,vy->nuv", _M, blocks, _M, optimize=True)


def _idct(blocks: np.ndarray) -> np.ndarray:
    return np.einsum("ux,nuv,vy->nxy", _M, blocks, _M, optimize=True)


# ---------------------------------------------------------------------------
# bit I/O + Huffman
# ---------------------------------------------------------------------------


class _BitWriter:
    """MSB-first bit accumulator with 0xFF byte stuffing (F.1.2.3)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def pad_to_byte(self) -> None:
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s


def _build_decode_lut(bits: list[int], vals: list[int]) -> tuple[np.ndarray, np.ndarray]:
    """16-bit-lookahead LUT for a DHT table: peek 16 bits -> (symbol, code
    length). Every legal code is <=16 bits so there is no slow path; unused
    prefixes keep length 0 and decoding one raises (corrupt stream)."""
    sym = np.zeros(1 << 16, dtype=np.uint8)
    ln = np.zeros(1 << 16, dtype=np.uint8)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = lo + (1 << (16 - length))
            sym[lo:hi] = vals[k]
            ln[lo:hi] = length
            code += 1
            k += 1
        code <<= 1
    return sym, ln


class _BitReader:
    """MSB-first reader over de-stuffed entropy bytes."""

    __slots__ = ("buf", "pos", "acc", "n")

    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self, want: int) -> None:
        buf, pos = self.buf, self.pos
        while self.n < want:
            # past the end: T.81 pads with 1-bits (the EOB-run of a truncated
            # but decodable stream); genuinely missing data surfaces as a
            # corrupt-code error instead of an IndexError
            b = buf[pos] if pos < len(buf) else 0xFF
            pos += 1
            self.acc = (self.acc << 8) | b
            self.n += 8
        self.pos = pos

    def decode(self, sym: np.ndarray, ln: np.ndarray) -> int:
        self._fill(16)
        peek = (self.acc >> (self.n - 16)) & 0xFFFF
        length = int(ln[peek])
        if length == 0:
            raise ValueError("corrupt JPEG entropy stream (undefined Huffman code)")
        self.n -= length
        self.acc &= (1 << self.n) - 1
        return int(sym[peek])

    def receive(self, size: int) -> int:
        """Raw unsigned bits (progressive EOBRUN lengths / correction and
        sign bits read outside the EXTEND procedure)."""
        if size == 0:
            return 0
        self._fill(size)
        v = (self.acc >> (self.n - size)) & ((1 << size) - 1)
        self.n -= size
        self.acc &= (1 << self.n) - 1
        return v

    def receive_extend(self, size: int) -> int:
        if size == 0:
            return 0
        v = self.receive(size)
        if v < (1 << (size - 1)):  # negative branch (F.2.2.1 EXTEND)
            v -= (1 << size) - 1
        return v


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.clip(np.rint(np.stack([y, cb, cr], axis=-1)), 0, 255)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = (ycc[..., i].astype(np.float64) for i in range(3))
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def _pad_edge8(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, -h % 8), (0, -w % 8)), mode="edge")


_DC_ENC_LEN = 5
_AC_ENC_LEN = 8
_AC_ENC_CODE = {s: i for i, s in enumerate(_AC_SYMBOLS)}


def _encode_block_coeffs(w: _BitWriter, zz: np.ndarray, pred: int) -> int:
    """Entropy-encode one quantized block given in zigzag order; returns the
    new DC predictor."""
    dc = int(zz[0])
    diff = dc - pred
    size = abs(diff).bit_length()
    w.put(size, _DC_ENC_LEN)  # canonical code of symbol `size` IS `size`
    if size:
        w.put(diff if diff >= 0 else diff + (1 << size) - 1, size)
    nz = np.nonzero(zz[1:])[0]
    prev = 0
    for i in nz:
        run = int(i) - prev
        prev = int(i) + 1
        while run >= 16:
            w.put(_AC_ENC_CODE[0xF0], _AC_ENC_LEN)  # ZRL
            run -= 16
        v = int(zz[1 + i])
        size = abs(v).bit_length()
        w.put(_AC_ENC_CODE[(run << 4) | size], _AC_ENC_LEN)
        w.put(v if v >= 0 else v + (1 << size) - 1, size)
    if prev < 63:
        w.put(_AC_ENC_CODE[0x00], _AC_ENC_LEN)  # EOB
    return dc


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, 2 + len(body)) + body


def _encode_progressive_scans(comp_zz: list[np.ndarray], nc: int) -> bytes:
    """Successive-approximation scan script over the already-quantized
    zigzag coefficients (T.81 G.1.2; control flow mirrors the spec's
    reference flow): DC first (interleaved, Al=1) → AC first bands 1-5 and
    6-63 per component at Al=1 → DC refine → AC refine bands. EOB runs are
    emitted per block (run length 1) because the sequential Huffman tables
    this encoder ships define no EOBn symbols — legal, and the decoder's
    multi-block EOBRUN path is exercised by foreign progressive files
    instead. Progressive is pure entropy packaging: the coefficients coded
    here are identical to the baseline scan's, so decodes must agree
    bit-for-bit."""
    out = bytearray()
    n_blocks = comp_zz[0].shape[0]
    AL = 1  # one successive-approximation level

    def sos(comp_ids, ss, se, ah, al):
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0x00])
        body += bytes([ss, se, (ah << 4) | al])
        return _seg(0xDA, body)

    # DC first scan: DPCM over (DC >> Al), interleaved across components
    out += sos([ci + 1 for ci in range(nc)], 0, 0, 0, AL)
    wtr = _BitWriter()
    preds = [0] * nc
    for m in range(n_blocks):
        for ci in range(nc):
            v = int(comp_zz[ci][m][0]) >> AL
            diff = v - preds[ci]
            preds[ci] = v
            size = abs(diff).bit_length()
            wtr.put(size, _DC_ENC_LEN)
            if size:
                wtr.put(diff if diff >= 0 else diff + (1 << size) - 1, size)
    wtr.pad_to_byte()
    out += wtr.out

    # AC first scans: band magnitudes at Al, zero-run coded, EOB per block
    for ss, se in ((1, 5), (6, 63)):
        for ci in range(nc):
            out += sos([ci + 1], ss, se, 0, AL)
            wtr = _BitWriter()
            for m in range(n_blocks):
                zz = comp_zz[ci][m]
                r = 0
                for k in range(ss, se + 1):
                    v = int(zz[k])
                    t = abs(v) >> AL
                    if t == 0:
                        r += 1
                        continue
                    while r >= 16:
                        wtr.put(_AC_ENC_CODE[0xF0], _AC_ENC_LEN)
                        r -= 16
                    size = t.bit_length()
                    wtr.put(_AC_ENC_CODE[(r << 4) | size], _AC_ENC_LEN)
                    tv = t if v >= 0 else -t
                    wtr.put(tv if tv >= 0 else tv + (1 << size) - 1, size)
                    r = 0
                if r:
                    wtr.put(_AC_ENC_CODE[0x00], _AC_ENC_LEN)  # EOB
            wtr.pad_to_byte()
            out += wtr.out

    # DC refinement: one raw bit (bit Al-1 of each DC) per block
    out += sos([ci + 1 for ci in range(nc)], 0, 0, AL, 0)
    wtr = _BitWriter()
    for m in range(n_blocks):
        for ci in range(nc):
            wtr.put(int(comp_zz[ci][m][0]) & 1, 1)
    wtr.pad_to_byte()
    out += wtr.out

    # AC refinement: newly-significant coefficients as (zero-history-run,
    # ±1) pairs; correction bits for already-significant ones buffered and
    # flushed after the next symbol (G.1.2.3 ordering)
    for ss, se in ((1, 5), (6, 63)):
        for ci in range(nc):
            out += sos([ci + 1], ss, se, AL, 0)
            wtr = _BitWriter()
            for m in range(n_blocks):
                zz = comp_zz[ci][m]
                t = [abs(int(zz[k])) for k in range(ss, se + 1)]
                pos = [int(zz[k]) >= 0 for k in range(ss, se + 1)]
                eobpos = -1
                for i2, tv in enumerate(t):
                    if tv == 1:
                        eobpos = i2
                r = 0
                br: list[int] = []
                for i2, tv in enumerate(t):
                    if tv == 0:
                        r += 1
                        continue
                    while r > 15 and i2 <= eobpos:
                        wtr.put(_AC_ENC_CODE[0xF0], _AC_ENC_LEN)
                        r -= 16
                        for bit in br:
                            wtr.put(bit, 1)
                        br = []
                    if tv > 1:  # already significant: correction bit
                        br.append(tv & 1)
                        continue
                    wtr.put(_AC_ENC_CODE[(r << 4) | 1], _AC_ENC_LEN)
                    wtr.put(1 if pos[i2] else 0, 1)
                    for bit in br:
                        wtr.put(bit, 1)
                    br = []
                    r = 0
                if r > 0 or br:
                    wtr.put(_AC_ENC_CODE[0x00], _AC_ENC_LEN)
                    for bit in br:
                        wtr.put(bit, 1)
            wtr.pad_to_byte()
            out += wtr.out
    return bytes(out)


def _dht_body(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    return bytes([(tc << 4) | th] + bits + vals)


def encode_jpeg(
    img: np.ndarray,
    quality: int = 50,
    restart_interval: int = 0,
    progressive: bool = False,
    arithmetic: bool = False,
) -> bytes:
    """JFIF bytes from uint8 pixels: (H, W) grayscale or (H, W, 3) RGB
    (encoded 4:4:4 — no chroma subsampling, see module docstring).
    ``restart_interval`` > 0 emits RSTn markers every that many MCUs
    (baseline or arithmetic). ``progressive=True`` emits SOF2 with a
    successive-approximation scan script (DC first Al=1 → AC first bands
    1-5/6-63 per component at Al=1 → DC refine → AC refine bands), which
    exercises every progressive decode path; the quantized coefficients are
    IDENTICAL to the baseline encoding at the same quality — progressive is
    entropy packaging, not extra loss — so progressive-decode ≡
    baseline-decode bit-exactly for the same input. ``arithmetic=True``
    emits SOF9 (sequential, T.81 Annex D/F QM coding, default DAC
    conditioning) — like progressive, pure entropy packaging over the same
    coefficients; streams interop with libjpeg both ways
    (tests/test_jpeg_arith.py)."""
    a = np.asarray(img)
    if a.dtype != np.uint8:
        raise ValueError(f"expected uint8 pixels, got {a.dtype}")
    if a.ndim == 2:
        planes = [a.astype(np.float64)]
    elif a.ndim == 3 and a.shape[2] == 3:
        ycc = _rgb_to_ycbcr(a)
        planes = [ycc[..., i] for i in range(3)]
    else:
        raise ValueError(f"expected (H,W) gray or (H,W,3) RGB, got {a.shape}")
    h, w = a.shape[:2]
    if h < 1 or w < 1 or h > 65535 or w > 65535:
        raise ValueError(f"bad image dims {a.shape}")
    qluma, qchroma = quality_scaled_tables(quality)
    qtabs = [qluma] if len(planes) == 1 else [qluma, qchroma]

    # quantized zigzag coefficients per component (vectorized to the
    # entropy-coder boundary)
    comp_zz = []
    for ci, plane in enumerate(planes):
        blocks = _to_blocks(_pad_edge8(plane) - 128.0)
        coef = _fdct(blocks)
        q = qtabs[min(ci, 1)].astype(np.float64)
        zz = np.rint(coef / q).astype(np.int64).reshape(-1, 64)[:, ZIGZAG]
        comp_zz.append(zz)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for ti, q in enumerate(qtabs):
        out += _seg(
            0xDB, bytes([ti]) + bytes(q.reshape(64)[ZIGZAG].astype(np.uint8))
        )
    nc = len(planes)
    if progressive and arithmetic:
        raise NotImplementedError(
            "JPEG arithmetic-coded progressive (SOF10) encode unsupported"
        )
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, min(ci, 1)])  # 4:4:4, table 0/1
    if arithmetic:
        out += _seg(0xC9, sof)
    else:
        out += _seg(0xC2 if progressive else 0xC0, sof)
        out += _seg(0xC4, _dht_body(0, 0, _DC_BITS, _DC_VALS))
        out += _seg(0xC4, _dht_body(1, 0, _AC_BITS, _AC_VALS))
    if progressive:
        if restart_interval:
            raise ValueError(
                "restart_interval is a baseline-only option here"
            )
        out += _encode_progressive_scans(comp_zz, nc)
        out += b"\xff\xd9"  # EOI
        return bytes(out)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    if arithmetic:
        out += _encode_arith_scan(comp_zz, nc, restart_interval)
        out += b"\xff\xd9"  # EOI
        return bytes(out)
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0 for every comp
    sos += b"\x00\x3f\x00"
    out += _seg(0xDA, sos)

    n_mcus = ((h + 7) // 8) * ((w + 7) // 8)
    preds = [0] * nc
    wtr = _BitWriter()
    rst = 0
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            wtr.pad_to_byte()
            out += wtr.out
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            wtr = _BitWriter()
            preds = [0] * nc
        for ci in range(nc):
            preds[ci] = _encode_block_coeffs(wtr, comp_zz[ci][m], preds[ci])
    wtr.pad_to_byte()
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _encode_arith_scan(
    comp_zz: list[np.ndarray], nc: int, restart_interval: int
) -> bytes:
    """DAC + SOS + QM-coded entropy data for one interleaved sequential
    scan over 4:4:4 zigzag coefficients (T.81 F.1.4.4): entropy table 0
    for luma, 1 for chroma (each with its own adaptive statistics, reset
    at restarts), default conditioning (L=0, U=1, Kx=5)."""
    from sparkfuse import jpegarith as ja

    tids = [0 if ci == 0 else 1 for ci in range(nc)]
    dac = b""
    for t in sorted(set(tids)):
        dac += bytes([t, (ja.DEFAULT_DC_U << 4) | ja.DEFAULT_DC_L])
        dac += bytes([0x10 | t, ja.DEFAULT_AC_KX])
    out = bytearray(_seg(0xCC, dac))
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, (tids[ci] << 4) | tids[ci]])
    sos += b"\x00\x3f\x00"
    out += _seg(0xDA, sos)

    n_mcus = comp_zz[0].shape[0]
    ntab = len(set(tids))

    def fresh():
        return (
            ja.QMEncoder(),
            [ja.new_stats(ja.DC_STAT_BINS) for _ in range(ntab)],
            [ja.new_stats(ja.AC_STAT_BINS) for _ in range(ntab)],
            ja.fixed_bin(),
            [ja.SeqCompState() for _ in range(nc)],
        )

    enc, dc_stats, ac_stats, fixed, states = fresh()
    rst = 0
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            out += enc.flush()
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            enc, dc_stats, ac_stats, fixed, states = fresh()
        for ci in range(nc):
            t = tids[ci]
            zz = [int(v) for v in comp_zz[ci][m]]
            ja.encode_dc(
                enc, dc_stats[t], states[ci], zz[0],
                ja.DEFAULT_DC_L, ja.DEFAULT_DC_U,
            )
            ja.encode_ac_seq(enc, ac_stats[t], fixed, zz, ja.DEFAULT_AC_KX)
    out += enc.flush()
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

_SOF_UNSUPPORTED = {
    0xC3: "lossless sequential (SOF3)",
    0xC5: "differential sequential (SOF5)",
    0xC6: "differential progressive (SOF6)",
    0xC7: "differential lossless (SOF7)",
    0xCB: "arithmetic-coded lossless (SOF11)",
    0xCD: "differential arithmetic sequential (SOF13)",
    0xCE: "differential arithmetic progressive (SOF14)",
    0xCF: "differential arithmetic lossless (SOF15)",
}


class _Component:
    __slots__ = (
        "cid", "h", "v", "tq", "dc_tbl", "ac_tbl", "pred", "coeffs",
        "bw", "bh",   # allocated (MCU-padded) block grid dims
        "nbw", "nbh",  # actual block dims (ceil of component size / 8)
        "dc_tid", "ac_tid",  # entropy table IDS (arithmetic conditioning)
    )


def _scan_extent(buf: bytes, start: int) -> int:
    """Index just past the entropy-coded data beginning at ``start`` (the
    byte after the SOS header): stops at the first marker that is neither a
    stuffed 0x00 nor a restart."""
    i = start
    n = len(buf)
    while True:
        j = buf.find(b"\xff", i)
        if j < 0 or j + 1 >= n:
            return n
        nxt = buf[j + 1]
        if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
            i = j + 2
            continue
        return j


def _restart_intervals(data: bytes) -> list[bytes]:
    """Split entropy data at RSTn markers (predictors/EOB runs reset per
    interval); stuffed FF00 pairs are skipped, not split."""
    intervals = []
    start = 0
    i = 0
    while i < len(data) - 1:
        if data[i] == 0xFF and 0xD0 <= data[i + 1] <= 0xD7:
            intervals.append(data[start:i])
            start = i + 2
            i += 2
        elif data[i] == 0xFF and data[i + 1] == 0x00:
            i += 2
        else:
            i += 1
    intervals.append(data[start:])
    return intervals


def _alloc_progressive(comps: list["_Component"], W: int, H: int) -> None:
    """Allocate every component's coefficient grid once, before the first
    progressive scan: MCU-padded dims for interleaved DC scans, with the
    actual (ceil size / 8) dims kept separately for the non-interleaved
    scans that iterate only real blocks (A.2.2 vs A.2.3 geometry)."""
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    mcux = (W + 8 * hmax - 1) // (8 * hmax)
    mcuy = (H + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        c.bw = mcux * c.h
        c.bh = mcuy * c.v
        cw = (W * c.h + hmax - 1) // hmax
        ch = (H * c.v + vmax - 1) // vmax
        c.nbw = (cw + 7) // 8
        c.nbh = (ch + 7) // 8
        c.coeffs = np.zeros((c.bh * c.bw, 64), dtype=np.int64)
        c.pred = 0


def _decode_progressive_scan(
    data: bytes,
    comps: list["_Component"],
    ss: int,
    se: int,
    ah: int,
    al: int,
    restart_interval: int,
) -> None:
    """One progressive scan (T.81 G.2): DC first/refine (interleaved or
    not), AC first with EOB runs, AC refinement with correction bits. The
    AC refinement loop follows the spec's G.1.2.3 control flow: newly
    significant coefficients arrive as (run, ±1<<Al) pairs whose run counts
    only ZERO-HISTORY positions, while every nonzero-history coefficient
    crossed on the way emits one correction bit; EOB runs then carry
    correction bits for the remainder of each block in the run."""
    zig = ZIGZAG
    dc_scan = ss == 0
    if dc_scan and se != 0:
        raise ValueError("progressive DC scan with Se != 0")
    if not dc_scan and len(comps) != 1:
        raise ValueError("progressive AC scan must be single-component")
    if not dc_scan and ss > se or se > 63:
        raise ValueError(f"bad spectral band {ss}..{se}")
    for c in comps:
        if dc_scan and ah == 0 and c.dc_tbl is None:
            raise ValueError("DC scan references undefined Huffman table")
        if not dc_scan and c.ac_tbl is None:
            raise ValueError("AC scan references undefined Huffman table")

    interleaved = dc_scan and len(comps) > 1
    if interleaved:
        mcux = comps[0].bw // comps[0].h
        n_units = mcux * (comps[0].bh // comps[0].v)
    else:
        c = comps[0]
        mcux = c.nbw
        n_units = c.nbw * c.nbh

    intervals = _restart_intervals(data)
    if restart_interval:
        expect = (n_units + restart_interval - 1) // restart_interval
        if len(intervals) != expect:
            raise ValueError(
                f"restart-marker count mismatch: {len(intervals)} intervals "
                f"for {n_units} units at DRI {restart_interval}"
            )

    p1 = 1 << al
    band = [int(zig[k]) for k in range(ss, se + 1)] if not dc_scan else []
    m = 0
    for interval in intervals:
        rdr = _BitReader(interval.replace(b"\xff\x00", b"\xff"))
        eobrun = 0
        for c in comps:
            c.pred = 0
        upper = (
            min(m + restart_interval, n_units) if restart_interval else n_units
        )
        while m < upper:
            my, mx = divmod(m, mcux)
            if dc_scan:
                for c in comps:
                    for b in range(c.h * c.v if interleaved else 1):
                        if interleaved:
                            by, bx = divmod(b, c.h)
                            bi = (my * c.v + by) * c.bw + mx * c.h + bx
                        else:
                            bi = my * c.bw + mx
                        blk = c.coeffs[bi]
                        if ah == 0:
                            dsym, dlen = c.dc_tbl
                            size = rdr.decode(dsym, dlen)
                            c.pred += rdr.receive_extend(size)
                            blk[0] = c.pred << al
                        else:
                            blk[0] |= rdr.receive(1) << al
            else:
                c = comps[0]
                blk = c.coeffs[my * c.bw + mx]
                asym, alen = c.ac_tbl
                if ah == 0:
                    # AC first scan: coefficient magnitudes at this
                    # approximation level, EOB-run coded
                    if eobrun:
                        eobrun -= 1
                    else:
                        k = 0
                        nb = len(band)
                        while k < nb:
                            sym = rdr.decode(asym, alen)
                            r, s = sym >> 4, sym & 15
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                eobrun = (1 << r) - 1
                                if r:
                                    eobrun += rdr.receive(r)
                                break
                            k += r
                            if k >= nb:
                                raise ValueError("AC run past band end")
                            blk[band[k]] = rdr.receive_extend(s) << al
                            k += 1
                else:
                    # AC refinement
                    k = 0
                    nb = len(band)
                    if eobrun == 0:
                        while k < nb:
                            sym = rdr.decode(asym, alen)
                            r, s = sym >> 4, sym & 15
                            newval = 0
                            if s == 0:
                                if r != 15:
                                    eobrun = 1 << r
                                    if r:
                                        eobrun += rdr.receive(r)
                                    break
                                # r == 15: skip 16 zero-history positions
                            else:
                                if s != 1:
                                    raise ValueError(
                                        "AC refinement symbol with s != 1"
                                    )
                                newval = p1 if rdr.receive(1) else -p1
                            while k < nb:
                                z = band[k]
                                if blk[z] != 0:
                                    if rdr.receive(1) and not (blk[z] & p1):
                                        blk[z] += p1 if blk[z] > 0 else -p1
                                else:
                                    if r == 0:
                                        break
                                    r -= 1
                                k += 1
                            if newval and k < nb:
                                blk[band[k]] = newval
                            k += 1
                    if eobrun > 0:
                        # rest of this block: correction bits only
                        while k < nb:
                            z = band[k]
                            if blk[z] != 0:
                                if rdr.receive(1) and not (blk[z] & p1):
                                    blk[z] += p1 if blk[z] > 0 else -p1
                            k += 1
                        eobrun -= 1
            m += 1


def _decode_to_coefficients(payload: bytes):
    """Parse + entropy-decode a baseline JPEG down to DEQUANTIZED-ready
    state: returns (components, W, H, adobe_transform) where each component
    carries its quantized coefficient grid (bh*bw, 64) in natural order and
    its quant table id. Split out so tests can pin the entropy layer
    exactly (coefficient equality is lossless, unlike pixels)."""
    buf = bytes(payload)
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
    comps: list[_Component] = []
    W = H = None
    restart_interval = 0
    adobe_transform = None
    seen_scan = False
    progressive = False
    arithmetic = False
    # DAC conditioning; defaults apply to any table id never mentioned
    dc_cond: dict[int, tuple[int, int]] = {}
    ac_cond: dict[int, int] = {}
    i = 2
    while i + 1 < len(buf):
        if buf[i] != 0xFF:
            raise ValueError(f"bad marker alignment at byte {i}")
        m = buf[i + 1]
        if m == 0xFF:  # fill byte (B.1.1.2): any marker may be 0xFF-padded
            i += 1
            continue
        if m == 0xD9:  # EOI
            break
        if m == 0x01 or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        if i + 4 > len(buf):
            raise ValueError("truncated JPEG segment header")
        (seglen,) = struct.unpack(">H", buf[i + 2 : i + 4])
        body = buf[i + 4 : i + 2 + seglen]
        if m in _SOF_UNSUPPORTED:
            raise NotImplementedError(
                f"JPEG {_SOF_UNSUPPORTED[m]} unsupported (baseline SOF0/SOF1 only)"
            )
        if m in (0xC0, 0xC1, 0xC2, 0xC9, 0xCA):
            # baseline / extended sequential / progressive, Huffman or
            # arithmetic-coded (SOF9/SOF10)
            if comps:
                raise ValueError("multiple SOF segments")
            progressive = m in (0xC2, 0xCA)
            arithmetic = m in (0xC9, 0xCA)
            prec = body[0]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG precision (8 only)")
            H, W = struct.unpack(">HH", body[1:5])
            nc = body[5]
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc}-component JPEG (1 or 3 only)")
            for c in range(nc):
                comp = _Component()
                comp.cid = body[6 + 3 * c]
                samp = body[7 + 3 * c]
                comp.h, comp.v = samp >> 4, samp & 15
                comp.tq = body[8 + 3 * c]
                if not (1 <= comp.h <= 4 and 1 <= comp.v <= 4):
                    raise ValueError(f"bad sampling factors {comp.h}x{comp.v}")
                comps.append(comp)
        elif m == 0xDB:  # DQT (possibly several tables per segment)
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 15
                if pq == 0:
                    tbl = np.frombuffer(body[j + 1 : j + 65], dtype=np.uint8)
                    j += 65
                else:
                    tbl = np.frombuffer(
                        body[j + 1 : j + 129], dtype=">u2"
                    )
                    j += 129
                nat = np.empty(64, dtype=np.int64)
                nat[ZIGZAG] = tbl.astype(np.int64)
                qtables[tq] = nat
        elif m == 0xC4:  # DHT (possibly several tables per segment)
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 15
                bits = list(body[j + 1 : j + 17])
                nv = sum(bits)
                vals = list(body[j + 17 : j + 17 + nv])
                htables[(tc, th)] = _build_decode_lut(bits, vals)
                j += 17 + nv
        elif m == 0xCC:  # DAC: arithmetic conditioning (possibly several)
            j = 0
            while j + 1 < len(body):
                tc, tb = body[j] >> 4, body[j] & 15
                cs = body[j + 1]
                if tc == 0:
                    dc_cond[tb] = (cs & 15, cs >> 4)  # (L, U)
                else:
                    ac_cond[tb] = cs  # Kx
                j += 2
        elif m == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif m == 0xEE and body[:5] == b"Adobe":  # APP14 color transform
            adobe_transform = body[11] if len(body) > 11 else None
        elif m == 0xDA:  # SOS
            if not comps or W is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 15
            scan_comps = []
            for s in range(ns):
                cs, tt = body[1 + 2 * s], body[2 + 2 * s]
                comp = next((c for c in comps if c.cid == cs), None)
                if comp is None:
                    raise ValueError(f"scan references unknown component {cs}")
                comp.dc_tbl = htables.get((0, tt >> 4))
                comp.ac_tbl = htables.get((1, tt & 15))
                comp.dc_tid = tt >> 4
                comp.ac_tid = tt & 15
                scan_comps.append(comp)
            data_end = _scan_extent(buf, i + 2 + seglen)
            data = buf[i + 2 + seglen : data_end]
            if progressive:
                if not seen_scan:
                    _alloc_progressive(comps, W, H)
                if arithmetic:
                    _decode_progressive_scan_arith(
                        data, scan_comps, ss, se, ah, al,
                        restart_interval, dc_cond, ac_cond,
                    )
                else:
                    _decode_progressive_scan(
                        data, scan_comps, ss, se, ah, al, restart_interval
                    )
            else:
                if seen_scan:
                    raise NotImplementedError(
                        "multi-scan sequential JPEG (one interleaved or "
                        "single-component baseline scan only)"
                    )
                if len(scan_comps) != len(comps):
                    raise NotImplementedError(
                        "multi-scan sequential JPEG (one interleaved or "
                        "single-component baseline scan only)"
                    )
                if arithmetic:
                    _decode_scan_arith(
                        data, scan_comps, W, H, restart_interval,
                        dc_cond, ac_cond,
                    )
                else:
                    for comp in scan_comps:
                        if comp.dc_tbl is None or comp.ac_tbl is None:
                            raise ValueError(
                                "scan references undefined Huffman table"
                            )
                    _decode_scan(data, scan_comps, W, H, restart_interval)
            seen_scan = True
            i = data_end
            continue
        # APPn / COM / others: skip
        i += 2 + seglen
    if not seen_scan:
        raise ValueError("JPEG stream has no scan data")
    for c in comps:
        if c.tq not in qtables:
            raise ValueError(f"component quant table {c.tq} undefined")
    return comps, qtables, W, H, adobe_transform


def _decode_scan(
    data: bytes, comps: list[_Component], W: int, H: int, restart_interval: int
) -> None:
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    interleaved = len(comps) > 1
    if interleaved:
        mcux = (W + 8 * hmax - 1) // (8 * hmax)
        mcuy = (H + 8 * vmax - 1) // (8 * vmax)
        for c in comps:
            c.bw = mcux * c.h
            c.bh = mcuy * c.v
    else:
        c = comps[0]
        cw = (W * c.h + hmax - 1) // hmax
        ch = (H * c.v + vmax - 1) // vmax
        c.bw = (cw + 7) // 8
        c.bh = (ch + 7) // 8
        mcux, mcuy = c.bw, c.bh  # non-interleaved MCU = one block
    n_mcus = mcux * mcuy
    for c in comps:
        c.coeffs = np.zeros((c.bh * c.bw, 64), dtype=np.int64)
        c.pred = 0

    # restart markers split the stream into independently-padded intervals
    intervals = []
    start = 0
    i = 0
    while i < len(data) - 1:
        if data[i] == 0xFF and 0xD0 <= data[i + 1] <= 0xD7:
            intervals.append(data[start:i])
            start = i + 2
            i += 2
        elif data[i] == 0xFF and data[i + 1] == 0x00:
            i += 2
        else:
            i += 1
    intervals.append(data[start:])
    if restart_interval:
        expect = (n_mcus + restart_interval - 1) // restart_interval
        if len(intervals) != expect:
            raise ValueError(
                f"restart-marker count mismatch: {len(intervals)} intervals "
                f"for {n_mcus} MCUs at DRI {restart_interval}"
            )

    zig = ZIGZAG
    m = 0
    for interval in intervals:
        rdr = _BitReader(interval.replace(b"\xff\x00", b"\xff"))
        for c in comps:
            c.pred = 0
        upper = (
            min(m + restart_interval, n_mcus) if restart_interval else n_mcus
        )
        while m < upper:
            my, mx = divmod(m, mcux)
            for c in comps:
                dsym, dlen = c.dc_tbl
                asym, alen = c.ac_tbl
                for b in range(c.h * c.v if interleaved else 1):
                    if interleaved:
                        by, bx = divmod(b, c.h)
                        bi = (my * c.v + by) * c.bw + mx * c.h + bx
                    else:
                        bi = m
                    blk = c.coeffs[bi]
                    size = rdr.decode(dsym, dlen)
                    c.pred += rdr.receive_extend(size)
                    blk[0] = c.pred
                    k = 1
                    while k < 64:
                        sym = rdr.decode(asym, alen)
                        if sym == 0x00:  # EOB
                            break
                        if sym == 0xF0:  # ZRL
                            k += 16
                            continue
                        k += sym >> 4
                        if k > 63:
                            raise ValueError("AC run past block end")
                        blk[zig[k]] = rdr.receive_extend(sym & 15)
                        k += 1
            m += 1


def _decode_scan_arith(
    data: bytes,
    comps: list[_Component],
    W: int,
    H: int,
    restart_interval: int,
    dc_cond: dict[int, tuple[int, int]],
    ac_cond: dict[int, int],
) -> None:
    """Sequential arithmetic-coded scan (T.81 F.2.2): same MCU geometry as
    the Huffman `_decode_scan`, QM-coded entropy layer.  Statistics areas
    live per entropy-table ID (components sharing a table share its
    adaptation) and reset — with the coder registers and DC model state —
    at every restart marker."""
    from sparkfuse import jpegarith as ja

    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    interleaved = len(comps) > 1
    if interleaved:
        mcux = (W + 8 * hmax - 1) // (8 * hmax)
        mcuy = (H + 8 * vmax - 1) // (8 * vmax)
        for c in comps:
            c.bw = mcux * c.h
            c.bh = mcuy * c.v
    else:
        c = comps[0]
        cw = (W * c.h + hmax - 1) // hmax
        ch = (H * c.v + vmax - 1) // vmax
        c.bw = (cw + 7) // 8
        c.bh = (ch + 7) // 8
        mcux, mcuy = c.bw, c.bh
    n_mcus = mcux * mcuy
    for c in comps:
        c.coeffs = np.zeros((c.bh * c.bw, 64), dtype=np.int64)

    intervals = _restart_intervals(data)
    if restart_interval:
        expect = (n_mcus + restart_interval - 1) // restart_interval
        if len(intervals) != expect:
            raise ValueError(
                f"restart-marker count mismatch: {len(intervals)} intervals "
                f"for {n_mcus} MCUs at DRI {restart_interval}"
            )

    zig = ZIGZAG
    m = 0
    for interval in intervals:
        dec = ja.QMDecoder(interval)
        dc_stats = {c.dc_tid: ja.new_stats(ja.DC_STAT_BINS) for c in comps}
        ac_stats = {c.ac_tid: ja.new_stats(ja.AC_STAT_BINS) for c in comps}
        fixed = ja.fixed_bin()
        states = [ja.SeqCompState() for _ in comps]
        upper = (
            min(m + restart_interval, n_mcus) if restart_interval else n_mcus
        )
        while m < upper:
            my, mx = divmod(m, mcux)
            for ci, c in enumerate(comps):
                lo, up = dc_cond.get(
                    c.dc_tid, (ja.DEFAULT_DC_L, ja.DEFAULT_DC_U)
                )
                kx = ac_cond.get(c.ac_tid, ja.DEFAULT_AC_KX)
                dstats = dc_stats[c.dc_tid]
                astats = ac_stats[c.ac_tid]
                for b in range(c.h * c.v if interleaved else 1):
                    if interleaved:
                        by, bx = divmod(b, c.h)
                        bi = (my * c.v + by) * c.bw + mx * c.h + bx
                    else:
                        bi = m
                    zz = [0] * 64
                    zz[0] = ja.decode_dc(dec, dstats, states[ci], lo, up)
                    ja.decode_ac_seq(dec, astats, fixed, zz, kx)
                    c.coeffs[bi][zig] = zz
            m += 1


def _decode_progressive_scan_arith(
    data: bytes,
    comps: list[_Component],
    ss: int,
    se: int,
    ah: int,
    al: int,
    restart_interval: int,
    dc_cond: dict[int, tuple[int, int]],
    ac_cond: dict[int, int],
) -> None:
    """One arithmetic-coded progressive scan (T.81 G.2): DC first scans
    reuse the sequential DC model on point-transformed values, DC
    refinement is one fixed-bin bit per block, AC first is the sequential
    AC model over the spectral band (no EOB runs — the per-block EOB
    decision replaces them), AC refinement codes newly-significant
    (run, ±1<<Al) decisions with per-coefficient correction bits.
    Statistics reset per scan and per restart interval."""
    from sparkfuse import jpegarith as ja

    zig = ZIGZAG
    dc_scan = ss == 0
    if dc_scan and se != 0:
        raise ValueError("progressive DC scan with Se != 0")
    if not dc_scan and len(comps) != 1:
        raise ValueError("progressive AC scan must be single-component")
    if not dc_scan and ss > se or se > 63:
        raise ValueError(f"bad spectral band {ss}..{se}")

    interleaved = dc_scan and len(comps) > 1
    if interleaved:
        mcux = comps[0].bw // comps[0].h
        n_units = mcux * (comps[0].bh // comps[0].v)
    else:
        c = comps[0]
        mcux = c.nbw
        n_units = c.nbw * c.nbh

    intervals = _restart_intervals(data)
    if restart_interval:
        expect = (n_units + restart_interval - 1) // restart_interval
        if len(intervals) != expect:
            raise ValueError(
                f"restart-marker count mismatch: {len(intervals)} intervals "
                f"for {n_units} units at DRI {restart_interval}"
            )

    p1 = 1 << al
    m1 = -p1
    m = 0
    for interval in intervals:
        dec = ja.QMDecoder(interval)
        dc_stats = {c.dc_tid: ja.new_stats(ja.DC_STAT_BINS) for c in comps}
        ac_stats = {c.ac_tid: ja.new_stats(ja.AC_STAT_BINS) for c in comps}
        fixed = ja.fixed_bin()
        states = [ja.SeqCompState() for _ in comps]
        upper = (
            min(m + restart_interval, n_units) if restart_interval else n_units
        )
        while m < upper:
            my, mx = divmod(m, mcux)
            if dc_scan:
                for ci, c in enumerate(comps):
                    lo, up = dc_cond.get(
                        c.dc_tid, (ja.DEFAULT_DC_L, ja.DEFAULT_DC_U)
                    )
                    for b in range(c.h * c.v if interleaved else 1):
                        if interleaved:
                            by, bx = divmod(b, c.h)
                            bi = (my * c.v + by) * c.bw + mx * c.h + bx
                        else:
                            bi = my * c.bw + mx
                        blk = c.coeffs[bi]
                        if ah == 0:
                            v = ja.decode_dc(
                                dec, dc_stats[c.dc_tid], states[ci], lo, up
                            )
                            blk[0] = v << al
                        else:
                            if dec.decode(fixed, 0):
                                blk[0] |= p1
            else:
                c = comps[0]
                kx = ac_cond.get(c.ac_tid, ja.DEFAULT_AC_KX)
                astats = ac_stats[c.ac_tid]
                blk = c.coeffs[my * c.bw + mx]
                if ah == 0:
                    # AC first scan: sequential model over the band,
                    # magnitudes point-transformed by Al (G.2.3)
                    k = ss
                    while k <= se:
                        base = 3 * (k - 1)
                        if dec.decode(astats, base):  # EOB
                            break
                        while dec.decode(astats, base + 1) == 0:
                            base += 3
                            k += 1
                            if k > se:
                                raise ValueError("AC run past band end")
                        sign = dec.decode(fixed, 0)
                        i = base + 2
                        mg = dec.decode(astats, i)
                        if mg:
                            if dec.decode(astats, i):
                                mg = 2
                                i = 189 if k <= kx else 217
                                while dec.decode(astats, i):
                                    mg <<= 1
                                    if mg == 0x8000:
                                        raise ValueError(
                                            "arithmetic AC magnitude overflow"
                                        )
                                    i += 1
                        v = mg
                        i += 14
                        mg >>= 1
                        while mg:
                            if dec.decode(astats, i):
                                v |= mg
                            mg >>= 1
                        v += 1
                        blk[zig[k]] = (-v if sign else v) << al
                        k += 1
                else:
                    # AC refinement (G.2.4; control flow mirrors the
                    # encoder's Figure G.10)
                    kex = se
                    while kex > 0 and blk[zig[kex]] == 0:
                        kex -= 1
                    k = ss
                    while k <= se:
                        base = 3 * (k - 1)
                        if k > kex and dec.decode(astats, base):
                            break  # EOB
                        while True:
                            z = zig[k]
                            if blk[z] != 0:  # correction bit
                                if dec.decode(astats, base + 2):
                                    blk[z] += m1 if blk[z] < 0 else p1
                                break
                            if dec.decode(astats, base + 1):
                                blk[z] = m1 if dec.decode(fixed, 0) else p1
                                break
                            base += 3
                            k += 1
                            if k > se:
                                raise ValueError("AC run past band end")
                        k += 1
            m += 1


def _first_sof_marker(buf: bytes) -> int | None:
    """Marker byte of the first SOFn segment (0xC0..0xCF minus DHT/JPG/DAC),
    walking the segment chain without decoding — the frame-type dispatch."""
    i = 2
    while i + 3 < len(buf):
        if buf[i] != 0xFF:
            return None
        m = buf[i + 1]
        if m == 0xFF:  # fill byte (B.1.1.2): any marker may be 0xFF-padded
            i += 1
            continue
        if 0xC0 <= m <= 0xCF and m not in (0xC4, 0xC8, 0xCC):
            return m
        if m == 0xD9 or m == 0xDA:
            return None
        if m == 0x01 or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        (seglen,) = struct.unpack(">H", buf[i + 2 : i + 4])
        i += 2 + seglen
    return None


def decode_jpeg(payload: bytes) -> np.ndarray:
    """uint8 pixels from baseline JPEG bytes: (H, W) for grayscale, (H, W,
    3) RGB for 3-component streams (JFIF YCbCr convention; an Adobe APP14
    transform=0 marker means the components are already RGB and is
    honored). SOF3 (lossless) streams dispatch to sparkfuse.jpegll and
    return exact samples (uint16 past 8-bit precision, components
    verbatim). See module docstring for the validated envelope."""
    if _first_sof_marker(bytes(payload)) == 0xC3:
        from sparkfuse.jpegll import decode_jpeg_lossless

        return decode_jpeg_lossless(payload)
    comps, qtables, W, H, adobe_transform = _decode_to_coefficients(payload)
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    planes = []
    for c in comps:
        deq = (c.coeffs * qtables[c.tq][None, :]).astype(np.float64)
        px = _idct(deq.reshape(-1, 8, 8)) + 128.0
        plane = _from_blocks(px, c.bh * 8, c.bw * 8)
        fy, fx = vmax // c.v, hmax // c.h
        if vmax % c.v or hmax % c.h:
            raise NotImplementedError(
                f"non-integer subsampling ratio {c.h}x{c.v} vs {hmax}x{vmax}"
            )
        if fy > 1:
            plane = np.repeat(plane, fy, axis=0)
        if fx > 1:
            plane = np.repeat(plane, fx, axis=1)
        planes.append(plane[:H, :W])
    if len(planes) == 1:
        return np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
    stacked = np.stack(planes, axis=-1)
    if adobe_transform == 0:
        return np.clip(np.rint(stacked), 0, 255).astype(np.uint8)
    return _ycbcr_to_rgb(np.clip(np.rint(stacked), 0, 255))
