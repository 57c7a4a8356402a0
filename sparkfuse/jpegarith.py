"""Arithmetic entropy coding for JPEG (ITU-T T.81 Annexes D and F).

The QM coder: a binary arithmetic coder with a finite-state probability
estimator (Table D.3), byte stuffing (an 0x00 byte after every 0xFF data
byte, T.81 D.1.6), carry resolution via deferred 0xFF stacking, and the
trailing-zero-suppressing flush of D.1.8.  The decision procedures follow
the *software conventions* form of Annex D (the MPS subinterval at the
bottom), which is byte-stream-identical to the hardware form — conformance
is certified by the interop suite in tests/test_jpeg_arith.py, which
round-trips real bitstreams against the system libjpeg-turbo in BOTH
directions at the (lossless) quantized-coefficient level.

The statistical models are the sequential DCT models of Annex F:
  * DC (F.1.4.4.1): 2-D contexts conditioned on the previous block's
    classified diff (zero / small± / large±, thresholds from the DAC
    conditioning value L/U), adaptive sign, magnitude-category unary code
    in the X1 area, one shared mantissa bin per category.
  * AC (F.1.4.4.2): per-index (EOB, zero-run, magnitude) bin triples,
    NON-adaptive sign (the fixed 0x5A1D bin), low/high magnitude areas
    split at the DAC Kx threshold.
and the progressive models of Annex G.2 (DC/AC first and refinement
scans), matching libjpeg's jdarith.c/jcarith.c semantics exactly.

Statistics bins are one byte each: bit 7 = current MPS sense, bits 0-6 =
the Table D.3 state index.  Bin index 113 is the fixed (non-adaptive)
equiprobable state used for AC signs and refinement bits.

No counterpart exists in /root/reference (the reference is a membership
-filter library); this module exists for the multimodal decode surface
(multimodal.py) whose JPEG support previously declared arithmetic coding
a named stub.
"""

from __future__ import annotations

# T.81 Table D.3 (Qe, Next_Index_MPS, Next_Index_LPS, Switch_MPS), plus
# the fixed equiprobable bin at index 113.  Public-standard constants;
# tests/test_jpeg_arith.py pins this table byte-for-byte against the
# system libjpeg's compiled-in copy when one is present.
QM_TABLE = (
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 109, 112, 0), (0x59EB, 111, 112, 1), (0x5A1D, 113, 113, 0),
)
_QE = [r[0] for r in QM_TABLE]
_NMPS = [r[1] for r in QM_TABLE]
_NLPS = [r[2] for r in QM_TABLE]
_SWITCH = [r[3] for r in QM_TABLE]

FIXED_STATE = 113  # non-adaptive equiprobable bin (AC sign, refinement)

# conditioning defaults when no DAC segment appears (T.81 F.1.4.4.1.4 /
# F.1.4.4.2.1 — also libjpeg's defaults)
DEFAULT_DC_L = 0
DEFAULT_DC_U = 1
DEFAULT_AC_KX = 5

DC_STAT_BINS = 64
AC_STAT_BINS = 256


def new_stats(n: int) -> bytearray:
    """Fresh statistics area: every bin at state 0, MPS = 0."""
    return bytearray(n)


def fixed_bin() -> bytearray:
    """One-bin area pinned at the fixed equiprobable state."""
    return bytearray([FIXED_STATE])


class QMDecoder:
    """QM decoder over one entropy-coded segment (restart interval).

    ``data`` is the raw segment bytes (0xFF 0x00 stuffing intact, no
    restart markers).  Past the end — or past a terminating marker — the
    decoder feeds zero bits forever, matching the encoder's
    trailing-zero-suppressing flush.
    """

    __slots__ = ("_data", "_pos", "_byte", "_nbits", "_ended", "a", "code")

    def __init__(self, data: bytes):
        self._data = data
        self._pos = 0
        self._byte = 0
        self._nbits = 0
        self._ended = False
        self.a = 0x10000
        code = 0
        for _ in range(16):
            code = (code << 1) | self._next_bit()
        self.code = code

    def _next_byte(self) -> int:
        data, n = self._data, len(self._data)
        if self._ended or self._pos >= n:
            self._ended = True
            return 0
        b = data[self._pos]
        if b != 0xFF:
            self._pos += 1
            return b
        # 0xFF: swallow fill 0xFFs, then either a stuffed zero (data byte
        # 0xFF) or a marker (feed zeros from here on)
        j = self._pos + 1
        while j < n and data[j] == 0xFF:
            j += 1
        if j < n and data[j] == 0x00:
            self._pos = j + 1
            return 0xFF
        self._ended = True
        return 0

    def _next_bit(self) -> int:
        if self._nbits == 0:
            self._byte = self._next_byte()
            self._nbits = 8
        self._nbits -= 1
        return (self._byte >> self._nbits) & 1

    def decode(self, stats: bytearray, i: int) -> int:
        sv = stats[i]
        state = sv & 0x7F
        mps = sv >> 7
        qe = _QE[state]
        t = self.a - qe
        if self.code < t:
            if t & 0x8000:  # MPS in the bottom subinterval, no renorm
                self.a = t
                return mps
            self.a = t
            in_upper = False
        else:
            self.code -= t
            self.a = qe
            in_upper = True
        # conditional exchange: when the bottom (t) is smaller than Qe the
        # symbol<->subinterval mapping flips (D.2.4)
        if (t >= qe) != in_upper:
            bit = mps
            stats[i] = (mps << 7) | _NMPS[state]
        else:
            bit = 1 - mps
            if _SWITCH[state]:
                mps = 1 - mps
            stats[i] = (mps << 7) | _NLPS[state]
        a, code, nbits = self.a, self.code, self._nbits
        byte = self._byte
        while a < 0x8000:
            if nbits == 0:
                byte = self._next_byte()
                nbits = 8
            nbits -= 1
            a <<= 1
            code = (code << 1) | ((byte >> nbits) & 1)
        self.a, self.code, self._nbits, self._byte = a, code, nbits, byte
        return bit


class QMEncoder:
    """QM encoder for one entropy-coded segment; ``flush()`` returns the
    byte-stuffed stream (carry-safe via the deferred 0xFF stack, trailing
    zero bytes suppressed per D.1.8)."""

    __slots__ = ("a", "c", "ct", "_buffer", "_sc", "_zc", "_out")

    def __init__(self):
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self._buffer = -1  # last non-0xFF byte pending output (-1 = none)
        self._sc = 0  # stacked 0xFF bytes awaiting carry resolution
        self._zc = 0  # deferred 0x00 bytes (dropped if nothing follows)
        self._out = bytearray()

    def encode(self, stats: bytearray, i: int, bit: int) -> None:
        sv = stats[i]
        state = sv & 0x7F
        mps = sv >> 7
        qe = _QE[state]
        self.a -= qe
        if bit != mps:
            if self.a >= qe:
                self.c += self.a  # LPS takes the top subinterval
                self.a = qe
            if _SWITCH[state]:
                mps = 1 - mps
            stats[i] = (mps << 7) | _NLPS[state]
        else:
            if self.a >= 0x8000:
                return  # no renormalization -> no adaptation
            if self.a < qe:
                self.c += self.a  # conditional exchange: MPS on top
                self.a = qe
            stats[i] = (mps << 7) | _NMPS[state]
        while self.a < 0x8000:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byte_out()

    def _emit(self, b: int) -> None:
        self._out.append(b)

    def _flush_zeros(self) -> None:
        while self._zc:
            self._emit(0x00)
            self._zc -= 1

    def _byte_out(self) -> None:
        t = self.c >> 19
        if t > 0xFF:
            # carry: ripples through every stacked 0xFF (-> 0x00) into the
            # buffered byte.  The three spacer bits guarantee the new
            # buffer byte below is not 0xFF.
            if self._buffer >= 0:
                self._flush_zeros()
                self._emit(self._buffer + 1)
                if self._buffer + 1 == 0xFF:
                    self._emit(0x00)
            self._zc += self._sc
            self._sc = 0
            self._buffer = t & 0xFF
        elif t == 0xFF:
            self._sc += 1  # defer: a later carry may turn it into 0x00
        else:
            if self._buffer == 0:
                self._zc += 1  # defer zero bytes (dropped at the tail)
            elif self._buffer >= 0:
                self._flush_zeros()
                self._emit(self._buffer)
            if self._sc:
                self._flush_zeros()
                while self._sc:
                    self._emit(0xFF)
                    self._emit(0x00)  # byte stuffing (D.1.6)
                    self._sc -= 1
            self._buffer = t
        self.c &= 0x7FFFF
        self.ct += 8

    def flush(self) -> bytes:
        """Terminate per D.1.8: pick the in-interval code value with the
        most trailing zero bits, emit pending bytes, suppress the zero
        tail (the decoder feeds zeros past the end)."""
        t = (self.a - 1 + self.c) & 0xFFFF0000
        self.c = t + 0x8000 if t < self.c else t
        self.c <<= self.ct
        if self.c & 0xF8000000:
            # final carry
            if self._buffer >= 0:
                self._flush_zeros()
                self._emit(self._buffer + 1)
                if self._buffer + 1 == 0xFF:
                    self._emit(0x00)
            self._zc += self._sc
            self._sc = 0
        else:
            if self._buffer == 0:
                self._zc += 1
            elif self._buffer >= 0:
                self._flush_zeros()
                self._emit(self._buffer)
            if self._sc:
                self._flush_zeros()
                while self._sc:
                    self._emit(0xFF)
                    self._emit(0x00)
                    self._sc -= 1
        if self.c & 0x7FFF800:
            self._flush_zeros()
            b = (self.c >> 19) & 0xFF
            self._emit(b)
            if b == 0xFF:
                self._emit(0x00)
            if self.c & 0x7F800:
                b = (self.c >> 11) & 0xFF
                self._emit(b)
                if b == 0xFF:
                    self._emit(0x00)
        return bytes(self._out)


# ---------------------------------------------------------------------------
# sequential DCT statistical models (T.81 F.1.4.4 encode / F.2 decode)
# ---------------------------------------------------------------------------


class SeqCompState:
    """Per-component DC model state (reset at restarts)."""

    __slots__ = ("last_dc", "dc_context")

    def __init__(self):
        self.last_dc = 0
        self.dc_context = 0


def _classify_dc_context(m: int, sign: int, lo: int, up: int) -> int:
    """F.1.4.4.1.2: conditioning category for the NEXT block's DC, from
    the magnitude-category MSB ``m`` of this block's diff."""
    if m < ((1 << lo) >> 1):
        return 0  # treated as zero diff
    if m > ((1 << up) >> 1):
        return 12 + (sign << 2)  # large +/-
    return 4 + (sign << 2)  # small +/-


def decode_dc(
    dec: QMDecoder,
    dc_stats: bytearray,
    st: SeqCompState,
    lo: int,
    up: int,
) -> int:
    """Decode one DC coefficient value (F.2.2.1); updates the component
    model state and returns the new DC value."""
    i0 = st.dc_context
    if dec.decode(dc_stats, i0) == 0:
        st.dc_context = 0
        return st.last_dc
    sign = dec.decode(dc_stats, i0 + 1)
    i = i0 + 2 + sign
    m = dec.decode(dc_stats, i)
    if m:
        i = 20
        while dec.decode(dc_stats, i):
            m <<= 1
            if m == 0x8000:
                raise ValueError("arithmetic DC magnitude overflow")
            i += 1
    st.dc_context = _classify_dc_context(m, sign, lo, up)
    v = m
    i += 14
    m >>= 1
    while m:
        if dec.decode(dc_stats, i):
            v |= m
        m >>= 1
    v += 1
    if sign:
        v = -v
    st.last_dc += v
    return st.last_dc


def encode_dc(
    enc: QMEncoder,
    dc_stats: bytearray,
    st: SeqCompState,
    dc: int,
    lo: int,
    up: int,
) -> None:
    """Encode one DC coefficient value (F.1.4.4.1); mirror of
    ``decode_dc``."""
    v = dc - st.last_dc
    st.last_dc = dc
    i0 = st.dc_context
    if v == 0:
        enc.encode(dc_stats, i0, 0)
        st.dc_context = 0
        return
    enc.encode(dc_stats, i0, 1)
    if v > 0:
        sign = 0
    else:
        sign = 1
        v = -v
    enc.encode(dc_stats, i0 + 1, sign)
    i = i0 + 2 + sign
    v -= 1
    m = 0
    if v:
        enc.encode(dc_stats, i, 1)
        m = 1
        i = 20
        v2 = v >> 1
        while v2:
            enc.encode(dc_stats, i, 1)
            m <<= 1
            i += 1
            v2 >>= 1
    enc.encode(dc_stats, i, 0)
    st.dc_context = _classify_dc_context(m, sign, lo, up)
    i += 14
    m >>= 1
    while m:
        enc.encode(dc_stats, i, 1 if (v & m) else 0)
        m >>= 1


def decode_ac_seq(
    dec: QMDecoder,
    ac_stats: bytearray,
    fixed: bytearray,
    zz_out: list[int],
    kx: int,
) -> None:
    """Decode the 63 AC coefficients of one block into ``zz_out`` (zigzag
    positions 1..63; position 0 untouched) per F.2.2.2."""
    k = 1
    while k <= 63:
        base = 3 * (k - 1)
        if dec.decode(ac_stats, base):  # EOB
            return
        while dec.decode(ac_stats, base + 1) == 0:
            base += 3
            k += 1
            if k > 63:
                raise ValueError("arithmetic AC run past block end")
        sign = dec.decode(fixed, 0)
        i = base + 2
        m = dec.decode(ac_stats, i)
        if m:
            if dec.decode(ac_stats, i):
                m = 2
                i = 189 if k <= kx else 217
                while dec.decode(ac_stats, i):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError("arithmetic AC magnitude overflow")
                    i += 1
        v = m
        i += 14
        m >>= 1
        while m:
            if dec.decode(ac_stats, i):
                v |= m
            m >>= 1
        v += 1
        zz_out[k] = -v if sign else v
        k += 1


def encode_ac_seq(
    enc: QMEncoder,
    ac_stats: bytearray,
    fixed: bytearray,
    zz: "list[int]",
    kx: int,
) -> None:
    """Encode zigzag AC coefficients 1..63 of one block (F.1.4.4.2)."""
    ke = 63
    while ke > 0 and zz[ke] == 0:
        ke -= 1
    k = 1
    while k <= ke:
        base = 3 * (k - 1)
        enc.encode(ac_stats, base, 0)  # not EOB
        v = zz[k]
        while v == 0:
            enc.encode(ac_stats, base + 1, 0)
            base += 3
            k += 1
            v = zz[k]
        enc.encode(ac_stats, base + 1, 1)
        if v > 0:
            enc.encode(fixed, 0, 0)
        else:
            enc.encode(fixed, 0, 1)
            v = -v
        i = base + 2
        v -= 1
        m = 0
        if v:
            enc.encode(ac_stats, i, 1)
            m = 1
            v2 = v >> 1
            if v2:
                enc.encode(ac_stats, i, 1)
                m = 2
                i = 189 if k <= kx else 217
                v2 >>= 1
                while v2:
                    enc.encode(ac_stats, i, 1)
                    m <<= 1
                    i += 1
                    v2 >>= 1
        enc.encode(ac_stats, i, 0)
        i += 14
        m >>= 1
        while m:
            enc.encode(ac_stats, i, 1 if (v & m) else 0)
            m >>= 1
        k += 1
    if k <= 63:
        enc.encode(ac_stats, 3 * (k - 1), 1)  # EOB
