"""MP4 (ISO BMFF) SAMPLE-LEVEL codec: real sample tables, real sample
decode for self-contained sample formats.

``sparkfuse.video.mp4_metadata`` walks top-level box structure; this module
goes the rest of the way down the spec (ISO/IEC 14496-12): it WRITES a
complete, structurally valid movie — ``ftyp`` + ``mdat`` + ``moov`` with a
full video ``trak`` (``tkhd``, ``mdhd``, ``hdlr``, ``vmhd``, ``dinf/dref``)
and the five sample tables (``stsd`` / ``stts`` / ``stsc`` / ``stsz`` /
``stco``) — and PARSES those tables back into per-sample (offset, size,
timestamp) triples, exactly the walk any demuxer performs.

The sample format is MJPEG (QuickTime/ISO ``jpeg`` VisualSampleEntry): each
video sample is an independent baseline JPEG, decoded by
``sparkfuse.jpeg`` — so MP4 sample decode is REAL end-to-end with zero
foreign code, and the honest boundary moves from "MP4 sample decode is a
stub" to "inter-frame codecs (H.264/H.265) need a codec library": those
fourccs raise ``NotImplementedError`` by name, same contract as
``decode_image``.

Lossy-codec oracle trick (same as ``synth_jpeg_media``,
sparkfuse/multimodal.py): ``synth_mp4_media`` emits frames that are mosaics
of constant EVEN 8x8 blocks, which round-trip bit-exactly through the
baseline JPEG sample codec (DC = 8*(v-128) divides the q00=16 quantizer,
every AC coefficient quantizes to zero) — so decoded MP4 frames are
recomputable by pure integer generation arithmetic and the whole
container+codec path is formula-oracle-checkable.

Timing is integer-exact by construction: media timescale = fps numerator,
per-sample delta = fps denominator (frame duration den/num seconds is then
EXACTLY ``delta`` timescale units), so sample timestamps and
``frame_index_at_ms`` arithmetic are shared with the Y4M path unrounded.

At 100 TB the same plumbing rules as the other media paths apply: payloads
are opaque binary cells that never leave the executor between demux and
re-encode (``sparkfuse.video.extract_frames`` dispatches here per row
inside one Arrow pass), and ``media_repartition_by_bytes`` bounds per-task
payload volume before any decode fan-out.
"""

from __future__ import annotations

import struct

import numpy as np

MP4_MIME = "video/mp4"

# inter-frame / out-of-container sample codecs we can name in errors
_KNOWN_EXTERNAL_CODECS = {
    b"avc1": "H.264/AVC",
    b"avc3": "H.264/AVC",
    b"hvc1": "H.265/HEVC",
    b"hev1": "H.265/HEVC",
    b"vp09": "VP9",
    b"av01": "AV1",
    b"mp4v": "MPEG-4 Part 2",
}


def _box(tag: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + tag + body


def _full(tag: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(tag, struct.pack(">B", version) + flags.to_bytes(3, "big") + body)


_UNITY_MATRIX = struct.pack(
    ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
)


def _visual_sample_entry(fourcc: bytes, width: int, height: int) -> bytes:
    """Spec-layout VisualSampleEntry (14496-12 §12.1.3): 78-byte body."""
    name = b"sparkfuse mjpeg"
    compressor = bytes([len(name)]) + name + b"\x00" * (31 - len(name))
    body = (
        b"\x00" * 6  # reserved
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16  # pre_defined / reserved / pre_defined[3]
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi h/v
        + b"\x00" * 4  # reserved
        + struct.pack(">H", 1)  # frame_count per sample
        + compressor
        + struct.pack(">Hh", 0x0018, -1)  # depth, pre_defined
    )
    return _box(fourcc, body)


def encode_mp4_mjpeg(
    frames: np.ndarray,
    fps: tuple[int, int] = (25, 1),
    quality: int = 50,
    samples_per_chunk: int = 2,
) -> bytes:
    """A real MP4 from uint8 frames ((T, H, W) gray or (T, H, W, 3) RGB):
    every frame becomes an independent baseline-JPEG sample
    (``sparkfuse.jpeg``), laid out in ``mdat`` in chunks of
    ``samples_per_chunk``, with full spec sample tables in ``moov`` (the
    last chunk is shorter when T % samples_per_chunk != 0, which exercises
    the multi-entry ``stsc`` path every demuxer must implement). Movie
    timescale is 1000 (ms); media timescale = fps num with per-sample delta
    = fps den, so frame timing is integer-exact."""
    from sparkfuse.jpeg import encode_jpeg

    a = np.asarray(frames, dtype=np.uint8)
    if a.ndim not in (3, 4) or (a.ndim == 4 and a.shape[3] != 3):
        raise ValueError(
            f"expected (T,H,W) mono or (T,H,W,3) RGB uint8 frames, got {a.shape}"
        )
    t, h, w = a.shape[:3]
    if t < 1:
        raise ValueError("empty video")
    num, den = int(fps[0]), int(fps[1])
    if num < 1 or den < 1:
        raise ValueError(f"bad frame rate {fps}")
    if samples_per_chunk < 1:
        raise ValueError("samples_per_chunk must be >= 1")

    samples = [encode_jpeg(a[i], quality=quality) for i in range(t)]
    sizes = [len(s) for s in samples]

    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2mp41")
    mdat_payload = b"".join(samples)
    # absolute chunk offsets: ftyp + mdat header precede the payload
    base = len(ftyp) + 8
    chunk_offsets = []
    off = base
    for c0 in range(0, t, samples_per_chunk):
        chunk_offsets.append(off)
        off += sum(sizes[c0 : c0 + samples_per_chunk])

    movie_timescale = 1000
    duration_mv = t * den * movie_timescale // num  # movie-timescale units
    duration_md = t * den  # media-timescale (=num) units

    stsd = _full(
        b"stsd", 0, 0,
        struct.pack(">I", 1) + _visual_sample_entry(b"jpeg", w, h),
    )
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, t, den))
    # one entry for the uniform run, a second for the short tail chunk
    stsc_entries = [(1, samples_per_chunk, 1)]
    tail = t % samples_per_chunk
    if tail and t > samples_per_chunk:
        stsc_entries.append((len(chunk_offsets), tail, 1))
    elif tail:  # single short chunk: the only entry IS the tail
        stsc_entries = [(1, tail, 1)]
    stsc = _full(
        b"stsc", 0, 0,
        struct.pack(">I", len(stsc_entries))
        + b"".join(struct.pack(">III", *e) for e in stsc_entries),
    )
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, t) + struct.pack(f">{t}I", *sizes),
    )
    stco = _full(
        b"stco", 0, 0,
        struct.pack(">I", len(chunk_offsets))
        + struct.pack(f">{len(chunk_offsets)}I", *chunk_offsets),
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)

    url_ = _full(b"url ", 0, 1, b"")  # flag 1: data in this file
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + url_)
    dinf = _box(b"dinf", dref)
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">4H", 0, 0, 0, 0))
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"sparkfuse\x00",
    )
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, num, duration_md)
        + struct.pack(">Hh", 0x55C4, 0),  # language 'und', pre_defined
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(
        b"tkhd", 0, 7,
        struct.pack(">IIIII", 0, 0, 1, 0, duration_mv)
        + b"\x00" * 8  # reserved
        + struct.pack(">hhhh", 0, 0, 0, 0)  # layer/group/volume/reserved
        + _UNITY_MATRIX
        + struct.pack(">II", w << 16, h << 16),
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, movie_timescale, duration_mv)
        + struct.pack(">IH", 0x00010000, 0x0100)  # rate, volume
        + b"\x00" * 10
        + _UNITY_MATRIX
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next_track_ID
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + _box(b"mdat", mdat_payload) + moov


def _walk(buf: bytes, lo: int, hi: int):
    """Child boxes of buf[lo:hi] as (tag, body_lo, body_hi) — same framing
    rules as sparkfuse.video.mp4_metadata (largesize, to-end boxes)."""
    i = lo
    while i < hi:
        if i + 8 > hi:
            raise ValueError("truncated MP4 box header")
        (size,) = struct.unpack(">I", buf[i : i + 4])
        tag = buf[i + 4 : i + 8]
        body_off = i + 8
        if size == 1:
            if i + 16 > hi:
                raise ValueError("truncated MP4 largesize header")
            (size,) = struct.unpack(">Q", buf[i + 8 : i + 16])
            body_off = i + 16
        elif size == 0:
            size = hi - i
        if size < body_off - i or i + size > hi:
            raise ValueError(f"bad MP4 box size for {tag!r}")
        yield tag, body_off, i + size
        i += size


def _find(buf: bytes, lo: int, hi: int, tag: bytes) -> tuple[int, int] | None:
    for t, l2, h2 in _walk(buf, lo, hi):
        if t == tag:
            return l2, h2
    return None


def _child(buf: bytes, lo: int, hi: int, tag: bytes) -> tuple[int, int]:
    found = _find(buf, lo, hi, tag)
    if found is None:
        raise ValueError(f"MP4 missing required box {tag!r}")
    return found


def parse_mp4_sample_tables(payload: bytes) -> dict:
    """The demuxer walk: moov → (video) trak → mdia → minf → stbl, all five
    sample tables parsed and CROSS-RESOLVED into per-sample absolute byte
    ranges and timestamps. Returns
    {codec, width, height, timescale, n_samples, sample_offsets,
    sample_sizes, sample_times_ms, fps} — everything a frame extractor
    needs, computed exactly as 14496-12 specifies:

      * stsc runs expand to a per-chunk sample count (each chunk uses the
        last entry whose first_chunk <= chunk index);
      * sample offset = its chunk's stco offset + sizes of the samples
        before it in that chunk;
      * sample time = cumulative stts deltas, converted to ms via the mdhd
        media timescale (integer floor, matching frame_index_at_ms).

    ``fps`` is (timescale, delta) when stts is a single uniform run (what
    ``encode_mp4_mjpeg`` writes), else None."""
    buf = bytes(payload)
    moov = None
    for tag, lo, hi in _walk(buf, 0, len(buf)):
        if tag == b"moov":
            moov = (lo, hi)
    if moov is None:
        raise ValueError("not an ISO BMFF stream (no moov box)")

    video_stbl = None
    for tag, lo, hi in _walk(buf, *moov):
        if tag != b"trak":
            continue
        # tolerate non-video / structurally bare traks: only a trak whose
        # hdlr says 'vide' must carry the full mdia→minf→stbl chain
        mdia = _find(buf, lo, hi, b"mdia")
        if mdia is None:
            continue
        mlo, mhi = mdia
        hdlr = _find(buf, mlo, mhi, b"hdlr")
        if hdlr is None or buf[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        dlo, dhi = _child(buf, mlo, mhi, b"mdhd")
        version = buf[dlo]
        if version == 1:
            (timescale,) = struct.unpack(">I", buf[dlo + 20 : dlo + 24])
        else:
            (timescale,) = struct.unpack(">I", buf[dlo + 12 : dlo + 16])
        nlo, nhi = _child(buf, mlo, mhi, b"minf")
        video_stbl = (_child(buf, nlo, nhi, b"stbl"), timescale)
        break
    if video_stbl is None:
        raise ValueError("MP4 has no video track")
    (slo, shi), timescale = video_stbl

    def full_body(tag: bytes) -> tuple[int, int]:
        lo, hi = _child(buf, slo, shi, tag)
        return lo + 4, hi  # skip version/flags

    # stsd: codec fourcc + declared dims from the first sample entry
    lo, hi = full_body(b"stsd")
    (n_entries,) = struct.unpack(">I", buf[lo : lo + 4])
    if n_entries < 1:
        raise ValueError("empty stsd")
    elo = lo + 4
    codec = buf[elo + 4 : elo + 8]
    width, height = struct.unpack(">HH", buf[elo + 8 + 24 : elo + 8 + 28])

    lo, hi = full_body(b"stts")
    (n_runs,) = struct.unpack(">I", buf[lo : lo + 4])
    runs = [
        struct.unpack(">II", buf[lo + 4 + 8 * i : lo + 12 + 8 * i])
        for i in range(n_runs)
    ]

    lo, hi = full_body(b"stsc")
    (n_stsc,) = struct.unpack(">I", buf[lo : lo + 4])
    stsc = [
        struct.unpack(">III", buf[lo + 4 + 12 * i : lo + 16 + 12 * i])
        for i in range(n_stsc)
    ]

    lo, hi = full_body(b"stsz")
    fixed, n_samples = struct.unpack(">II", buf[lo : lo + 8])
    if fixed:
        sizes = [fixed] * n_samples
    else:
        sizes = list(struct.unpack(f">{n_samples}I", buf[lo + 8 : lo + 8 + 4 * n_samples]))

    lo, hi = full_body(b"stco")
    (n_chunks,) = struct.unpack(">I", buf[lo : lo + 4])
    chunk_offsets = list(
        struct.unpack(f">{n_chunks}I", buf[lo + 4 : lo + 4 + 4 * n_chunks])
    )

    # expand stsc runs to a per-chunk count
    per_chunk = []
    for ci in range(1, n_chunks + 1):
        spc = 0
        for first, count, _sdi in stsc:
            if first <= ci:
                spc = count
            else:
                break
        per_chunk.append(spc)

    offsets = []
    si = 0
    for ci, coff in enumerate(chunk_offsets):
        run = coff
        for _ in range(per_chunk[ci]):
            if si >= n_samples:
                break
            offsets.append(run)
            run += sizes[si]
            si += 1
    if si != n_samples:
        raise ValueError(
            f"sample tables inconsistent: stsc/stco place {si} samples, "
            f"stsz declares {n_samples}"
        )

    deltas = []
    for count, delta in runs:
        deltas.extend([delta] * count)
    if len(deltas) != n_samples:
        raise ValueError(
            f"stts covers {len(deltas)} samples, stsz declares {n_samples}"
        )
    starts = np.concatenate([[0], np.cumsum(deltas[:-1], dtype=np.int64)])
    times_ms = [int(s) * 1000 // timescale for s in starts]
    fps = (timescale, runs[0][1]) if len(runs) == 1 else None

    return {
        "codec": codec.decode("latin-1"),
        "width": int(width),
        "height": int(height),
        "timescale": int(timescale),
        "n_samples": int(n_samples),
        "sample_offsets": offsets,
        "sample_sizes": sizes,
        "sample_times_ms": times_ms,
        "fps": fps,
    }


def decode_mp4_frames(payload: bytes) -> tuple[np.ndarray, tuple[int, int]]:
    """(frames, (fps_num, fps_den)) from an MP4 whose video samples are a
    self-contained image codec: demux via the real sample tables, decode
    each sample with ``sparkfuse.jpeg``. Inter-frame codecs raise
    ``NotImplementedError`` naming the codec — the honest boundary, since
    H.264-class decode genuinely needs a codec library this container
    doesn't ship. Mixed per-sample dimensions raise (a conforming MJPEG
    track is constant-dimension; the stsd declares one size)."""
    from sparkfuse.jpeg import decode_jpeg

    buf = bytes(payload)
    tables = parse_mp4_sample_tables(buf)
    codec = tables["codec"].encode("latin-1")
    if codec != b"jpeg":
        name = _KNOWN_EXTERNAL_CODECS.get(codec, tables["codec"])
        raise NotImplementedError(
            f"no in-container decoder for MP4 sample codec {tables['codec']!r}"
            f" ({name}); MJPEG ('jpeg') samples decode natively"
        )
    if tables["fps"] is None:
        raise NotImplementedError(
            "variable frame durations (multi-run stts) unsupported"
        )
    frames = []
    for off, size in zip(tables["sample_offsets"], tables["sample_sizes"]):
        if off + size > len(buf):
            raise ValueError("sample byte range exceeds file size")
        frames.append(decode_jpeg(buf[off : off + size]))
    if len({f.shape for f in frames}) != 1:
        raise ValueError("MJPEG samples decode to mixed dimensions")
    num, den = tables["fps"]
    return np.stack(frames), (num, den)
