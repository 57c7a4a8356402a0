"""MP4 sample-level codec tests: real sample-table write/demux, MJPEG
sample decode through sparkfuse.jpeg, and the Spark media operators over
synth_mp4_media rows (sparkfuse/mp4.py; reference parity target is the
media plumbing the task brief demands, not the filter core)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkfuse.mp4 import (
    decode_mp4_frames,
    encode_mp4_mjpeg,
    parse_mp4_sample_tables,
)
from sparkfuse.video import frame_index_at_ms, mp4_metadata, synth_mp4_media


def _mosaic_frames(mid: int, nbx: int, nby: int, t: int) -> np.ndarray:
    """synth_mp4_media's documented generation arithmetic (constant EVEN
    8x8 blocks — bit-exact through the baseline-JPEG sample codec)."""
    bx = np.arange(nbx)[None, None, :]
    by = np.arange(nby)[None, :, None]
    ts = np.arange(t)[:, None, None]
    vals = (2 * ((mid + 3 * bx + 7 * by + 11 * ts) % 128)).astype(np.uint8)
    return np.repeat(np.repeat(vals, 8, axis=1), 8, axis=2)


def test_mono_mosaic_roundtrip_bit_exact():
    frames = _mosaic_frames(7, 3, 2, 5)
    payload = encode_mp4_mjpeg(frames, fps=(4, 1), samples_per_chunk=2)
    dec, fps = decode_mp4_frames(payload)
    assert fps == (4, 1)
    assert dec.dtype == np.uint8 and np.array_equal(dec, frames)


def test_rgb_roundtrip_close():
    """RGB goes through the YCbCr transform, so bit-exactness cannot hold —
    the lossy envelope stays tiny on block mosaics."""
    g = _mosaic_frames(3, 2, 2, 4).astype(int)
    rgb = np.stack([g, (g + 2) % 256, (g + 4) % 256], axis=-1).astype(np.uint8)
    dec, _ = decode_mp4_frames(encode_mp4_mjpeg(rgb, fps=(25, 1)))
    assert dec.shape == rgb.shape
    assert np.abs(dec.astype(int) - rgb.astype(int)).max() <= 3


def test_sample_tables_demux_layout():
    """The cross-resolved tables place every sample on a real JPEG byte
    range: SOI at each offset, EOI at each end, tail chunk handled by the
    second stsc entry."""
    frames = _mosaic_frames(11, 4, 3, 5)
    payload = encode_mp4_mjpeg(frames, fps=(4, 1), samples_per_chunk=2)
    tab = parse_mp4_sample_tables(payload)
    assert tab["codec"] == "jpeg"
    assert (tab["width"], tab["height"]) == (32, 24)
    assert tab["n_samples"] == 5 and len(tab["sample_sizes"]) == 5
    # 5 samples in chunks of 2 -> chunk sizes 2/2/1 (multi-entry stsc)
    offs, sizes = tab["sample_offsets"], tab["sample_sizes"]
    assert offs == sorted(offs)
    for off, size in zip(offs, sizes):
        assert payload[off : off + 2] == b"\xff\xd8"
        assert payload[off + size - 2 : off + size] == b"\xff\xd9"
    # timestamps: integer-exact media timescale (=fps num, delta=den)
    assert tab["timescale"] == 4 and tab["fps"] == (4, 1)
    assert tab["sample_times_ms"] == [0, 250, 500, 750, 1000]


def test_single_short_chunk_and_t1():
    frames = _mosaic_frames(2, 1, 1, 1)
    payload = encode_mp4_mjpeg(frames, samples_per_chunk=4)
    dec, _ = decode_mp4_frames(payload)
    assert np.array_equal(dec, frames)
    assert parse_mp4_sample_tables(payload)["n_samples"] == 1


def test_external_codec_raises_by_name():
    """avc1 samples are the honest boundary: the demux still works, the
    decode names the codec."""
    payload = bytearray(encode_mp4_mjpeg(_mosaic_frames(1, 2, 2, 2)))
    idx = payload.find(b"jpeg", payload.find(b"stsd"))
    payload[idx : idx + 4] = b"avc1"
    assert parse_mp4_sample_tables(bytes(payload))["codec"] == "avc1"
    with pytest.raises(NotImplementedError, match="H.264"):
        decode_mp4_frames(bytes(payload))


def test_inconsistent_tables_raise():
    payload = bytearray(encode_mp4_mjpeg(_mosaic_frames(1, 2, 2, 3)))
    i = payload.find(b"stsz")
    # corrupt stsz sample_count (declare one extra sample)
    (n,) = np.frombuffer(payload[i + 12 : i + 16], dtype=">u4")
    payload[i + 12 : i + 16] = int(n + 1).to_bytes(4, "big")
    with pytest.raises(ValueError):
        parse_mp4_sample_tables(bytes(payload))


def test_mp4_metadata_still_parses_real_movies():
    """The metadata-only fast path agrees with the full demux on the same
    bytes (movie timescale 1000 => duration_ms exact)."""
    payload = encode_mp4_mjpeg(_mosaic_frames(5, 2, 3, 4), fps=(4, 1))
    meta = mp4_metadata(payload)
    assert meta["major_brand"] == "isom"
    assert meta["n_tracks"] == 1
    assert meta["duration_ms"] == 1000  # 4 frames at 4 fps
    assert meta["top_boxes"] == ["ftyp", "mdat", "moov"]


def test_extract_frames_mp4_end_to_end(spark):
    """MP4 rows through the SAME frame extractor as Y4M: sampled PNG frame
    rows decode back to the generation arithmetic."""
    from sparkfuse.png import decode_png
    from sparkfuse.video import extract_frames

    ids = spark.range(18).select(F.col("id").alias("media_id"))
    out = extract_frames(synth_mp4_media(ids), every_ms=250).collect()
    assert out
    seen = set()
    for r in out:
        mid, ts = r["media_id"], r["frame_ts_ms"]
        nbx, nby = 1 + mid % 4, 1 + mid % 3
        t = frame_index_at_ms(ts, (4, 1))
        want = _mosaic_frames(mid, nbx, nby, t + 1)[t]
        px = decode_png(bytes(r["payload"]))
        assert r["frame_idx"] == t
        assert px.shape == want.shape and (px == want).all()
        assert r["mime"] == "image/png" and r["kind"] == "image"
        seen.add(mid)
    assert seen == set(range(18))


def test_media_decode_stats_mp4_branch(spark):
    """media_decode_stats dispatches video/mp4 through the sample demux:
    stats match the formula oracle exactly (the DC-exact contract)."""
    from sparkfuse.multimodal import media_decode_stats

    ids = spark.range(12).select(F.col("id").alias("media_id"))
    stats = {
        r["media_id"]: r
        for r in media_decode_stats(synth_mp4_media(ids)).collect()
    }
    for mid in range(12):
        nbx, nby, n = 1 + mid % 4, 1 + mid % 3, 2 + mid % 3
        fr = _mosaic_frames(mid, nbx, nby, n).astype(np.int64)
        s = stats[mid]
        assert s["kind"] == "video"
        assert (s["n_samples"], s["sample_rate"]) == (n, 4)
        assert (s["width"], s["height"]) == (8 * nbx, 8 * nby)
        assert s["checksum"] == int(fr.sum()) and s["peak"] == int(fr.max())
