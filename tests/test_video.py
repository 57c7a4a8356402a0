"""Y4M codec, real frame extraction, and ISO BMFF (MP4) structure parsing
(sparkfuse.video). The Y4M path follows the same oracle contract as the
WAV/PPM/PNG codecs: integer-exact generation arithmetic is recoverable
through the real binary container, so every assertion here recomputes the
expected values from formulas, never from the code under test."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkfuse.video import (
    Y4M_MIME,
    decode_y4m,
    encode_mp4_skeleton,
    encode_y4m,
    extract_frames,
    frame_index_at_ms,
    mp4_metadata,
    synth_y4m_media,
)


def _frames(t, h, w, ch=None, seed=3):
    rng = np.random.default_rng(seed)
    shape = (t, h, w) if ch is None else (t, h, w, ch)
    return rng.integers(0, 256, shape, dtype=np.uint8)


@pytest.mark.parametrize("shape", [(1, 1, 1), (3, 4, 5), (6, 2, 9)])
@pytest.mark.parametrize("ch", [None, 3])  # mono and 4:4:4
def test_y4m_roundtrip(shape, ch):
    fr = _frames(*shape, ch=ch)
    out, fps = decode_y4m(encode_y4m(fr, fps=(30, 1)))
    assert fps == (30, 1)
    assert out.shape == fr.shape and (out == fr).all()


def test_y4m_header_grammar_and_validation():
    fr = _frames(2, 3, 4)
    b = encode_y4m(fr, fps=(24000, 1001))  # NTSC-style rational rate
    assert b.startswith(b"YUV4MPEG2 W4 H3 F24000:1001 ")
    out, fps = decode_y4m(b)
    assert fps == (24000, 1001) and (out == fr).all()
    with pytest.raises(ValueError, match="magic"):
        decode_y4m(b"MPEG4YUV2 " + b[10:])
    with pytest.raises(ValueError, match="truncated"):
        decode_y4m(b[:-1])
    with pytest.raises(ValueError, match="FRAME"):
        decode_y4m(b.replace(b"FRAME\n", b"FRAMX\n", 1))
    # subsampled chroma is refused by name, never mis-decoded
    sub = b.replace(b"Cmono", b"C420jpeg")
    with pytest.raises(NotImplementedError, match="C420jpeg"):
        decode_y4m(sub)
    with pytest.raises(ValueError, match="bad frame rate"):
        encode_y4m(fr, fps=(0, 1))


def test_frame_index_math():
    # 4 fps: frame boundaries every 250 ms, floor semantics
    assert [frame_index_at_ms(t, (4, 1)) for t in (0, 249, 250, 999, 1000)] == [
        0, 0, 1, 3, 4,
    ]
    # rational rate: 24000/1001 fps at 1 s -> floor(24000/1001) = frame 23
    assert frame_index_at_ms(1000, (24000, 1001)) == 23


def test_extract_frames_real_end_to_end(spark):
    """Video → image rows: the sampled PNG frames decode back to the exact
    generation arithmetic, and the row set matches frame_sample_plan's
    timestamp grid."""
    from sparkfuse.multimodal import frame_sample_plan, media_decode_stats
    from sparkfuse.png import decode_png

    ids = spark.range(24).select(F.col("id").alias("media_id"))
    media = synth_y4m_media(ids).cache()
    out = extract_frames(media, every_ms=250).cache()

    # row grid == the declarative plan's grid
    got_grid = sorted(
        (r["media_id"], r["frame_ts_ms"]) for r in out.collect()
    )
    want_grid = sorted(
        (r["media_id"], r["frame_ts_ms"])
        for r in frame_sample_plan(media, every_ms=250).collect()
    )
    assert got_grid == want_grid and got_grid

    for r in out.collect():
        mid, ts = r["media_id"], r["frame_ts_ms"]
        w, h = 4 + mid % 9, 3 + mid % 5
        t = frame_index_at_ms(ts, (4, 1))
        x = np.arange(w)[None, :]
        y = np.arange(h)[:, None]
        want = ((mid + x + 2 * y + 5 * t) % 256).astype(np.uint8)
        px = decode_png(bytes(r["payload"]))
        assert r["frame_idx"] == t
        assert px.shape == (h, w) and (px == want).all()
        assert r["kind"] == "image" and r["mime"] == "image/png"
        assert (r["meta"]["width"], r["meta"]["height"]) == (w, h)

    # frames compose with the image stats operator by column name
    stats = media_decode_stats(out.limit(5))
    assert stats.count() == 5
    media.unpersist()
    out.unpersist()


def test_media_decode_stats_video_branch(spark):
    """media_decode_stats on Y4M rows: n_samples carries the frame count,
    sample_rate the whole fps, checksum/peak the exact sums over every
    frame — recomputed from the synth formula."""
    from sparkfuse.multimodal import media_decode_stats

    ids = spark.range(16).select(F.col("id").alias("media_id"))
    stats = {
        r["media_id"]: r
        for r in media_decode_stats(synth_y4m_media(ids)).collect()
    }
    for mid in range(16):
        w, h, n = 4 + mid % 9, 3 + mid % 5, 2 + mid % 4
        x = np.arange(w)[None, None, :]
        y = np.arange(h)[None, :, None]
        t = np.arange(n)[:, None, None]
        fr = (mid + x + 2 * y + 5 * t) % 256
        s = stats[mid]
        assert s["kind"] == "video"
        assert (s["n_samples"], s["sample_rate"]) == (n, 4)
        assert (s["width"], s["height"]) == (w, h)
        assert s["checksum"] == int(fr.sum()) and s["peak"] == int(fr.max())


def test_extract_frames_rejects_codec_bound_video(spark):
    """MP4 itself demuxes for real now (sparkfuse.mp4); the honest boundary
    is (a) unknown video mimes and (b) MP4s whose video track carries an
    inter-frame codec — both raise through the same Arrow pass."""
    from pyspark.sql import Row

    from sparkfuse.multimodal import MEDIA_SCHEMA

    row = Row(
        media_id=1, kind="video", mime="video/x-matroska",
        payload=bytearray(b"\x1a\x45\xdf\xa3 not a codec we ship"),
        meta=Row(width=None, height=None, duration_ms=1000, n_bytes=10),
    )
    df = spark.createDataFrame([row], MEDIA_SCHEMA)
    with pytest.raises(Exception, match="x-matroska"):
        extract_frames(df, 500).collect()

    # structurally valid MP4 but no decodable video track
    row2 = Row(
        media_id=2, kind="video", mime="video/mp4",
        payload=bytearray(encode_mp4_skeleton(1000)),
        meta=Row(width=None, height=None, duration_ms=1000, n_bytes=10),
    )
    df2 = spark.createDataFrame([row2], MEDIA_SCHEMA)
    with pytest.raises(Exception, match="video track"):
        extract_frames(df2, 500).collect()


def test_mp4_box_walk_metadata():
    b = encode_mp4_skeleton(duration_ms=123456, timescale=90000, n_tracks=2)
    meta = mp4_metadata(b)
    assert meta["major_brand"] == "isom"
    assert meta["timescale"] == 90000
    assert meta["duration_ms"] == 123456
    assert meta["n_tracks"] == 2
    assert meta["top_boxes"] == ["ftyp", "moov", "mdat"]
    # largesize (64-bit) box framing parses
    import struct

    big = b + struct.pack(">I", 1) + b"free" + struct.pack(">Q", 16)
    assert mp4_metadata(big)["top_boxes"][-1] == "free"
    # size==0 (to end of file) parses
    tail = b + struct.pack(">I", 0) + b"skip" + b"\x00" * 7
    assert mp4_metadata(tail)["top_boxes"][-1] == "skip"
    with pytest.raises(ValueError, match="truncated"):
        mp4_metadata(b[:-3])
    with pytest.raises(ValueError, match="ftyp/moov"):
        mp4_metadata(b"\x00\x00\x00\x08abcd")
