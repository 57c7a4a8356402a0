"""Multimodal (image/audio/video) column plumbing for training-data pipelines.

Media travel as opaque ``binary`` payloads plus a typed metadata struct —
the Spark-side schema, partition sizing, Arrow batch shape, and UDF
signatures are real and tested. Codec coverage is split by what this
container can genuinely parse:

  * REAL decoders (stdlib-only, no new dependencies): ``decode_wav_pcm16``
    parses RIFF/WAVE via Python's ``wave`` module; ``decode_ppm`` is a
    handwritten binary-P6 Netpbm parser; ``sparkfuse.png`` is a from-scratch
    PNG codec on stdlib ``zlib`` (chunk walk + CRC, DEFLATE, all five
    scanline filters — decodes foreign-encoder PNGs, see tests/test_png.py).
    ``media_decode_stats`` drives them distributed (Arrow-batched
    mapInPandas; payloads never leave the executor) and is oracle-checked
    end-to-end (entry ``media_decode``).
  * ``sparkfuse.jpeg`` is a from-scratch baseline-JPEG codec (T.81:
    Huffman + zigzag + quantizer + vectorized DCT/IDCT; decodes
    foreign-encoder JPEGs incl. 4:2:0, see tests/test_jpeg.py).
  * STUBBED formats: ``decode_image`` on arithmetic-coded JPEG / WebP —
    and MP4 samples carrying inter-frame codecs (H.264-class) — raise
    NotImplementedError (those genuinely need a codec library this
    container doesn't ship); inject a real decoder via
    ``extract_features(decoder=...)`` in a production image. WAV, PPM,
    PNG, JPEG (baseline AND progressive), Y4M and MJPEG-in-MP4 payloads
    decode for real (``sparkfuse.mp4`` demuxes the full sample-table
    stack).
  * ``fake_feature_extract`` is the deterministic stand-in featurizer used
    by tests and benchmarks — it derives a feature vector from the payload
    bytes alone, so the full pipeline (scan → mapInPandas batches → feature
    column → similarity search) runs end-to-end on any payload.

Batch sizing note: media rows are big (MBs), so the Arrow batch row-count
(spark.sql.execution.arrow.maxRecordsPerBatch) is NOT the right lever —
``media_repartition_by_bytes`` sizes partitions by payload bytes so a task
holds ~target_mb regardless of row width.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),      # image | audio | video
        StructField("mime", StringType(), False),
        StructField("payload", BinaryType(), False),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("duration_ms", IntegerType(), True),
                    StructField("n_bytes", LongType(), False),
                ]
            ),
            False,
        ),
    ]
)

FEATURE_DIM = 32

_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("feature", ArrayType(FloatType()), False),
    ]
)


def synth_media(spark: SparkSession, n: int, payload_bytes: int = 4096, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = repeatable pseudo-bytes)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                rng = np.random.default_rng(seed + int(i))
                payload = rng.integers(0, 256, payload_bytes, dtype=np.uint8).tobytes()
                kind = ["image", "audio", "video"][int(i) % 3]
                rows.append(
                    {
                        "media_id": int(i),
                        "kind": kind,
                        "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                        "payload": payload,
                        "meta": {
                            "width": 64 if kind != "audio" else None,
                            "height": 64 if kind != "audio" else None,
                            "duration_ms": 1000 if kind != "image" else None,
                            "n_bytes": payload_bytes,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int) -> bytes:
    """Mono 16-bit PCM WAV bytes via the stdlib ``wave`` writer — a real
    RIFF/WAVE container, byte-compatible with any external WAV reader."""
    import io
    import wave

    s = np.ascontiguousarray(np.asarray(samples, dtype=np.int16))
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(int(sample_rate))
        w.writeframes(s.tobytes())
    return buf.getvalue()


def decode_wav_pcm16(payload: bytes) -> tuple[np.ndarray, int]:
    """(samples int16, sample_rate) parsed from RIFF/WAVE bytes with the
    stdlib ``wave`` module — a REAL container parse (chunk walk, fmt
    validation), not a stub. Mono 16-bit PCM only; other layouts raise with
    a clear message instead of mis-decoding."""
    import io
    import wave

    with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
        if w.getnchannels() != 1 or w.getsampwidth() != 2:
            raise ValueError(
                f"decode_wav_pcm16 supports mono 16-bit PCM; got "
                f"{w.getnchannels()} channel(s) x {8 * w.getsampwidth()}-bit"
            )
        rate = w.getframerate()
        frames = w.readframes(w.getnframes())
    return np.frombuffer(frames, dtype=np.int16), int(rate)


def encode_ppm(pixels: np.ndarray) -> bytes:
    """Binary Netpbm P6 bytes from an (H, W, 3) uint8 array."""
    a = np.ascontiguousarray(np.asarray(pixels, dtype=np.uint8))
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) uint8 pixels, got shape {a.shape}")
    h, w, _ = a.shape
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """(H, W, 3) uint8 pixels from binary Netpbm P6 bytes — a handwritten
    parser of the real format: magic, whitespace- and comment-tolerant
    header (``#`` to end-of-line), maxval check, exactly one whitespace byte
    before the raster."""
    buf = bytes(payload)
    if buf[:2] != b"P6":
        raise ValueError("not a binary P6 PPM (bad magic)")
    toks: list[int] = []
    i = 2
    while len(toks) < 3:
        while i < len(buf) and buf[i : i + 1].isspace():
            i += 1
        if i < len(buf) and buf[i : i + 1] == b"#":
            while i < len(buf) and buf[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(buf) and not buf[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PPM header")
        toks.append(int(buf[i:j]))
        i = j
    w, h, maxval = toks
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    i += 1  # the single whitespace byte after maxval
    raster = buf[i : i + w * h * 3]
    if len(raster) != w * h * 3:
        raise ValueError(
            f"PPM raster truncated: expected {w * h * 3} bytes, got {len(raster)}"
        )
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def decode_image(payload: bytes):
    """Image decode entry point: binary-P6 PPM decodes FOR REAL
    (``decode_ppm``), and so do PNG and JPEG — ``sparkfuse.png``
    implements the spec's chunk framing, CRC, DEFLATE (stdlib zlib) and all
    five scanline filters from scratch; ``sparkfuse.jpeg`` implements
    baseline sequential AND progressive T.81 (Huffman + zigzag + dequant +
    IDCT; spectral selection + successive approximation; gray / 4:4:4 /
    4:2:2 / 4:2:0) from scratch. Truly out-of-envelope formats
    (arithmetic-coded JPEG, WebP, ...) raise NotImplementedError — inject a
    decoder via ``extract_features(decoder=...)`` in a production image."""
    head = bytes(payload[:8])
    if head[:2] == b"P6":
        return decode_ppm(payload)
    if head == b"\x89PNG\r\n\x1a\n":
        from sparkfuse.png import decode_png

        return decode_png(payload)
    if head[:2] == b"\xff\xd8":
        from sparkfuse.jpeg import decode_jpeg

        return decode_jpeg(payload)
    raise NotImplementedError(
        "no codec library in this environment for this compressed image "
        "format; pass decoder= to extract_features (PPM, PNG and baseline "
        "JPEG decode natively)"
    )


def fake_feature_extract(payloads: list[bytes]) -> np.ndarray:
    """Deterministic stand-in feature extractor: FEATURE_DIM moments of the
    raw bytes (chunk means, scaled). Vectorized over the batch."""
    out = np.empty((len(payloads), FEATURE_DIM), dtype=np.float32)
    for i, p in enumerate(payloads):
        arr = np.frombuffer(p, dtype=np.uint8)
        chunks = np.array_split(arr.astype(np.float32), FEATURE_DIM)
        out[i] = np.array([c.mean() if len(c) else 0.0 for c in chunks]) / 255.0
    return out


def extract_features(
    media_df: DataFrame,
    decoder: Callable[[bytes], object] | None = None,
    featurizer: Callable[[list[bytes]], np.ndarray] = fake_feature_extract,
) -> DataFrame:
    """media → (media_id, feature array<float>): the bridge into the
    similarity-search operators (sparkfuse.similarity). Arrow-batched;
    payload bytes never leave the executor."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) for p in pdf["payload"]]
            if decoder is not None:
                payloads = [decoder(p) for p in payloads]
            feats = featurizer(payloads)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "feature": [row.tolist() for row in feats],
                }
            )

    return media_df.select("media_id", "payload").mapInPandas(kernel, _FEATURE_SCHEMA)


def resize_nearest(pixels: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize of an (h, w, 3) uint8 raster — pure index
    math (out[y, x] = in[y*h//out_h, x*w//out_w]), so the result is
    EXACTLY reproducible by any oracle, no interpolation rounding."""
    h, w = pixels.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return pixels[ys][:, xs]


def resize_images(
    media_df: DataFrame, out_h: int, out_w: int
) -> DataFrame:
    """Resize every IMAGE payload to (out_h, out_w) — the task brief's
    resize step, real end-to-end for the formats this container can parse:
    decode (P6 PPM, PNG, or baseline JPEG) → nearest-neighbor resize
    (exact index math) → re-encode, in Arrow-batched ``mapInPandas``. PPM
    stays PPM; PNG — and JPEG, deliberately — re-encode as PNG (resizing
    must not add a second lossy generation). Non-image rows pass through
    byte-identical; out-of-envelope codecs raise through ``decode_image``.
    meta.width/height/n_bytes are updated for resized rows; the schema is
    unchanged so the result composes with every other media operator
    (``media_decode_stats``, ``extract_features``, the byte-sized
    repartition)."""
    if out_h < 1 or out_w < 1:
        raise ValueError("out_h and out_w must be >= 1")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from sparkfuse.png import encode_png, smallest_filter_heuristic

        for pdf in batches:
            rows = []
            for r in pdf.to_dict("records"):
                if r["kind"] == "image":
                    raw = bytes(r["payload"])
                    px = decode_image(raw)
                    resized = resize_nearest(px, out_h, out_w)
                    if raw[:2] == b"P6":
                        payload = encode_ppm(resized)
                        mime = "image/x-portable-pixmap"
                    else:
                        payload = encode_png(
                            resized, smallest_filter_heuristic(resized)
                        )
                        mime = "image/png"
                    meta = dict(r["meta"])
                    meta["width"], meta["height"] = out_w, out_h
                    meta["n_bytes"] = len(payload)
                    r = {**r, "payload": payload, "meta": meta, "mime": mime}
                rows.append(r)
            yield pd.DataFrame(rows)

    return media_df.mapInPandas(kernel, media_df.schema)


def resample_nearest(samples: np.ndarray, n_out: int) -> np.ndarray:
    """Nearest-index resample of a 1-D sample array — pure index math
    (out[k] = in[k * n_in // n_out]), the audio analog of
    ``resize_nearest``: exactly reproducible by any oracle, no
    interpolation rounding."""
    n_in = len(samples)
    if n_out < 1 or n_in < 1:
        raise ValueError("resample needs n_out >= 1 and non-empty input")
    idx = (np.arange(n_out) * n_in) // n_out
    return samples[idx]


def resample_audio(media_df: DataFrame, out_rate: int) -> DataFrame:
    """Resample every AUDIO payload to ``out_rate`` Hz — the audio leg of
    the media-prep story beside ``resize_images``: decode WAV (stdlib RIFF
    parser) → nearest-index resample (exact integer math; n_out =
    n_in * out_rate // in_rate) → re-encode WAV at the new rate, in
    Arrow-batched ``mapInPandas``. Non-audio rows pass through
    byte-identical. meta.duration_ms tracks the (rounded) new duration and
    n_bytes the new payload; the schema is unchanged so the result composes
    with ``media_decode_stats``, ``extract_features``, and the byte-sized
    repartition. Rows already at ``out_rate`` are re-encoded (not skipped)
    so output payload bytes are uniformly writer-canonical."""
    if out_rate < 1:
        raise ValueError("out_rate must be >= 1")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.to_dict("records"):
                if r["kind"] == "audio":
                    samples, in_rate = decode_wav_pcm16(bytes(r["payload"]))
                    n_out = (len(samples) * out_rate) // in_rate
                    out = resample_nearest(samples, max(1, n_out))
                    payload = encode_wav_pcm16(out, out_rate)
                    meta = dict(r["meta"])
                    meta["duration_ms"] = int(round(len(out) * 1000 / out_rate))
                    meta["n_bytes"] = len(payload)
                    r = {**r, "payload": payload, "meta": meta}
                rows.append(r)
            yield pd.DataFrame(rows)

    return media_df.mapInPandas(kernel, media_df.schema)


def media_repartition_by_bytes(
    media_df: DataFrame, target_mb: int = 64
) -> DataFrame:
    """Partition media so each task sees ~target_mb of payload regardless of
    row width (row-count-based batching would OOM on video rows).

    Default 64 MB (was 128, round-5 review): ``get_spark`` sessions disable
    the Arrow input writer's 64 MB byte cap (the per-row size check behind
    it is the PLANS.md §17 pathology), so for wide media rows the PARTITION
    is now the only batch bound — a mapInPandas decode sees one Arrow batch
    per partition. 64 MB keeps that batch at the old effective cap, so the
    JVM↔Python pipelining and task peak memory are unchanged."""
    stats = media_df.agg(
        F.sum(F.col("meta.n_bytes")).alias("total"),
    ).first()
    total = stats["total"] or 0
    n_parts = max(1, int(total / (target_mb * 1024 * 1024)))
    return media_df.repartition(n_parts, "media_id")


def synth_codec_media(
    ids_df: DataFrame, id_col: str = "media_id", scale: int = 1
) -> DataFrame:
    """Deterministic REAL-format media table over an id column: even ids
    become mono 16-bit PCM WAV payloads (stdlib ``wave`` writer), odd ids
    images — ``id % 4 == 1`` rows are REAL PNG (``sparkfuse.png`` encoder,
    per-row filters chosen by the spec's minimum-sum heuristic), ``id % 4
    == 3`` rows binary-P6 PPM. The sample/pixel patterns are simple integer
    arithmetic so an external oracle can recompute the decoded content
    exactly — the contract ``media_decode_stats``'s entry query is checked
    against (at the default ``scale=1``):

      WAV  (id even):  rate 8000 Hz, n = (80 + id % 50) * scale frames,
                       sample[k] = (id + 7k) % 512 - 256
      image (id odd):  w = (4 + id % 9) * scale, h = (3 + id % 5) * scale,
                       pixel[y][x][c] = (id + x + 2y + 3c) % 256

    The pixel formula is container-independent — the oracle recomputes the
    same decoded stats whether the bytes travelled as PPM or PNG, so the
    driver's hash match certifies the PNG encode→filter→DEFLATE→decode
    round-trip too. ``scale`` multiplies payload sizes (bench-realistic
    media without changing the per-element formulas).
    """
    from sparkfuse.png import encode_png, smallest_filter_heuristic

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf[id_col].to_numpy():
                mid = int(i)
                if mid % 2 == 0:
                    n = (80 + mid % 50) * scale
                    samples = ((mid + 7 * np.arange(n)) % 512 - 256).astype(np.int16)
                    payload = encode_wav_pcm16(samples, 8000)
                    kind, mime = "audio", "audio/wav"
                    wh = (None, None)
                    duration_ms = int(round(n * 1000 / 8000))
                else:
                    w, h = (4 + mid % 9) * scale, (3 + mid % 5) * scale
                    x = np.arange(w)[None, :, None]
                    y = np.arange(h)[:, None, None]
                    c = np.arange(3)[None, None, :]
                    px = ((mid + x + 2 * y + 3 * c) % 256).astype(np.uint8)
                    if mid % 4 == 1:
                        payload = encode_png(px, smallest_filter_heuristic(px))
                        kind, mime = "image", "image/png"
                    else:
                        payload = encode_ppm(px)
                        kind, mime = "image", "image/x-portable-pixmap"
                    wh = (w, h)
                    duration_ms = None
                rows.append(
                    {
                        "media_id": mid,
                        "kind": kind,
                        "mime": mime,
                        "payload": payload,
                        "meta": {
                            "width": wh[0],
                            "height": wh[1],
                            "duration_ms": duration_ms,
                            "n_bytes": len(payload),
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return ids_df.select(F.col(id_col)).mapInPandas(gen, MEDIA_SCHEMA)


def synth_jpeg_media(
    ids_df: DataFrame,
    id_col: str = "media_id",
    quality: int = 50,
    scale: int = 1,
    arithmetic: bool = False,
) -> DataFrame:
    """Deterministic REAL baseline-JPEG table over an id column — the lossy
    sibling of ``synth_codec_media``, with the same formula-oracle contract
    DESPITE the lossy codec: every image is a mosaic of constant 8x8 blocks
    whose values are even, which round-trips BIT-EXACTLY through
    ``sparkfuse.jpeg`` at the default quality (DC = 8*(v-128) divides the
    q[0][0]=16 quantizer; all AC quantize to zero — see sparkfuse/jpeg.py).
    Documented generation arithmetic (what an external oracle recomputes):

      nbx = 1 + id % 4, nby = 1 + id % 3   (w = 8*nbx, h = 8*nby)
      block value v(by, bx) = 2 * ((id + 3*bx + 7*by) % 128)
      decoded pixel[y][x]   = v(y // 8, x // 8)   — exactly

    so decoded stats are: width = w, height = h, checksum = 64 * Σ v,
    peak = max v. ``scale`` multiplies the BLOCK-GRID dims (the entry
    oracle is written at scale=1): every block stays constant-even so the
    bit-exactness holds at any scale — bench-realistic payloads without a
    new contract. ``quality`` != 50 keeps the schema but voids the
    exactness contract (quantizers change) — bench-only.
    ``arithmetic=True`` swaps the entropy layer for SOF9 QM coding
    (sparkfuse.jpegarith) — entropy packaging only, so the SAME formula
    contract holds bit-exactly over arithmetic-coded payloads."""
    from sparkfuse.jpeg import encode_jpeg

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf[id_col].to_numpy():
                mid = int(i)
                nbx, nby = (1 + mid % 4) * scale, (1 + mid % 3) * scale
                bx = np.arange(nbx)[None, :]
                by = np.arange(nby)[:, None]
                vals = (2 * ((mid + 3 * bx + 7 * by) % 128)).astype(np.uint8)
                img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
                payload = encode_jpeg(
                    img, quality=quality, arithmetic=arithmetic
                )
                rows.append(
                    {
                        "media_id": mid,
                        "kind": "image",
                        "mime": "image/jpeg",
                        "payload": payload,
                        "meta": {
                            "width": 8 * nbx,
                            "height": 8 * nby,
                            "duration_ms": None,
                            "n_bytes": len(payload),
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return ids_df.select(F.col(id_col)).mapInPandas(gen, MEDIA_SCHEMA)


def synth_lossless_jpeg_media(
    ids_df: DataFrame, id_col: str = "media_id", scale: int = 1
) -> DataFrame:
    """Deterministic LOSSLESS-JPEG (T.81 SOF3, sparkfuse.jpegll) table over
    an id column. Because the codec is exact, the images need no
    codec-design trick (no constant-even blocks): they reuse
    ``synth_codec_media``'s full per-pixel formula —

      w = (4 + id % 9) * scale, h = (3 + id % 5) * scale,
      pixel[y][x][c] = (id + x + 2y + 3c) % 256

    — so the SAME container-independent oracle arithmetic recomputes the
    decoded stats. The predictor selector cycles ``1 + id % 7``, which
    drives every Annex H.1.2.1 predictor through whatever query consumes
    this table (lossless output is predictor-independent; the BYTES
    differ, the decoded raster cannot)."""
    from sparkfuse.jpegll import encode_jpeg_lossless

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf[id_col].to_numpy():
                mid = int(i)
                w, h = (4 + mid % 9) * scale, (3 + mid % 5) * scale
                x = np.arange(w)[None, :, None]
                y = np.arange(h)[:, None, None]
                c = np.arange(3)[None, None, :]
                px = ((mid + x + 2 * y + 3 * c) % 256).astype(np.uint8)
                payload = encode_jpeg_lossless(px, predictor=1 + mid % 7)
                rows.append(
                    {
                        "media_id": mid,
                        "kind": "image",
                        "mime": "image/jpeg",
                        "payload": payload,
                        "meta": {
                            "width": w,
                            "height": h,
                            "duration_ms": None,
                            "n_bytes": len(payload),
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return ids_df.select(F.col(id_col)).mapInPandas(gen, MEDIA_SCHEMA)


_DECODE_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_samples", LongType(), False),    # audio frames; 0 for images
        StructField("sample_rate", LongType(), False),  # audio only; 0 for images
        StructField("width", LongType(), False),        # image only; 0 for audio
        StructField("height", LongType(), False),       # image only; 0 for audio
        StructField("checksum", LongType(), False),     # sum of decoded values
        StructField("peak", LongType(), False),         # max decoded value
    ]
)


def media_decode_stats(media_df: DataFrame) -> DataFrame:
    """Decode every payload with the REAL stdlib codecs and emit exact
    integer stats over the DECODED content (not the container bytes):
    audio → (n_samples, sample_rate, sum, max of int16 samples); image →
    (width, height, sum, max of uint8 raster); Y4M video → (n_frames as
    n_samples, whole fps as sample_rate, frame dims, sum/max over every
    frame). Inapplicable dimensions are
    0, not NULL, so downstream value-compares stay total-orderable.
    Arrow-batched mapInPandas;
    payloads never leave the executor. Dispatch is by mime; formats without
    an in-container codec raise (same contract as ``decode_image``)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mime, payload in zip(
                pdf["media_id"], pdf["mime"], pdf["payload"]
            ):
                p = bytes(payload)
                if mime == "audio/wav":
                    samples, rate = decode_wav_pcm16(p)
                    s64 = samples.astype(np.int64)
                    peak = int(s64.max()) if len(s64) else 0
                    rows.append(
                        (int(mid), "audio", len(samples), rate, 0, 0,
                         int(s64.sum()), peak)
                    )
                elif mime in ("video/x-yuv4mpeg", "video/mp4"):
                    if mime == "video/mp4":
                        from sparkfuse.mp4 import decode_mp4_frames

                        frames, (num, den) = decode_mp4_frames(p)
                    else:
                        from sparkfuse.video import decode_y4m

                        frames, (num, den) = decode_y4m(p)
                    f64 = frames.astype(np.int64)
                    h, w = frames.shape[1:3]
                    rows.append(
                        (int(mid), "video", len(frames), num // den, w, h,
                         int(f64.sum()), int(f64.max()))
                    )
                elif mime in (
                    "image/x-portable-pixmap", "image/png", "image/jpeg"
                ):
                    if mime == "image/png":
                        from sparkfuse.png import decode_png

                        px = decode_png(p).astype(np.int64)
                    elif mime == "image/jpeg":
                        from sparkfuse.jpeg import decode_jpeg

                        px = decode_jpeg(p).astype(np.int64)
                    else:
                        px = decode_ppm(p).astype(np.int64)
                    h, w = px.shape[:2]
                    rows.append(
                        (int(mid), "image", 0, 0, w, h,
                         int(px.sum()), int(px.max()))
                    )
                else:
                    raise NotImplementedError(
                        f"no in-container codec for mime {mime!r}"
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _DECODE_STATS_SCHEMA.fields]
            )

    return media_df.select("media_id", "mime", "payload").mapInPandas(
        kernel, _DECODE_STATS_SCHEMA
    )


def frame_sample_plan(media_df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video → frame-extraction work items (media_id, frame_ts_ms): the
    *plan* is pure column arithmetic (sequence over duration). The decode
    of each frame is REAL for Y4M streams and MJPEG-in-MP4 —
    ``sparkfuse.video.extract_frames`` materializes this grid into decoded
    PNG image rows via ``decode_y4m``/``sparkfuse.mp4`` — and remains the
    declared stub only for inter-frame sample codecs (H.264-class), whose
    container ``mp4_metadata`` still parses."""
    return (
        media_df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )
