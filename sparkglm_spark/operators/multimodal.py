"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched mapInPandas.

Decode kernels are REAL for the container-friendly formats — BMP 24/32-bit
and PPM P6 images (`decode_image`/`encode_bmp_rgb`), RIFF/WAV PCM-16 audio
(`decode_audio`), and RVID raw-frame video (`decode_video`) — implemented
in pure python/numpy (no codec libraries), as are the nearest-neighbor
resize (`resize_image_nn`) and per-frame sampling decode (`sample_frames`).
Compressed formats (JPEG/PNG/MP3/H.264) would slot into the same
one-function bodies without changing any plan shape. `payload_byte_stats`
is the only non-decoding path and is explicitly opt-in for opaque formats.

Design for 100 TB of media:
- payloads never leave the JVM→Arrow batch path as Python objects per row;
- metadata (dims, duration, codec) lives in a struct column so filters on
  it prune parquet row groups without touching payload bytes;
- content-hash (sha2-256 of bytes) dedups payloads BEFORE any decode, and
  the dedup exchanges carry (hash, id) rows only — never payload bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", LongType()),
                    StructField("height", LongType()),
                    StructField("duration_ms", LongType()),
                    StructField("codec", StringType()),
                ]
            ),
        ),
    ]
)


def synth_media_from_documents(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Deterministic fake media table from the documents testdata: payload =
    UTF-8 bytes of the text (stands in for encoded media), metadata derived
    from content. Lets every downstream op run on real driver testdata."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col("text"), "UTF-8").cast(BinaryType()).alias("payload"),
        F.struct(
            (F.col("n_chars") % 640 + 1).cast("long").alias("width"),
            (F.col("n_chars") % 480 + 1).cast("long").alias("height"),
            (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
            F.lit("raw").alias("codec"),
        ).alias("meta"),
    )


def media_content_dedup(
    media: DataFrame, broadcast_drop_list: bool = True
) -> DataFrame:
    """Content-hash dedup BEFORE decode: sha2-256 the payload bytes,
    groupBy(hash).min(media_id) picks the keeper, loser ids come back as a
    broadcast anti-join. The exchanges carry only (32-byte hash, id) rows —
    payload bytes never cross the wire (plan-asserted: no BinaryType in any
    exchange, tests/test_plans.py). With media, that matters more than for
    text: payloads dominate row size."""
    from sparkglm_spark.operators.dedup import (
        _content_fp,
        _dedup_drop_list,
        _drop_keys,
    )

    # _content_fp, not raw sha2: sha2(NULL) is NULL and the drop-list
    # equi-join would never match it, so NULL-payload duplicates (decode
    # failures) would all survive — the same bug the text path's
    # random-corpus twin caught
    drop = _dedup_drop_list(media, _content_fp(media, ["payload"]), "media_id")
    return _drop_keys(media, drop, "media_id", broadcast_drop_list)


def encode_bmp_rgb(rgb: np.ndarray) -> bytes:
    """Encode a (H, W, 3) uint8 RGB array as an uncompressed 24-bit BMP
    (BGR byte order, bottom-up rows, 4-byte-aligned strides). Pure
    python/numpy — the encoder half of the real BMP codec."""
    import struct

    h, w = rgb.shape[:2]
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    img_size = (row_bytes + pad) * h
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + img_size, 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up row order
        rows.append(rgb[y, :, ::-1].astype(np.uint8).tobytes() + b"\x00" * pad)
    return header + b"".join(rows)


def encode_bmp_gray(gray: np.ndarray) -> bytes:
    """Encode a (H, W) uint8 grayscale array as an uncompressed 24-bit BMP
    (r = g = b). Pure python/numpy — the synthetic-payload generator for
    pipelines tested in codec-less containers."""
    return encode_bmp_rgb(np.stack([gray, gray, gray], axis=-1))


def decode_image(payload: bytes) -> np.ndarray:
    """REAL pure-python image decoder (no codec libraries needed): BMP
    (uncompressed 24/32-bit, bottom-up or top-down) and binary PPM (P6).
    Returns an (H, W, 3) uint8 RGB array. Formats outside this set raise
    ValueError — swap in PIL/turbojpeg for JPEG/PNG without changing any
    plan shape."""
    import struct

    if payload[:2] == b"BM":
        if len(payload) < 54:
            raise ValueError("truncated BMP header")
        data_off = struct.unpack_from("<I", payload, 10)[0]
        hdr_size = struct.unpack_from("<I", payload, 14)[0]
        if hdr_size < 40:
            raise ValueError(f"unsupported BMP header size {hdr_size}")
        w, h_raw = struct.unpack_from("<ii", payload, 18)
        planes, bpp = struct.unpack_from("<HH", payload, 26)
        compression = struct.unpack_from("<I", payload, 30)[0]
        if compression != 0 or bpp not in (24, 32):
            raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
        top_down = h_raw < 0
        h = abs(h_raw)
        nch = bpp // 8
        row_bytes = w * nch
        stride = row_bytes + ((-row_bytes) % 4)
        out = np.empty((h, w, 3), dtype=np.uint8)
        for i in range(h):
            y = i if top_down else h - 1 - i
            off = data_off + i * stride
            row = np.frombuffer(payload, dtype=np.uint8, count=row_bytes, offset=off)
            px = row.reshape(w, nch)
            out[y, :, 0] = px[:, 2]  # BMP stores BGR(A)
            out[y, :, 1] = px[:, 1]
            out[y, :, 2] = px[:, 0]
        return out
    if payload[:2] == b"P6":
        # P6\n<w> <h>\n<maxval>\n<binary rgb>
        parts = []
        idx = 2
        while len(parts) < 3:
            while idx < len(payload) and payload[idx : idx + 1].isspace():
                idx += 1
            if payload[idx : idx + 1] == b"#":  # comment line
                idx = payload.index(b"\n", idx) + 1
                continue
            start = idx
            while idx < len(payload) and not payload[idx : idx + 1].isspace():
                idx += 1
            parts.append(int(payload[start:idx]))
        idx += 1  # single whitespace after maxval
        w, h, maxval = parts
        if maxval > 255:
            raise ValueError("16-bit PPM not supported")
        arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=idx)
        return arr.reshape(h, w, 3).copy()
    raise ValueError(
        "unsupported image format (BMP 24/32-bit and PPM P6 are built in; "
        "JPEG/PNG need codec libraries not present in this container)"
    )


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Encode a 1-D int16 array as a mono RIFF/WAV PCM-16 payload. Pure
    python/numpy — the synthetic-payload generator for the audio path."""
    import struct

    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_audio(payload: bytes) -> tuple[np.ndarray, int, int]:
    """REAL pure-python audio decoder: RIFF/WAV, uncompressed PCM-16.
    Walks the chunk list (handles extra chunks and word-aligned padding),
    returns (samples as (n, channels) int16, sample_rate, channels).
    Compressed codecs raise ValueError — swap in ffmpeg/soundfile for
    MP3/FLAC without changing any plan shape."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("unsupported audio format (RIFF/WAV PCM built in)")
    pos, end = 12, 8 + struct.unpack_from("<I", payload, 4)[0]
    fmt = None
    data = None
    while pos + 8 <= min(end, len(payload)):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"unsupported WAV: format={audio_format} bits={bits}")
    samples = np.frombuffer(data, dtype="<i2")
    samples = samples[: (samples.size // channels) * channels]
    return samples.reshape(-1, channels), rate, channels


# ---------------------------------------------------------------------------
# Raw-frame video container ("RVID"): the trivial uncompressed format that
# lets the video path run REAL decode in codec-less containers — header
# b"RVID" + <HHHH>(width, height, n_frames, fps), then n_frames grayscale
# frames of height·width bytes each (row-major, top-down). H.264/VP9 would
# slot into the same decode_video body via ffmpeg without changing any plan.
# ---------------------------------------------------------------------------


def encode_rawvideo(frames: np.ndarray, fps: int = 1) -> bytes:
    """Encode (n_frames, H, W) uint8 grayscale frames as an RVID payload."""
    import struct

    n, h, w = frames.shape
    return (
        b"RVID"
        + struct.pack("<HHHH", w, h, n, fps)
        + frames.astype(np.uint8).tobytes()
    )


def decode_video(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL pure-python video decoder for the RVID raw-frame container:
    returns ((n_frames, H, W) uint8 grayscale frames, fps). Compressed
    codecs raise ValueError — swap in ffmpeg for H.264/VP9 without changing
    any plan shape."""
    import struct

    if payload[:4] != b"RVID" or len(payload) < 12:
        raise ValueError(
            "unsupported video format (RVID raw-frame container built in; "
            "H.264/VP9 need codec libraries not present in this container)"
        )
    w, h, n, fps = struct.unpack_from("<HHHH", payload, 4)
    need = n * h * w
    arr = np.frombuffer(payload, dtype=np.uint8, count=need, offset=12)
    return arr.reshape(n, h, w).copy(), fps


def payload_byte_stats(payload: bytes, n_features: int = 8) -> np.ndarray:
    """Statistics of the RAW payload bytes — the honest fallback for opaque
    formats whose codec is not built in. NOT a decoder: byte statistics of
    an encoded payload are not content features. Prefer `decode_features`."""
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    return _stats_vector(arr, n_features)


def _stats_vector(arr: np.ndarray, n_features: int = 8) -> np.ndarray:
    if arr.size == 0:
        return np.zeros(n_features)
    return np.array(
        [
            arr.size,
            arr.mean(),
            arr.std(),
            arr.min(),
            arr.max(),
            np.median(arr),
            float(np.sum(arr > 127)) / arr.size,
            float(arr[:16].sum()),
        ][:n_features]
    )


def decode_features(payload: bytes, n_features: int = 8) -> np.ndarray:
    """REAL decode + feature-extract: sniffs the container magic, decodes
    with the matching pure-python codec, and returns statistics of the
    DECODED content (gray pixels / PCM samples / frame pixels) — not of the
    encoded bytes. Unknown formats raise ValueError; use
    `payload_byte_stats` explicitly for opaque payloads."""
    payload = bytes(payload)
    if payload[:2] in (b"BM", b"P6"):
        rgb = decode_image(payload)
        gray = rgb.astype(np.int64).sum(axis=2) // 3
        return _stats_vector(gray.ravel().astype(np.float64), n_features)
    if payload[:4] == b"RIFF":
        samples, _rate, _channels = decode_audio(payload)
        return _stats_vector(samples.ravel().astype(np.float64), n_features)
    if payload[:4] == b"RVID":
        frames, _fps = decode_video(payload)
        return _stats_vector(frames.ravel().astype(np.float64), n_features)
    raise ValueError(
        "unknown media container (BMP/PPM, RIFF/WAV, RVID built in); "
        "pass batch_decoder=payload_byte_stats for opaque payloads"
    )


FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def extract_features(media: DataFrame, batch_decoder=decode_features) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, payload column
    dropped on output (decoded features are ~KB where payloads are ~MB —
    never carry both through a shuffle). The default decoder is the REAL
    magic-sniffing `decode_features`; pass `payload_byte_stats` for opaque
    formats with no built-in codec."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [batch_decoder(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": [f.tolist() for f in feats],
                }
            )

    return media.mapInPandas(run, FEATURES_SCHEMA)


def synth_bmp_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic REAL-format media table from the documents testdata:
    payload is a valid 24-bit BMP whose pixels follow a closed-form pattern
    (gray at row-major index t = (doc_id·7 + t) mod 256, width =
    n_chars mod 24 + 4, height = n_chars mod 16 + 4) — so decoded features
    (dims, mean, corner pixel) are SQL-computable from (doc_id, n_chars)
    alone, giving the decode path an exact oracle."""
    gen_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("kind", StringType()),
            StructField("payload", BinaryType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            payloads = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                w = int(n_chars) % 24 + 4
                h = int(n_chars) % 16 + 4
                t = np.arange(w * h, dtype=np.int64)
                gray = ((int(doc_id) * 7 + t) % 256).astype(np.uint8).reshape(h, w)
                payloads.append(encode_bmp_gray(gray))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": ["image"] * len(pdf),
                    "payload": payloads,
                }
            )

    return docs.select("doc_id", "n_chars").mapInPandas(gen, gen_schema)


def synth_wav_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic REAL-format audio table from the documents testdata:
    payload is a valid mono PCM-16 WAV whose samples follow a closed-form
    pattern (sample t = ((a + t) mod 256 − 128)·16 with a = doc_id·11
    mod 256, n = n_chars mod 256 + 16, rate 8000) — so decoded features
    (count, rate, mean, first sample) are SQL-computable from
    (doc_id, n_chars) alone, giving the audio decode path an exact
    oracle (same mod-256 arithmetic-series sum the BMP oracle uses)."""
    gen_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("kind", StringType()),
            StructField("payload", BinaryType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            payloads = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                a = (int(doc_id) * 11) % 256
                n = int(n_chars) % 256 + 16
                t = np.arange(n, dtype=np.int64)
                samples = (((a + t) % 256 - 128) * 16).astype(np.int16)
                payloads.append(encode_wav_pcm16(samples, 8000))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": ["audio"] * len(pdf),
                    "payload": payloads,
                }
            )

    return docs.select("doc_id", "n_chars").mapInPandas(gen, gen_schema)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("sample_rate", LongType()),
        StructField("channels", LongType()),
        StructField("mean_sample", DoubleType()),
        StructField("s0", LongType()),
    ]
)


def audio_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract through the REAL WAV decoder: payload bytes
    in, (sample count, rate, channels, exact-integer-sum mean, first
    sample) out. s0 proves byte order and signedness, not just statistics."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_l, r_l, c_l, m_l, s_l = [], [], [], [], []
            for payload in pdf["payload"]:
                samples, rate, channels = decode_audio(bytes(payload))
                n = samples.shape[0]
                n_l.append(n)
                r_l.append(rate)
                c_l.append(channels)
                m_l.append(float(int(samples.astype(np.int64).sum())) / (n * channels))
                s_l.append(int(samples[0, 0]))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_samples": n_l,
                    "sample_rate": r_l,
                    "channels": c_l,
                    "mean_sample": m_l,
                    "s0": s_l,
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, AUDIO_FEATURES_SCHEMA)


IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("mean_pixel", DoubleType()),
        StructField("px00", LongType()),
        StructField("pxhw", LongType()),
    ]
)


def image_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract through the REAL decoder: Arrow batches of
    payload bytes in, (width, height, mean gray, corner grays) out. The
    mean is an exact integer sum / n (deterministic double); px00 (top-left)
    and pxhw (bottom-right) prove the decoder reconstructs row order and
    extent, not just byte statistics."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w_l, h_l, mean_l, px_l, pc_l = [], [], [], [], []
            for payload in pdf["payload"]:
                rgb = decode_image(bytes(payload))
                gray = rgb.astype(np.int64).sum(axis=2) // 3  # r=g=b → exact
                h, w = gray.shape
                w_l.append(w)
                h_l.append(h)
                mean_l.append(float(gray.sum()) / (w * h))
                px_l.append(int(gray[0, 0]))
                pc_l.append(int(gray[-1, -1]))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": w_l,
                    "height": h_l,
                    "mean_pixel": mean_l,
                    "px00": px_l,
                    "pxhw": pc_l,
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def resize_image_nn(payload: bytes, width: int, height: int) -> bytes:
    """REAL image resize: decode (BMP/PPM codec), nearest-neighbor resample
    with floor index mapping (src_y = y·H//height, src_x = x·W//width —
    engine-portable integer arithmetic, so resized pixels are closed-form
    functions of the source pattern), re-encode as 24-bit BMP."""
    rgb = decode_image(bytes(payload))
    h, w = rgb.shape[:2]
    ys = (np.arange(int(height)) * h) // int(height)
    xs = (np.arange(int(width)) * w) // int(width)
    return encode_bmp_rgb(rgb[ys][:, xs])


def resize_images(
    media: DataFrame, width: int, height: int, batch_resizer=resize_image_nn
) -> DataFrame:
    """mapInPandas image resize: Arrow batches of (id, payload) in, resized
    payload + updated meta out. Only image rows pass through the Python
    stage — the filter happens JVM-side before any byte crosses to Arrow.
    Default kernel is the REAL decode → nearest-neighbor → re-encode path
    (`resize_image_nn`); output payloads are valid BMPs of the target
    dimensions, so the result feeds straight back into `image_features`."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": [batch_resizer(p, width, height) for p in pdf["payload"]],
                    "width": np.full(len(pdf), width, dtype=np.int64),
                    "height": np.full(len(pdf), height, dtype=np.int64),
                }
            )

    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("kind", StringType()),
            StructField("payload", BinaryType()),
            StructField("width", LongType()),
            StructField("height", LongType()),
        ]
    )
    return (
        media.where(F.col("kind") == "image")
        .select("media_id", "kind", "payload")
        .mapInPandas(run, out_schema)
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN from metadata alone: one output row per
    sampled timestamp (explode over the grid) — no payload bytes touched,
    so it prunes to the meta struct at scan time. Pair with
    `sample_frames` when the sampled frames should actually be decoded."""
    # floor (not cast) — engine-portable truncation semantics
    n_frames = F.floor(F.col("meta.duration_ms") / every_ms)
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
            ).alias("frame_idx"),
        )
        .withColumn("ts_ms", F.col("frame_idx") * every_ms)
    )


def synth_video_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic REAL-format video table from the documents testdata:
    payload is a valid RVID raw-frame container whose frames follow a
    closed-form pattern (frame f, row-major pixel t: gray =
    (doc_id·13 + f·17 + t) mod 256; width = n_chars mod 12 + 4, height =
    n_chars mod 8 + 4, n_frames = n_chars mod 6 + 2, fps = 1) — so decoded
    features (dims, frame count, per-frame and whole-video means, corner
    pixels) are SQL-computable from (doc_id, n_chars) alone, giving the
    video decode path an exact oracle (same mod-256 arithmetic-series sums
    as the BMP/WAV patterns). meta.duration_ms = n_frames·1000 (fps 1)."""
    gen_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("kind", StringType()),
            StructField("payload", BinaryType()),
            StructField(
                "meta",
                StructType(
                    [
                        StructField("width", LongType()),
                        StructField("height", LongType()),
                        StructField("duration_ms", LongType()),
                        StructField("codec", StringType()),
                    ]
                ),
            ),
        ]
    )

    def gen(batches):
        for pdf in batches:
            payloads, metas = [], []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                w = int(n_chars) % 12 + 4
                h = int(n_chars) % 8 + 4
                nf = int(n_chars) % 6 + 2
                a = (int(doc_id) * 13) % 256
                f = np.arange(nf, dtype=np.int64)[:, None]
                t = np.arange(h * w, dtype=np.int64)[None, :]
                frames = ((a + 17 * f + t) % 256).astype(np.uint8).reshape(nf, h, w)
                payloads.append(encode_rawvideo(frames, fps=1))
                metas.append(
                    {
                        "width": w,
                        "height": h,
                        "duration_ms": nf * 1000,
                        "codec": "rawvideo",
                    }
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": ["video"] * len(pdf),
                    "payload": payloads,
                    "meta": metas,
                }
            )

    return docs.select("doc_id", "n_chars").mapInPandas(gen, gen_schema)


VIDEO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("v_frames", LongType()),
        StructField("v_width", LongType()),
        StructField("v_height", LongType()),
        StructField("v_mean_pixel", DoubleType()),
        StructField("v_px000", LongType()),
    ]
)


def video_features(media: DataFrame) -> DataFrame:
    """Whole-video decode + feature-extract through the REAL RVID decoder:
    (frame count, dims, exact mean over every frame's pixels, first pixel
    of frame 0). v_px000 proves frame order and layout, not statistics."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            nf_l, w_l, h_l, m_l, p_l = [], [], [], [], []
            for payload in pdf["payload"]:
                frames, _fps = decode_video(bytes(payload))
                nf, h, w = frames.shape
                nf_l.append(nf)
                w_l.append(w)
                h_l.append(h)
                if nf == 0:  # valid zero-frame container: no pixel stats
                    m_l.append(None)
                    p_l.append(None)
                    continue
                m_l.append(float(frames.astype(np.int64).sum()) / (nf * h * w))
                p_l.append(int(frames[0, 0, 0]))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "v_frames": nf_l,
                    "v_width": w_l,
                    "v_height": h_l,
                    "v_mean_pixel": m_l,
                    "v_px000": p_l,
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, VIDEO_FEATURES_SCHEMA)


FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("ts_ms", LongType()),
        StructField("frame_mean", DoubleType()),
        StructField("fpx00", LongType()),
    ]
)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling WITH real per-frame decode: each video payload is
    decoded ONCE inside the Arrow batch (no join back to bytes, no repeat
    decode per sample) and one row per sampled timestamp is emitted with
    that frame's exact mean and first pixel. Sample grid matches
    `frame_sample_plan`: floor(duration_ms/every_ms) samples (min 1) at
    timestamps 0, every_ms, …; frame index = min(ts·fps/1000, n_frames−1).
    Zero-frame videos emit no rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "frame_idx", "ts_ms", "frame_mean", "fpx00")}
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                frames, fps = decode_video(bytes(payload))
                nf, h, w = frames.shape
                if nf == 0:
                    continue
                duration_ms = (nf * 1000) // max(fps, 1)
                k = max(duration_ms // every_ms, 1)
                for s in range(int(k)):
                    ts = s * every_ms
                    fi = min((ts * fps) // 1000, nf - 1)
                    frame = frames[fi].astype(np.int64)
                    rows["media_id"].append(int(media_id))
                    rows["frame_idx"].append(int(fi))
                    rows["ts_ms"].append(int(ts))
                    rows["frame_mean"].append(float(frame.sum()) / (h * w))
                    rows["fpx00"].append(int(frame[0, 0]))
            yield pd.DataFrame(rows)

    return (
        media.where(F.col("kind") == "video")
        .select("media_id", "payload")
        .mapInPandas(run, FRAME_SAMPLE_SCHEMA)
    )
