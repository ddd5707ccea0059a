"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

``decode_media`` resolves in three tiers: (1) Pillow / soundfile behind an
import guard when those libraries are installed; (2) pure-stdlib REAL
decoders for the two formats this module can itself write — 8-bit
RGB/RGBA non-interlaced PNG (zlib) and PCM WAV (wave) — so the real
decode path is exercised even in containers without media libraries;
(3) a clearly-marked deterministic fake (payload bytes tiled into the
declared shape) for payloads in no parseable format, keeping synthetic
fixtures runnable. Everything Spark-side is real and tested: the schema,
the Arrow batch flow through mapInPandas, partitioning by media kind,
the pluggable BatchEncoder feature contract, and frame sampling.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (BinaryType, IntegerType, LongType, StringType,
                               StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),          # image | audio | video
    StructField("payload", BinaryType()),       # opaque encoded bytes
    StructField("meta", StructType([
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("mime", StringType()),
    ])),
])

_KINDS = ("image", "audio", "video")


def synth_media_table(spark: SparkSession, n: int = 300,
                      seed: int = 1337) -> DataFrame:
    """Deterministic synthetic media rows (payload = seeded random bytes)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        kind = _KINDS[i % 3]
        size = int(rng.integers(256, 4096))
        payload = rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
        meta = {
            "width": int(rng.integers(16, 256)) if kind != "audio" else 0,
            "height": int(rng.integers(16, 256)) if kind != "audio" else 0,
            "n_frames": int(rng.integers(2, 32)) if kind == "video" else 1,
            "sample_rate": 16_000 if kind == "audio" else 0,
            "mime": {"image": "image/fake", "audio": "audio/fake",
                     "video": "video/fake"}[kind],
        }
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _png_decode(payload: bytes) -> np.ndarray | None:
    """Minimal pure-stdlib PNG decoder (zlib): 8-bit RGB/RGBA,
    non-interlaced, all five scanline filters (PNG spec, RFC 2083 §6).
    Returns (h, w, 3) uint8, or None when the payload is not such a PNG.
    This is the real-decode fallback for containers without Pillow."""
    import struct
    import zlib

    if not payload.startswith(b"\x89PNG\r\n\x1a\n"):
        return None
    pos, w = 8, None
    idat = bytearray()
    try:
        while pos + 8 <= len(payload):
            (ln,) = struct.unpack(">I", payload[pos:pos + 4])
            typ = payload[pos + 4:pos + 8]
            data = payload[pos + 8:pos + 8 + ln]
            pos += 12 + ln
            if typ == b"IHDR":
                w, h, depth, ctype, _comp, _filt, inter = struct.unpack(
                    ">IIBBBBB", data)
                if depth != 8 or ctype not in (2, 6) or inter != 0:
                    return None
                ch = 3 if ctype == 2 else 4
            elif typ == b"IDAT":
                idat += data
            elif typ == b"IEND":
                break
        if w is None:
            return None
        raw = zlib.decompress(bytes(idat))
    except Exception:
        return None
    stride = w * ch
    if len(raw) != h * (stride + 1):
        return None
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(raw, np.uint8, stride,
                             y * (stride + 1) + 1).astype(np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 2:
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):
            # left-dependent filters are sequential along the scanline
            cur = np.empty(stride, dtype=np.int32)
            for x in range(stride):
                left = cur[x - ch] if x >= ch else 0
                up = prev[x]
                ul = prev[x - ch] if x >= ch else 0
                if ftype == 1:
                    pred = left
                elif ftype == 3:
                    pred = (left + up) >> 1
                else:   # Paeth
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if (pa <= pb and pa <= pc) else \
                        (up if pb <= pc else ul)
                cur[x] = (line[x] + pred) & 0xFF
        else:
            return None
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w, ch)[:, :, :3].copy()


def _wav_decode(payload: bytes) -> np.ndarray | None:
    """Pure-stdlib PCM WAV decoder (wave module): 8/16-bit, any channel
    count (mono returns 1-D float32 in [-1, 1]). The real-decode fallback
    for containers without soundfile."""
    import io
    import wave

    if not (payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"):
        return None
    try:
        with wave.open(io.BytesIO(payload), "rb") as wv:
            ch, sw = wv.getnchannels(), wv.getsampwidth()
            raw = wv.readframes(wv.getnframes())
    except Exception:
        return None
    if sw == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 1:
        data = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        return None
    return data.reshape(-1, ch) if ch > 1 else data


def _decode_image_real(payload: bytes) -> np.ndarray | None:
    """Pillow decode when importable, else the stdlib PNG decoder; None
    when the payload is not a parseable image (fall through to the fake
    decoder so synthetic fixtures keep working everywhere)."""
    try:
        import io

        from PIL import Image
    except ImportError:
        return _png_decode(payload)
    try:
        with Image.open(io.BytesIO(payload)) as im:
            return np.asarray(im.convert("RGB"))
    except Exception:
        return _png_decode(payload)


def _decode_audio_real(payload: bytes) -> np.ndarray | None:
    try:
        import io

        import soundfile as sf
    except ImportError:
        return _wav_decode(payload)
    try:
        data, _rate = sf.read(io.BytesIO(payload), dtype="float32")
        return np.asarray(data, dtype=np.float32)
    except Exception:
        return _wav_decode(payload)


def encode_png(arr: np.ndarray, *, compress_level: int = 6,
               filters=None) -> bytes:
    """Write an 8-bit RGB array as a real PNG (pure stdlib).

    ``filters`` optionally gives a per-row scanline filter type (0-4,
    cycled if shorter than the image); real PNG writers pick filters per
    row, and tests use this to exercise every decode filter path.
    Different ``compress_level`` / ``filters`` choices yield
    byte-DIFFERENT payloads for the SAME pixels — which is how tests
    prove features come from decoded content, not payload bytes."""
    import struct
    import zlib

    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w = arr.shape[:2]
    stride = w * 3
    prev = np.zeros(stride, dtype=np.int32)
    raw = bytearray()
    for y in range(h):
        cur = arr[y].reshape(-1).astype(np.int32)
        ft = 0 if not filters else int(filters[y % len(filters)])
        left = np.concatenate([np.zeros(3, np.int32), cur[:-3]])
        ul = np.concatenate([np.zeros(3, np.int32), prev[:-3]])
        if ft == 0:
            enc = cur
        elif ft == 1:
            enc = (cur - left) & 0xFF
        elif ft == 2:
            enc = (cur - prev) & 0xFF
        elif ft == 3:
            enc = (cur - ((left + prev) >> 1)) & 0xFF
        elif ft == 4:
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prev, ul))
            enc = (cur - pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        raw += bytes([ft]) + enc.astype(np.uint8).tobytes()
        prev = cur

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw), compress_level))
            + chunk(b"IEND", b""))


def encode_wav(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """Write mono float32 samples in [-1, 1] as a real 16-bit PCM WAV."""
    import io
    import wave

    pcm = np.clip(np.asarray(samples, dtype=np.float32), -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(rate)
        wv.writeframes(pcm.tobytes())
    return buf.getvalue()


def decode_media(payload: bytes, meta: dict, kind: str) -> np.ndarray:
    """Decode one media payload to an ndarray.

    The REAL path (Pillow for images, soundfile for audio) is used whenever
    those libraries import AND the payload parses; otherwise the
    deterministic FAKE decoder (payload bytes tiled into the declared shape)
    runs, so the distributed plumbing is fully testable in containers
    without media libs — and against synthetic non-parseable fixtures."""
    if kind == "image":
        real = _decode_image_real(payload)
        if real is not None:
            return real
    elif kind == "audio":
        real = _decode_audio_real(payload)
        if real is not None:
            return real
    raw = np.frombuffer(payload, dtype=np.uint8)
    if kind == "image":
        h, w = max(meta["height"], 1), max(meta["width"], 1)
        return np.resize(raw, (h, w, 3))
    if kind == "audio":
        return np.resize(raw.astype(np.float32) / 255.0, (meta["sample_rate"],))
    if kind == "video":
        h, w = max(meta["height"], 1), max(meta["width"], 1)
        return np.resize(raw, (max(meta["n_frames"], 1), h, w, 3))
    raise ValueError(f"unknown media kind {kind!r}")


def byte_histogram_encoder(n_dims: int = 64):
    """Default BatchEncoder: L2-normalized histogram of raw payload bytes
    mod ``n_dims``. Cheap and deterministic; no decode step."""
    def encode(pdf: pd.DataFrame) -> np.ndarray:
        out = np.zeros((len(pdf), n_dims), dtype=np.float32)
        for i, payload in enumerate(pdf["payload"]):
            raw = np.frombuffer(payload, dtype=np.uint8)
            hist = np.bincount(raw % n_dims, minlength=n_dims).astype(np.float64)
            norm = np.linalg.norm(hist)
            out[i] = hist / norm if norm else hist
        return out

    return encode


def decoded_histogram_encoder(n_dims: int = 64):
    """BatchEncoder over DECODED content: ``decode_media`` runs first
    (Pillow/soundfile, or the stdlib PNG/WAV decoders, whichever parses),
    then the decoded pixels / quantized samples are histogrammed. Two
    byte-different encodings of the same content (e.g. the same pixels at
    two zlib levels) map to IDENTICAL features — unlike the byte
    histogram, which sees only the compressed payload."""
    def encode(pdf: pd.DataFrame) -> np.ndarray:
        out = np.zeros((len(pdf), n_dims), dtype=np.float32)
        for i, (payload, meta, kind) in enumerate(
                zip(pdf["payload"], pdf["meta"], pdf["kind"])):
            arr = decode_media(payload, dict(meta), kind)
            if arr.dtype == np.uint8:
                bins = arr.reshape(-1).astype(np.int64) % n_dims
            else:   # float samples in [-1, 1] -> n_dims equal-width bins
                flat = np.clip(arr.reshape(-1).astype(np.float64), -1.0, 1.0)
                bins = np.minimum(((flat + 1.0) * (n_dims / 2.0)).astype(np.int64),
                                  n_dims - 1)
            hist = np.bincount(bins, minlength=n_dims).astype(np.float64)
            norm = np.linalg.norm(hist)
            out[i] = hist / norm if norm else hist
        return out

    return encode


def extract_features(df: DataFrame, *, n_dims: int = 64,
                     encoder=None) -> DataFrame:
    """(media_id, kind, feature array<float>) — batch feature extraction.

    ``encoder`` is the pluggable BatchEncoder contract: a callable taking
    one Arrow-backed pandas batch with columns (media_id, kind, payload,
    meta) and returning a float32 matrix of shape ``(len(batch), n_dims)``
    — row i is the feature vector of batch row i. Swap in a real model
    encoder (CLIP, wav2vec, ...) without touching the Spark plumbing;
    the default is the no-decode ``byte_histogram_encoder``. The shape is
    validated per batch so a misbehaving encoder fails loudly in the task,
    not silently downstream."""
    enc = encoder if encoder is not None else byte_histogram_encoder(n_dims)

    def fn(pdf_iter):
        for pdf in pdf_iter:
            feats = np.asarray(enc(pdf), dtype=np.float32)
            if feats.shape != (len(pdf), n_dims):
                raise ValueError(
                    f"BatchEncoder returned shape {feats.shape}, expected "
                    f"{(len(pdf), n_dims)}")
            yield pd.DataFrame({
                "media_id": pdf["media_id"].to_numpy(),
                "kind": pdf["kind"],
                "feature": list(feats),
            })

    return df.select("media_id", "kind", "payload", "meta").mapInPandas(
        fn, schema="media_id long, kind string, feature array<float>")


def sample_frames(df: DataFrame, *, every: int = 4) -> DataFrame:
    """(media_id, frame_idx, frame_bytes) for video rows — frame sampling
    with the decode behind the stub. One output row per sampled frame."""
    def fn(pdf_iter):
        for pdf in pdf_iter:
            ids, idxs, frames = [], [], []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"],
                                          pdf["meta"]):
                arr = decode_media(payload, meta, "video")
                for fi in range(0, arr.shape[0], every):
                    ids.append(mid)
                    idxs.append(fi)
                    frames.append(arr[fi].tobytes())
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs,
                                "frame": frames})

    return (df.filter(F.col("kind") == "video")
            .select("media_id", "payload", "meta")
            .mapInPandas(fn, schema="media_id long, frame_idx int, frame binary"))
