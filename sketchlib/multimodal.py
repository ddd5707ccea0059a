"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The decode step itself is STUBBED (this container ships no image/audio
libraries): ``decode_media`` tries Pillow/soundfile behind an import guard
and otherwise uses a deterministic fake decoder (payload bytes tiled into
the declared shape), clearly marked. Everything Spark-side is real and
tested: the schema, the Arrow batch flow through mapInPandas, partitioning
by media kind, batch-shaped feature extraction, and frame sampling.
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


def _decode_image_real(payload: bytes) -> np.ndarray | None:
    """Pillow decode when importable; None when the lib is absent or the
    payload is not a parseable image (fall through to the fake decoder so
    synthetic fixtures keep working in media-lib-equipped deployments)."""
    try:
        import io

        from PIL import Image
    except ImportError:
        return None
    try:
        with Image.open(io.BytesIO(payload)) as im:
            return np.asarray(im.convert("RGB"))
    except Exception:
        return None


def _decode_audio_real(payload: bytes) -> np.ndarray | None:
    try:
        import io

        import soundfile as sf
    except ImportError:
        return None
    try:
        data, _rate = sf.read(io.BytesIO(payload), dtype="float32")
        return np.asarray(data, dtype=np.float32)
    except Exception:
        return None


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


def extract_features(df: DataFrame, *, n_dims: int = 64) -> DataFrame:
    """(media_id, kind, feature array<float>) — batch feature extraction.

    The feature is a deterministic byte-histogram projection (stands in for
    a real encoder); the Arrow batch shape, schema and partition behavior
    are exactly what a real encoder UDF would use."""
    def fn(pdf_iter):
        for pdf in pdf_iter:
            feats = []
            for payload in pdf["payload"]:
                raw = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(raw % n_dims, minlength=n_dims).astype(np.float64)
                norm = np.linalg.norm(hist)
                feats.append((hist / norm if norm else hist).astype(np.float32))
            yield pd.DataFrame({
                "media_id": pdf["media_id"].to_numpy(),
                "kind": pdf["kind"],
                "feature": feats,
            })

    return df.select("media_id", "kind", "payload").mapInPandas(
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
