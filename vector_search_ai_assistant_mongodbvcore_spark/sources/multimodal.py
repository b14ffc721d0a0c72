"""Multimodal column plumbing: binary payloads + typed metadata.

Extended surface (BASELINE.json north star). Image/audio/video payloads are
opaque `binary` columns with a typed metadata struct; decode/feature-extract
run as Arrow-batched `mapInPandas` so each task touches a bounded number of
payloads at a time (contrast: collecting binaries to the driver).

The actual codecs (PIL/librosa/ffmpeg) are NOT in this container, so the
decode kernel is stubbed: `decode_image_batch` raises NotImplementedError
unless a `decoder=` kernel is injected; tests inject a deterministic fake.
The Spark-side contract — schema, batch iteration, partition sizing — is
real and tested; swapping the kernel for PIL on a real cluster changes no
plan shape.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType(), nullable=True),
        T.StructField("height", T.IntegerType(), nullable=True),
        T.StructField("duration_ms", T.IntegerType(), nullable=True),
        T.StructField("payload", T.BinaryType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)


def _default_decoder(payload: bytes) -> np.ndarray:
    raise NotImplementedError(
        "No image/audio codec in this container. Inject decoder= (e.g. a "
        "PIL/librosa kernel) or use fake_decoder for tests."
    )


def fake_decoder(payload: bytes) -> np.ndarray:
    """Deterministic stand-in: 8-dim feature from byte statistics."""
    if not payload:
        return np.zeros(8, dtype=np.float32)
    a = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    return np.array(
        [
            a.mean(),
            a.std(),
            a.min(),
            a.max(),
            float(len(a)),
            a[0],
            a[-1],
            float((a > 127).mean()),
        ],
        dtype=np.float32,
    )


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes], np.ndarray] | None = None,
    batch_rows: int = 64,
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    `batch_rows` bounds per-task memory (payloads × batch) — the knob that
    matters when a partition holds 4K-video blobs; Arrow already caps batch
    bytes, this caps row count for fat rows."""
    kernel = decoder or _default_decoder

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                feats, oks = [], []
                for payload in chunk["payload"]:
                    try:
                        feats.append(kernel(bytes(payload) if payload is not None else b""))
                        oks.append(True)
                    except NotImplementedError:
                        raise
                    except Exception:
                        feats.append(np.zeros(1, dtype=np.float32))
                        oks.append(False)
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].values,
                        "feature": [f.astype(np.float32) for f in feats],
                        "decode_ok": oks,
                    }
                )

    return media.select("media_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resize_ok", T.BooleanType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def fake_resizer(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in: clamps/pads the byte stream to width*height
    bytes — size semantics without a codec (a real kernel is
    PIL.Image.resize + re-encode)."""
    target = max(1, width * height)
    a = (payload or b"\x00")
    return (a * (target // len(a) + 1))[:target]


def resize_media(
    media: DataFrame,
    width: int,
    height: int,
    resizer: Callable[[bytes, int, int], bytes] | None = None,
    batch_rows: int = 64,
) -> DataFrame:
    """Batch resize: one Arrow pass, `batch_rows` payloads in memory per
    step (the fat-row knob, same as extract_features). Output rows carry
    the NEW dimensions; a payload the kernel rejects comes through
    unresized with resize_ok=false (quarantine downstream, don't lose the
    row). Stubbed kernel: raises NotImplementedError unless `resizer=` is
    injected (no codec in this container); the fake keeps plumbing tests
    deterministic."""

    def _default(payload: bytes, w: int, h: int) -> bytes:
        raise NotImplementedError(
            "No image codec in this container. Inject resizer= (e.g. a PIL "
            "kernel) or use fake_resizer for tests."
        )

    kernel = resizer or _default

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                outs, oks = [], []
                for payload in chunk["payload"]:
                    raw = bytes(payload) if payload is not None else b""
                    try:
                        outs.append(kernel(raw, width, height))
                        oks.append(True)
                    except NotImplementedError:
                        raise
                    except Exception:
                        outs.append(raw)
                        oks.append(False)
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].values,
                        "payload": outs,
                        "width": width,
                        "height": height,
                        "resize_ok": oks,
                    }
                )

    return media.select("media_id", "payload").mapInPandas(run, RESIZED_SCHEMA)


def pyav_frame_sampler() -> Callable[[bytes, int], "list[bytes]"]:
    """REAL video frame-decode kernel (the `[video]` pip extra: PyAV +
    Pillow): decode the payload's first video stream, pick n frames
    uniformly across the decoded sequence, and return each as PNG bytes
    — a self-describing frame payload downstream decoders (the image
    kernels above) consume directly.

    Import-gated factory, same discipline as the PIL/hnswlib/tiktoken
    kernels: calling this without the extra raises ImportError at
    FACTORY time (driver-side, before any Spark job), never inside an
    executor task; the deterministic fake_frame_sampler below stays the
    default for tests and codec-less containers."""
    import io

    import av
    from PIL import Image  # noqa: F401 — frame.to_image() needs Pillow

    def sampler(payload: bytes, n: int) -> "list[bytes]":
        if not payload or n <= 0:
            return []
        with av.open(io.BytesIO(payload)) as container:
            frames = list(container.decode(video=0))
        if not frames:
            return []
        n = min(n, len(frames))
        idxs = [int(i * len(frames) / n) for i in range(n)]
        out: "list[bytes]" = []
        for i in idxs:
            buf = io.BytesIO()
            frames[i].to_image().save(buf, format="PNG")
            out.append(buf.getvalue())
        return out

    return sampler


def fake_frame_sampler(payload: bytes, n_frames: int) -> "list[bytes]":
    """Deterministic stand-in: n_frames equal byte slices (a real kernel is
    ffmpeg keyframe extraction)."""
    raw = payload or b""
    if not raw or n_frames <= 0:
        return []
    step = max(1, len(raw) // n_frames)
    return [raw[i * step : (i + 1) * step] or raw[-step:] for i in range(n_frames)]


def sample_frames(
    media: DataFrame,
    n_frames: int = 4,
    sampler: Callable[[bytes, int], "list[bytes]"] | None = None,
    batch_rows: int = 16,
) -> DataFrame:
    """Frame sampling for video payloads: each input row EXPLODES into up
    to n_frames (media_id, frame_idx, ts_ms, payload) rows — the shape a
    frame-level feature extractor consumes. ts_ms is spread uniformly
    over duration_ms when the metadata carries one (NULL otherwise).
    Same bounded-batch Arrow pass; stubbed kernel unless `sampler=` is
    injected."""

    def _default(payload: bytes, n: int) -> "list[bytes]":
        raise NotImplementedError(
            "No video codec in this container. Inject sampler= (e.g. an "
            "ffmpeg kernel) or use fake_frame_sampler for tests."
        )

    kernel = sampler or _default
    has_duration = "duration_ms" in media.columns
    cols = ["media_id", "payload"] + (["duration_ms"] if has_duration else [])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                out = {"media_id": [], "frame_idx": [], "ts_ms": [], "payload": []}
                for _, row in chunk.iterrows():
                    raw = bytes(row["payload"]) if row["payload"] is not None else b""
                    frames = kernel(raw, n_frames)
                    dur = row["duration_ms"] if has_duration else None
                    for i, fr in enumerate(frames):
                        out["media_id"].append(row["media_id"])
                        out["frame_idx"].append(i)
                        out["ts_ms"].append(
                            int(dur * i / max(1, len(frames))) if dur is not None and not pd.isna(dur) else None
                        )
                        out["payload"].append(fr)
                yield pd.DataFrame(out)

    return media.select(*cols).mapInPandas(run, FRAME_SCHEMA)
