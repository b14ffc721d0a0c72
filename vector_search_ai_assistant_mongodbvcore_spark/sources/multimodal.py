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
