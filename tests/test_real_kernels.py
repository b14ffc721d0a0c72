"""Integration tests for the OPTIONAL real kernels behind the engine's
injectable seams (pyproject.toml extras [tiktoken]/[hnsw]/[media]).

Each seam is fully exercised with deterministic doubles elsewhere in the
suite; these tests run the REAL kernel through the same engine plumbing
when the extra is installed, and skip cleanly when it is not (this
container ships none of them — the skips are the expected outcome
here)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_tiktoken_token_counts_through_engine_udf(spark):
    tiktoken = pytest.importorskip("tiktoken")
    from vector_search_ai_assistant_mongodbvcore_spark.functions.tokenizer import (
        count_tokens,
    )

    enc = tiktoken.get_encoding("cl100k_base")
    texts = ["hello world", "the quick brown fox", "tokens, tokens; tokens!"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    got = {
        r["id"]: r["n"]
        for r in df.select("id", count_tokens(F.col("text")).alias("n")).collect()
    }
    want = {i: len(enc.encode(t)) for i, t in enumerate(texts)}
    assert got == want  # the engine UDF defers to tiktoken when importable


def test_bpe_engine_matches_tiktoken_on_real_cl100k_vocab():
    """Algorithm-parity proof for the engine's own byte-pair-merge
    (functions/tokenizer.BpeEncoding): rebuilt from tiktoken's OWN
    cl100k_base mergeable ranks, it must produce identical ids on every
    probe text.  With this green, a cl100k_base.tiktoken file served via
    $SPARK_GRAFT_TIKTOKEN_VOCAB tokenizes exactly like the reference's
    SharpToken — no tiktoken package needed at run time.  (The merge
    kernel itself runs UN-skipped in CI over the committed fixture vocab:
    tests/test_bpe_vocab.py.)"""
    tiktoken = pytest.importorskip("tiktoken")
    from vector_search_ai_assistant_mongodbvcore_spark.functions.tokenizer import (
        BpeEncoding,
    )

    real = tiktoken.get_encoding("cl100k_base")
    mine = BpeEncoding(real._mergeable_ranks, pattern=real._pat_str, name="cl100k")
    probes = [
        "hello world",
        "the quick brown fox jumps over the lazy dog",
        "tokens, tokens; tokens!",
        "don't we'll they've I'm 'tis",
        "1234567890 and 12345.678",
        "unicode: héllo wörld — 日本語テキスト 🚀",
        "   leading spaces\nand\r\nnewlines\t tabs",
        "CamelCase snake_case kebab-case ALLCAPS",
    ]
    for t in probes:
        assert mine.encode(t) == real.encode(t), t
        assert mine.decode(mine.encode(t)) == t


def test_hnswlib_kernel_through_partitioned_ann(spark):
    pytest.importorskip("hnswlib")
    from vector_search_ai_assistant_mongodbvcore_spark.operators.partitioned_ann import (
        hnsw_index_factory,
        partitioned_ann_topk,
    )

    rng = np.random.default_rng(5)
    rows = [(i, [float(x) for x in rng.normal(size=16)]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>").repartition(4)
    q = [float(x) for x in rng.normal(size=16)]
    got = partitioned_ann_topk(
        df, q, k=10, index_factory=hnsw_index_factory(m=16, ef_construction=64)
    )
    ids = [r["vec_id"] for r in got.collect()]
    assert len(ids) == 10 and len(set(ids)) == 10
    # HNSW is approximate: require strong overlap with the exact top-k,
    # not equality
    exact = partitioned_ann_topk(df, q, k=10)
    exact_ids = {r["vec_id"] for r in exact.collect()}
    assert len(set(ids) & exact_ids) >= 8


def test_pil_resize_kernel_through_multimodal_plumbing(spark):
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    from vector_search_ai_assistant_mongodbvcore_spark.sources.multimodal import (
        MEDIA_SCHEMA,
        resize_media,
    )

    def pil_resizer(payload: bytes, w: int, h: int) -> bytes:
        img = PIL_Image.open(io.BytesIO(payload)).resize((w, h))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    def png(w, h):
        img = PIL_Image.new("RGB", (w, h), (200, 10, 10))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    media = spark.createDataFrame(
        [
            ("m1", "image", "image/png", 32, 16, None, png(32, 16)),
            ("m2", "image", "image/png", 8, 8, None, png(8, 8)),
        ],
        MEDIA_SCHEMA,
    )
    rows = resize_media(media, 4, 4, resizer=pil_resizer).collect()
    assert len(rows) == 2
    for r in rows:
        assert r["resize_ok"]
        img = PIL_Image.open(io.BytesIO(bytes(r["payload"])))
        assert img.size == (4, 4)


def test_pyav_video_kernel_through_sample_frames(spark):
    """[video] extra: encode a tiny mp4 in memory with PyAV, then drive
    the REAL frame-decode kernel through the engine's sample_frames
    plumbing — uniform sampling, PNG frame payloads, ts spread over
    duration_ms. Skips cleanly when av/Pillow are absent."""
    av = pytest.importorskip("av")
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    import numpy as np

    from vector_search_ai_assistant_mongodbvcore_spark.sources.multimodal import (
        MEDIA_SCHEMA,
        pyav_frame_sampler,
        sample_frames,
    )

    def tiny_mp4(n_frames: int = 12, w: int = 32, h: int = 16) -> bytes:
        buf = io.BytesIO()
        with av.open(buf, mode="w", format="mp4") as out:
            stream = out.add_stream("mpeg4", rate=6)
            stream.width, stream.height, stream.pix_fmt = w, h, "yuv420p"
            for i in range(n_frames):
                arr = np.full((h, w, 3), i * 20 % 255, dtype=np.uint8)
                frame = av.VideoFrame.from_ndarray(arr, format="rgb24")
                for packet in stream.encode(frame):
                    out.mux(packet)
            for packet in stream.encode():
                out.mux(packet)
        return buf.getvalue()

    media = spark.createDataFrame(
        [("v1", "video", "video/mp4", 32, 16, 2000, tiny_mp4())], MEDIA_SCHEMA
    )
    rows = sample_frames(media, n_frames=4, sampler=pyav_frame_sampler()).collect()
    assert len(rows) == 4
    assert [r["frame_idx"] for r in rows] == [0, 1, 2, 3]
    assert [r["ts_ms"] for r in rows] == [0, 500, 1000, 1500]
    for r in rows:
        img = PIL_Image.open(io.BytesIO(bytes(r["payload"])))
        assert img.size == (32, 16)
