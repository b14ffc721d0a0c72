"""AzureOpenAITransport (functions/openai_transport.py): the wire
adapter's contract against fake HTTP injecting 429/5xx/timeout/auth
faults, composed with the Remote* sources' x10 exponential retry
(OpenAiService.cs:97-105 parity) — judge r12 directive #4's done
criterion."""

from __future__ import annotations

import json

import numpy as np
import pytest

from vector_search_ai_assistant_mongodbvcore_spark.functions.completion import (
    RemoteCompleter,
    RemoteSummarizer,
)
from vector_search_ai_assistant_mongodbvcore_spark.functions.embedder import (
    FatalTransportError,
    RemoteEmbedder,
)
from vector_search_ai_assistant_mongodbvcore_spark.functions.openai_transport import (
    AzureOpenAITransport,
    TransientAPIError,
)


def _emb_body(texts, dims=4):
    # deliberately out of order: the adapter must re-sort by index
    data = [
        {"index": i, "embedding": [float(i)] * dims}
        for i in reversed(range(len(texts)))
    ]
    return json.dumps({"data": data, "usage": {"prompt_tokens": 7}}).encode()


def _chat_body(text="hi there", pt=11, ct=3):
    return json.dumps(
        {
            "choices": [{"message": {"role": "assistant", "content": text}}],
            "usage": {"prompt_tokens": pt, "completion_tokens": ct},
        }
    ).encode()


class _FakeHttp:
    """Scripted outcomes: each entry is (status, body) or an exception
    instance to raise; the last entry repeats."""

    def __init__(self, script):
        self.script = list(script)
        self.calls: list[dict] = []

    def __call__(self, url, headers, body, timeout_s):
        self.calls.append(
            {"url": url, "headers": headers, "payload": json.loads(body)}
        )
        step = self.script.pop(0) if len(self.script) > 1 else self.script[0]
        if isinstance(step, Exception):
            raise step
        return step


def _api(script):
    http = _FakeHttp(script)
    return (
        AzureOpenAITransport("https://unit.test.invalid", "k3y", http=http),
        http,
    )


def test_embedding_happy_path_sorts_by_index():
    api, http = _api([(200, _emb_body(["a", "b", "c"]))])
    vecs = api.embedding_transport("emb-deploy")(["a", "b", "c"])
    assert vecs.shape == (3, 4) and vecs.dtype == np.float32
    assert vecs[0][0] == 0.0 and vecs[2][0] == 2.0  # index order restored
    call = http.calls[0]
    assert "/openai/deployments/emb-deploy/embeddings?api-version=" in call["url"]
    assert call["headers"]["api-key"] == "k3y"
    assert call["payload"] == {"input": ["a", "b", "c"]}


def test_429_then_5xx_then_success_is_retried_by_the_source():
    api, http = _api(
        [(429, b"throttle"), (503, b"down"), (200, _emb_body(["x"]))]
    )
    emb = RemoteEmbedder(
        dims=4, transport=api.embedding_transport("d"), base_delay_s=0.0
    )
    vecs, counts = emb._embed_batches(["x"])
    assert vecs.shape == (1, 4)
    assert len(http.calls) == 3  # 2 transient faults + 1 success
    assert counts[0] > 0  # engine-tokenizer fallback (no per-text usage)


def test_timeout_is_transient():
    api, http = _api([TimeoutError("read timed out"), (200, _emb_body(["x"]))])
    emb = RemoteEmbedder(dims=4, transport=api.embedding_transport("d"), base_delay_s=0.0)
    vecs, _ = emb._embed_batches(["x"])
    assert vecs.shape == (1, 4) and len(http.calls) == 2


def test_persistent_5xx_exhausts_exactly_max_retries():
    api, http = _api([(500, b"boom")])
    emb = RemoteEmbedder(
        dims=4, transport=api.embedding_transport("d"), max_retries=10, base_delay_s=0.0
    )
    with pytest.raises(TransientAPIError):
        emb._embed_batches(["x"])
    assert len(http.calls) == 10  # the reference's x10 budget, no more


def test_auth_failure_is_fatal_and_never_retried():
    api, http = _api([(401, b"bad key")])
    emb = RemoteEmbedder(dims=4, transport=api.embedding_transport("d"), base_delay_s=0.0)
    with pytest.raises(FatalTransportError):
        emb._embed_batches(["x"])
    assert len(http.calls) == 1  # exactly one attempt


def test_batching_splits_requests():
    api, http = _api([(200, _emb_body(["a", "b"]))])
    # every scripted response carries 2 vectors, so use batch_size=2 over
    # 4 texts -> exactly 2 API calls
    emb = RemoteEmbedder(dims=4, batch_size=2, transport=api.embedding_transport("d"))
    vecs, _ = emb._embed_batches(["a", "b", "c", "d"])
    assert vecs.shape == (4, 4) and len(http.calls) == 2
    assert http.calls[0]["payload"]["input"] == ["a", "b"]
    assert http.calls[1]["payload"]["input"] == ["c", "d"]


def test_count_mismatch_is_transient():
    api, _ = _api([(200, _emb_body(["only-one"]))])
    with pytest.raises(TransientAPIError, match="1 vectors for 2"):
        api.embedding_transport("d")(["a", "b"])


def test_completion_transport_maps_params_and_usage():
    api, http = _api([(200, _chat_body("the answer", 21, 5))])
    comp = RemoteCompleter(transport=api.completion_transport("gpt-d"), base_delay_s=0.0)
    text, pt, ct = comp._call_with_retry("sys prompt", "user prompt")
    assert (text, pt, ct) == ("the answer", 21, 5)
    payload = http.calls[0]["payload"]
    assert payload["messages"][0] == {"role": "system", "content": "sys prompt"}
    assert payload["messages"][1] == {"role": "user", "content": "user prompt"}
    # OpenAiService.cs:181-186 knobs rode along from the source's params()
    assert payload["temperature"] == pytest.approx(0.3)
    assert payload["top_p"] == pytest.approx(0.95)
    assert "max_tokens" in payload


def test_summarizer_and_fatal_completion():
    api, http = _api([(200, _chat_body("Socks Chat", 9, 2))])
    summ = RemoteSummarizer(transport=api.completion_transport("gpt-d"))
    assert summ._call_with_retry("s", "u")[0] == "Socks Chat"
    api2, http2 = _api([(400, b"content filter")])
    comp = RemoteCompleter(transport=api2.completion_transport("gpt-d"), base_delay_s=0.0)
    with pytest.raises(FatalTransportError):
        comp._call_with_retry("s", "u")
    assert len(http2.calls) == 1


def test_bad_json_200_is_transient_once_recovered():
    api, http = _api([(200, b"<html>proxy error</html>"), (200, _emb_body(["x"]))])
    emb = RemoteEmbedder(dims=4, transport=api.embedding_transport("d"), base_delay_s=0.0)
    vecs, _ = emb._embed_batches(["x"])
    assert vecs.shape == (1, 4) and len(http.calls) == 2


def test_from_env_guidance(monkeypatch):
    monkeypatch.delenv("AZURE_OPENAI_ENDPOINT", raising=False)
    monkeypatch.delenv("AZURE_OPENAI_API_KEY", raising=False)
    with pytest.raises(ValueError, match="AZURE_OPENAI_ENDPOINT"):
        AzureOpenAITransport.from_env()
    monkeypatch.setenv("AZURE_OPENAI_ENDPOINT", "https://x.example")
    monkeypatch.setenv("AZURE_OPENAI_API_KEY", "k")
    api = AzureOpenAITransport.from_env(timeout_s=5.0)
    assert api.endpoint == "https://x.example" and api.timeout_s == 5.0
    with pytest.raises(ValueError):
        AzureOpenAITransport("not-a-url", "k")


def test_spark_end_to_end_with_fake_http(spark):
    """The full Arrow path: RemoteEmbedder over the wire adapter inside a
    pandas_udf, fake HTTP underneath — S8 served through the real stack."""
    api, http = _api([(200, _emb_body(["a", "b"]))])
    emb = RemoteEmbedder(dims=4, batch_size=2, transport=api.embedding_transport("d"))
    df = spark.createDataFrame([("a",), ("b",)], "text string").coalesce(1)
    out = df.select(emb.udf()("text").alias("v")).collect()
    assert all(len(r.v) == 4 for r in out)
