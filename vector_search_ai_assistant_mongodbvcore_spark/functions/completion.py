"""External completion & summarize sources (S9/S10).

Reference: OpenAiService.GetChatCompletionAsync
(/root/reference/SharedLib/Services/OpenAiService.cs:163-209) — (system =
retail-assistant template + documents, user prompt) -> (completion text,
prompt tokens, completion tokens), temperature 0.3, top-p 0.95, frequency/
presence penalty 0, MaxTokens = maxCompletionTokens; and SummarizeAsync
(:217-247) — conversation text -> 1-2-word label, temperature 0.0, top-p 1.0,
MaxTokens 200, with non-alphanumerics regex-stripped from the output (:244,
our F1). Both ride the client's 10x-exponential-backoff retry policy
(:97-105, 2 s base delay).

Spark-first shape mirrors RemoteEmbedder: the transport (one HTTPS call) is
injectable and stubbed here (no network in this container); retry, params,
prompt assembly, the F1 output clean, and BOTH calling forms — driver-side
single call (the reference's per-turn path) and an Arrow-batched struct UDF
(the 100 TB path: millions of (prompt, documents) pairs completed per scan,
e.g. synthetic-data generation / bulk labeling) — are real.

Deterministic local fakes (`fake_completion_transport`,
`fake_summarize_transport`) make every test and harness run hermetic.
"""

from __future__ import annotations

import re
import time
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from vector_search_ai_assistant_mongodbvcore_spark.functions.embedder import FatalTransportError
from vector_search_ai_assistant_mongodbvcore_spark.functions.tokenizer import _encode_py

# OpenAiService.cs:27-37 — system prompt for the chat completion; documents
# are appended directly after it (:169).
SYSTEM_PROMPT_RETAIL_ASSISTANT = """
You are an intelligent assistant for the Cosmic Works Bike Company.
You are designed to provide helpful answers to user questions about
product, product category, customer and sales order information provided in JSON format below.

Instructions:
- Only answer questions related to the information provided below,
- Don't reference any product, customer, or salesOrder data not provided below.
- If you're unsure of an answer, you can say "I don't know" or "I'm not sure" and recommend users search themselves.

Text of relevant information:"""

# OpenAiService.cs:40-41
SUMMARIZE_PROMPT = (
    "Summarize the text below in one or two words to use as a label in a "
    "button on a web page. Output words only. Summarize the text below here:\n"
)

# (text, prompt_tokens, completion_tokens) — OpenAiService.cs:196-200
COMPLETION_TYPE = StructType(
    [
        StructField("text", StringType()),
        StructField("prompt_tokens", IntegerType()),
        StructField("completion_tokens", IntegerType()),
    ]
)

_NON_ALNUM_RE = re.compile(r"[^a-zA-Z0-9\s]")


def clean_summary(text: str) -> str:
    """F1: strip non-alphanumerics from model output (OpenAiService.cs:244)."""
    return _NON_ALNUM_RE.sub("", text or "")


def fake_completion_transport(system: str, user: str, params: dict) -> tuple[str, int, int]:
    """Deterministic local completion: echoes the first words of the user
    prompt with a doc-payload digest — hermetic stand-in for the chat model;
    token counts come from the engine tokenizer (as API usage would)."""
    head = " ".join((user or "").split()[:6])
    text = f"Based on {len(system or '')} chars of context: {head}"
    return text, len(_encode_py((system or "") + (user or ""))), len(_encode_py(text))


def fake_summarize_transport(system: str, user: str, params: dict) -> tuple[str, int, int]:
    """Deterministic local summarizer: the first two words of the text —
    mirrors the 'one or two words' contract and is exactly expressible in
    ANSI SQL, so summarize gets an oracle-paired harness entry."""
    text = " ".join((user or "").split()[:2])
    return text, len(_encode_py((system or "") + (user or ""))), len(_encode_py(text))


class _RemoteChatSource:
    """Shared transport/retry/batching core for completion-shaped calls."""

    def __init__(
        self,
        max_retries: int = 10,
        base_delay_s: float = 2.0,
        transport: Callable[[str, str, dict], tuple[str, int, int]] | None = None,
    ):
        self.max_retries = max_retries  # OpenAiService.cs:101
        self.base_delay_s = base_delay_s  # OpenAiService.cs:100
        self.transport = transport

    def params(self) -> dict:
        raise NotImplementedError

    def _call_api(self, system: str, user: str) -> tuple[str, int, int]:
        if self.transport is not None:
            return self.transport(system, user, self.params())
        raise NotImplementedError(
            "No network transport in this environment; inject `transport=` "
            "(e.g. fake_completion_transport for tests)."
        )

    def _call_with_retry(self, system: str, user: str) -> tuple[str, int, int]:
        delay = self.base_delay_s
        for attempt in range(self.max_retries):
            try:
                return self._call_api(system, user)
            except (NotImplementedError, FatalTransportError):
                raise
            except Exception:
                if attempt == self.max_retries - 1:
                    raise
                time.sleep(delay)
                delay *= 2
        raise RuntimeError("unreachable")


class RemoteCompleter(_RemoteChatSource):
    """S9: (user prompt, documents) -> (completion, prompt/completion tokens).

    Params mirror OpenAiService.cs:181-186: temperature 0.3, top-p 0.95,
    frequency/presence penalty 0, MaxTokens = max_completion_tokens."""

    def __init__(
        self,
        max_completion_tokens: int = 500,  # int.TryParse fallback, OpenAiService.cs:92
        temperature: float = 0.3,
        top_p: float = 0.95,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.max_completion_tokens = max_completion_tokens
        self.temperature = temperature
        self.top_p = top_p

    def params(self) -> dict:
        return {
            "max_tokens": self.max_completion_tokens,
            "temperature": self.temperature,
            "top_p": self.top_p,
            "frequency_penalty": 0,
            "presence_penalty": 0,
        }

    def complete(self, user_prompt: str, documents: str) -> tuple[str, int, int]:
        """Driver-side single call (the reference's per-turn path). The
        system message is the retail template + documents (OpenAiService.cs:169)."""
        return self._call_with_retry(SYSTEM_PROMPT_RETAIL_ASSISTANT + (documents or ""), user_prompt)

    def udf(self):
        """Arrow-batched form: complete(user_prompt_col, documents_col) ->
        struct(text, prompt_tokens, completion_tokens). The scale path for
        bulk generation over millions of rows."""
        cfg = self

        @pandas_udf(COMPLETION_TYPE)
        def complete_batch(
            it: Iterator[tuple[pd.Series, pd.Series]]
        ) -> Iterator[pd.DataFrame]:
            for prompts, docs in it:
                rows = [
                    cfg.complete(p if p is not None else "", d if d is not None else "")
                    for p, d in zip(prompts, docs)
                ]
                yield pd.DataFrame(rows, columns=["text", "prompt_tokens", "completion_tokens"])

        return complete_batch


class RemoteSummarizer(_RemoteChatSource):
    """S10: conversation text -> short label. Params mirror
    OpenAiService.cs:229-235: temperature 0.0, top-p 1.0, MaxTokens 200;
    output is regex-cleaned of non-alphanumerics (:244)."""

    def __init__(self, max_tokens: int = 200, temperature: float = 0.0, top_p: float = 1.0, **kwargs):
        super().__init__(**kwargs)
        self.max_tokens = max_tokens
        self.temperature = temperature
        self.top_p = top_p

    def params(self) -> dict:
        return {
            "max_tokens": self.max_tokens,
            "temperature": self.temperature,
            "top_p": self.top_p,
            "frequency_penalty": 0,
            "presence_penalty": 0,
        }

    def summarize(self, text: str) -> str:
        raw, _, _ = self._call_with_retry(SUMMARIZE_PROMPT, text)
        return clean_summary(raw)

    def udf(self):
        """Arrow-batched form: summarize(text_col) -> label string."""
        cfg = self

        @pandas_udf(StringType())
        def summarize_batch(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
            for s in batches:
                yield s.map(lambda t: cfg.summarize(t if t is not None else ""))

        return summarize_batch
