"""Token-budgeted prompt construction (proportional trim).

Reference: ChatService.BuildPrompts
(/root/reference/Search/Services/ChatService.cs:172-243):

    ragTokens  = len(encode(ragPayload))           (:183-192)
    convTokens = len(encode(conversation))
    promptTokens = len(encode(userPrompt))
    estimate = ragTokens + convTokens + promptTokens + BUFFER(200)   (:180,:196)
    if estimate > maxCompletionTokens:
        tokensToReduce = estimate - maxCompletionTokens              (:202)
        ragPct  = ragTokens  / (ragTokens + convTokens)              (:205-206)
        newRag  = round(ragTokens  - ragPct  * tokensToReduce)       (:208)
        newConv = round(convTokens - convPct * tokensToReduce)       (:210)
        rag  = decode(encode(rag)[:newRag])      # HEAD slice  (:214)
        conv = decode(encode(conv)[-newConv:])   # TAIL slice  (:218-221)

Quirks preserved: the 200-token buffer is counted in the estimate but not
restored after trimming; RAG keeps its head, conversation keeps its tail;
`round()` is banker's-free midpoint rounding (C# Math.Round default is
banker's — MidpointRounding.ToEven — matching Spark's ROUND HALF_UP would
diverge at exact .5; we preserve C# semantics with bround()).

Implemented as a pure column program plus two Arrow-batched slice UDFs, so it
trims MILLIONS of (rag, conversation, prompt) triples per pass — the
reference trims one triple per chat turn.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.functions.tokenizer import (
    count_tokens,
    detokenize_head,
    detokenize_tail,
)

DEFAULT_MAX_COMPLETION_TOKENS = 2000  # Search/appsettings.json:16
TOKEN_ESTIMATE_BUFFER = 200  # ChatService.cs:180


def build_prompts(
    df: DataFrame,
    max_tokens: int = DEFAULT_MAX_COMPLETION_TOKENS,
    rag_col: str = "rag_payload",
    conv_col: str = "conversation",
    prompt_col: str = "prompt",
    buffer_tokens: int = TOKEN_ESTIMATE_BUFFER,
) -> DataFrame:
    """Proportionally trim (rag, conversation) so that
    rag + conversation + prompt + buffer <= max_tokens.

    Adds columns: trimmed_rag, trimmed_conversation, rag_tokens_out,
    conv_tokens_out."""
    d = (
        df.withColumn("_rag_t", count_tokens(F.col(rag_col)))
        .withColumn("_conv_t", count_tokens(F.col(conv_col)))
        .withColumn("_prompt_t", count_tokens(F.col(prompt_col)))
    )
    estimate = F.col("_rag_t") + F.col("_conv_t") + F.col("_prompt_t") + F.lit(buffer_tokens)
    to_reduce = (estimate - F.lit(max_tokens)).cast("double")
    denom = (F.col("_rag_t") + F.col("_conv_t")).cast("double")
    rag_pct = F.when(denom > 0, F.col("_rag_t") / denom).otherwise(F.lit(0.0))
    conv_pct = F.when(denom > 0, F.col("_conv_t") / denom).otherwise(F.lit(0.0))
    # C# Math.Round = banker's rounding -> Spark bround()
    new_rag = F.bround(F.col("_rag_t") - rag_pct * to_reduce).cast("int")
    new_conv = F.bround(F.col("_conv_t") - conv_pct * to_reduce).cast("int")
    over = estimate > max_tokens

    d = (
        d.withColumn("rag_tokens_out", F.when(over, F.greatest(new_rag, F.lit(0))).otherwise(F.col("_rag_t")))
        .withColumn("conv_tokens_out", F.when(over, F.greatest(new_conv, F.lit(0))).otherwise(F.col("_conv_t")))
        .withColumn(
            "trimmed_rag",
            F.when(over, detokenize_head(F.col(rag_col), F.col("rag_tokens_out"))).otherwise(F.col(rag_col)),
        )
        .withColumn(
            "trimmed_conversation",
            F.when(over, detokenize_tail(F.col(conv_col), F.col("conv_tokens_out"))).otherwise(F.col(conv_col)),
        )
    )
    return d.drop("_rag_t", "_conv_t", "_prompt_t")
