"""Token-budgeted prompt construction (proportional trim).

Reference: ChatService.BuildPrompts
(/root/reference/Search/Services/ChatService.cs:172-243):

    ragTokens  = len(encode(ragPayload))                 (:186-187)
    convTokens = len(encode(conversation))               (:189-190)
    promptTokens = len(encode(userPrompt))               (:192)
    totalTokens = ragTokens + convTokens + promptTokens + BUFFER(200)  (:196)
    if totalTokens > maxCompletionTokens:
        tokensToReduce = totalTokens - maxCompletionTokens             (:202)
        ragPct  = ragTokens  / totalTokens               (:205)
        convPct = convTokens / totalTokens               (:206)
        newRag  = round(ragTokens  - ragPct  * tokensToReduce)         (:209)
        newConv = round(convTokens - convPct * tokensToReduce)         (:210)
        rag  = decode(encode(rag)[:newRag])          # HEAD slice (:214-216)
        conv = decode(encode(conv)[-newConv:]) + "\n" + prompt   # TAIL (:219-228)
    else:
        rag, conv = ragPayload, conversation + "\n" + prompt     (:233-237)

Quirks preserved: the percentages divide by totalTokens (which includes the
user prompt AND the 200-token buffer), so ragPct + convPct < 1 and the trim
deliberately under-reduces — the output can still exceed the budget; the
buffer is counted in the estimate but never restored after trimming; RAG
keeps its head, conversation keeps its tail; the user prompt is appended to
the conversation with a newline in BOTH branches; `round()` is C#
Math.Round, which defaults to banker's rounding (MidpointRounding.ToEven) —
Spark's ROUND is HALF_UP and would diverge at exact .5, so bround() it is.

Implemented as a pure column program plus two Arrow-batched slice UDFs, so it
trims MILLIONS of (rag, conversation, prompt) triples per pass — the
reference trims one triple per chat turn.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.functions.tokenizer import (
    count_tokens3,
    slice_head_tail,
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
    """Proportionally trim (rag, conversation) when
    rag + conversation + prompt + buffer > max_tokens.

    Adds columns: trimmed_rag, trimmed_conversation, conversation_and_prompt,
    rag_tokens_out, conv_tokens_out.

    Plan shape: TWO Python eval nodes total — one fused count UDF (all three
    texts per Arrow batch) and one fused head/tail slice UDF — instead of
    five chained single-column evals; everything between is codegen'd column
    arithmetic."""
    d = df.withColumn(
        "_counts", count_tokens3(F.col(rag_col), F.col(conv_col), F.col(prompt_col))
    )
    d = (
        d.withColumn("_rag_t", F.col("_counts")[0])
        .withColumn("_conv_t", F.col("_counts")[1])
        .withColumn("_prompt_t", F.col("_counts")[2])
    )
    # ChatService.cs:196 totalTokens — this full estimate is ALSO the
    # percentage denominator (:205-206), so ragPct+convPct < 1 and the
    # reference deliberately under-trims. Do not "fix" to rag+conv.
    total = F.col("_rag_t") + F.col("_conv_t") + F.col("_prompt_t") + F.lit(buffer_tokens)
    to_reduce = (total - F.lit(max_tokens)).cast("double")
    denom = total.cast("double")  # always >= buffer_tokens > 0
    rag_pct = F.col("_rag_t") / denom
    conv_pct = F.col("_conv_t") / denom
    # C# Math.Round = banker's rounding -> Spark bround()
    new_rag = F.bround(F.col("_rag_t") - rag_pct * to_reduce).cast("int")
    new_conv = F.bround(F.col("_conv_t") - conv_pct * to_reduce).cast("int")
    over = total > max_tokens

    d = (
        d.withColumn("rag_tokens_out", F.when(over, F.greatest(new_rag, F.lit(0))).otherwise(F.col("_rag_t")))
        .withColumn("conv_tokens_out", F.when(over, F.greatest(new_conv, F.lit(0))).otherwise(F.col("_conv_t")))
        .withColumn(
            "_sliced",
            slice_head_tail(
                F.col(rag_col), F.col("rag_tokens_out"), F.col(conv_col), F.col("conv_tokens_out")
            ),
        )
        .withColumn(
            "trimmed_rag", F.when(over, F.col("_sliced.head")).otherwise(F.col(rag_col))
        )
        .withColumn(
            "trimmed_conversation",
            F.when(over, F.col("_sliced.tail")).otherwise(F.col(conv_col)),
        )
        # ChatService.cs:228/:237 — both branches end with conv + "\n" + prompt
        .withColumn(
            "conversation_and_prompt",
            F.concat(F.col("trimmed_conversation"), F.lit("\n"), F.col(prompt_col)),
        )
    )
    return d.drop("_rag_t", "_conv_t", "_prompt_t", "_counts", "_sliced")
