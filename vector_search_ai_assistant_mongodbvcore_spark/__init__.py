"""PySpark-native analytics engine with the data-processing capabilities of
Azure/Vector-Search-AI-Assistant-MongoDBvCore (a RAG assistant over Cosmos DB
for MongoDB vCore), re-expressed Spark-first for 100 TB scale.

The reference (see /root/reference, SURVEY.md) computes:
  * batch ingest + vectorize  (Vectorize/IngestAndVectorize.cs:52-94)
  * vector index build (HNSW/IVF) + top-k cosine search
    (SharedLib/Services/MongoDbService.cs:76-239)
  * conversation-history token-budget windows (Search/Services/ChatService.cs:248-271)
  * token-budgeted prompt construction (Search/Services/ChatService.cs:172-243)
  * session/message CRUD + transactions (SharedLib/Services/MongoDbService.cs:442-613)

This package expresses those semantics — plus the LLM-data-pipeline surface
(dedup, decontamination, DSIR selection, quality scoring, vocab/BPE
training, similarity join, packing + shard export, mixture/curriculum
planning, audits, text analysis, multimodal plumbing) — as DataFrame
operators planned by Catalyst, not as a port of the C# service code.

Layout:
  functions/   pure column kit: vector math, text stats, tokenizer, embedder
  operators/   relational + vector operators: top-k search, IVF, dedup, trim
  sources/     loaders and the mutable-table (upsert/delete/txn) layer
  streaming/   incremental embed/upsert pipelines (Structured Streaming)
  plans/       plan inspection + scale guardrails (explain helpers)
"""

from vector_search_ai_assistant_mongodbvcore_spark.session import get_spark, load_tables

__all__ = ["get_spark", "load_tables"]
__version__ = "0.1.0"
