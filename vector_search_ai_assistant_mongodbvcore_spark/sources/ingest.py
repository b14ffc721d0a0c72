"""Ingest-and-vectorize: the reference's bulk COPY path, Spark-first.

Reference: Vectorize/IngestAndVectorize.cs:52-94 downloads
{products,customers,salesOrders}.json from a blob container, then
MongoDbService.ImportAndVectorizeAsync (:415-439) parses the JSON array and —
SEQUENTIALLY, one HTTPS call per document — embeds and inserts each document.
README.md:154 prices that loop at 5-10 minutes for the demo corpus.

Here:  spark.read.json (any Hadoop filesystem: file/s3a/abfss/gs) ->
serialize each document minus its vector (P2) -> ONE Arrow-batched embedding
pass -> managed table / parquet sink. Throughput scales with
executors × Arrow batch size instead of 1/doc·RTT.

Declared schemas for the reference's retail entities live here too
(SURVEY.md §1.2) — schema-on-read stays available by just omitting them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vector_search_ai_assistant_mongodbvcore_spark.functions.docserde import (
    serialize_document,
)
from vector_search_ai_assistant_mongodbvcore_spark.functions.embedder import (
    HashNgramEmbedder,
)

# SURVEY.md §1.2 — Product (SharedLib/Models/Product.cs:8-35)
PRODUCT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("categoryId", T.StringType()),
        T.StructField("categoryName", T.StringType()),
        T.StructField("sku", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("price", T.DoubleType()),
        T.StructField(
            "tags",
            T.ArrayType(
                T.StructType(
                    [T.StructField("id", T.StringType()), T.StructField("name", T.StringType())]
                )
            ),
        ),
        T.StructField("vector", T.ArrayType(T.FloatType()), nullable=True),
    ]
)

# Customer (SharedLib/Models/Customer.cs:6-43); creationDate stays a STRING
# (reference quirk, Customer.cs:18)
CUSTOMER_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("customerId", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("firstName", T.StringType()),
        T.StructField("lastName", T.StringType()),
        T.StructField("emailAddress", T.StringType()),
        T.StructField("phoneNumber", T.StringType()),
        T.StructField("creationDate", T.StringType()),
        T.StructField(
            "addresses",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("addressLine1", T.StringType()),
                        T.StructField("addressLine2", T.StringType()),
                        T.StructField("city", T.StringType()),
                        T.StructField("state", T.StringType()),
                        T.StructField("country", T.StringType()),
                        T.StructField("zipCode", T.StringType()),
                        T.StructField(
                            "location",
                            T.StructType(
                                [
                                    T.StructField("type", T.StringType()),
                                    T.StructField("coordinates", T.ArrayType(T.FloatType())),
                                ]
                            ),
                        ),
                    ]
                )
            ),
        ),
        T.StructField(
            "password",
            T.StructType(
                [T.StructField("hash", T.StringType()), T.StructField("salt", T.StringType())]
            ),
        ),
        T.StructField("salesOrderCount", T.IntegerType()),
        T.StructField("vector", T.ArrayType(T.FloatType()), nullable=True),
    ]
)

# SalesOrder (SharedLib/Models/SalesOrder.cs:6-28); order/ship dates are
# STRINGS (reference quirk, SalesOrder.cs:13-14)
SALES_ORDER_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("customerId", T.StringType()),
        T.StructField("orderDate", T.StringType()),
        T.StructField("shipDate", T.StringType()),
        T.StructField(
            "details",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("sku", T.StringType()),
                        T.StructField("name", T.StringType()),
                        T.StructField("price", T.DoubleType()),
                        T.StructField("quantity", T.IntegerType()),
                    ]
                )
            ),
        ),
        T.StructField("vector", T.ArrayType(T.FloatType()), nullable=True),
    ]
)

# Session / Message (SharedLib/Models/Session.cs:7-45, Message.cs:6-37) —
# modeled as two tables instead of the reference's single polymorphic
# `completions` collection (SURVEY.md §1.1)
SESSION_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("session_id", T.StringType()),
        T.StructField("tokens_used", T.IntegerType(), nullable=True),
        T.StructField("name", T.StringType()),
    ]
)

MESSAGE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("session_id", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("sender", T.StringType()),
        T.StructField("tokens", T.IntegerType()),
        T.StructField("prompt_tokens", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ]
)

COLLECTION_SCHEMAS = {
    "products": PRODUCT_SCHEMA,
    "customers": CUSTOMER_SCHEMA,
    "salesOrders": SALES_ORDER_SCHEMA,
}


def read_json_collection(
    spark: SparkSession, path: str, collection: str | None = None
) -> DataFrame:
    """S1/S2: read a JSON array of documents. With a known collection name
    the declared schema is applied (nominal edge); otherwise schema-on-read
    inference (the reference ingests BsonDocuments schema-free)."""
    reader = spark.read.option("multiLine", True)
    schema = COLLECTION_SCHEMAS.get(collection or "")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_text_corpus(
    spark: SparkSession,
    path: str,
    fmt: str = "text",
    text_col: str = "text",
    id_col: str = "doc_id",
    **options,
) -> DataFrame:
    """Corpus readers beyond JSON (S1 generalized): one document per line
    ('text'), one document per file ('wholetext' — file path becomes the
    id), CSV/TSV with a header, or parquet/json passthrough. Always returns
    (id_col, text_col, ...): a stable shape every downstream text operator
    (dedup, analysis, embedding) accepts.

    Ids for line-oriented input are monotonically_increasing_id — unique and
    stable within a read, NOT consecutive (the standard Spark caveat)."""
    from pyspark.sql import functions as F

    if fmt == "text":
        df = spark.read.options(**options).text(path)
        return df.select(
            F.monotonically_increasing_id().alias(id_col), F.col("value").alias(text_col)
        )
    if fmt == "wholetext":
        df = spark.read.options(**options).text(path, wholetext=True)
        return df.select(
            F.input_file_name().alias(id_col), F.col("value").alias(text_col)
        )
    if fmt in ("csv", "tsv"):
        reader = spark.read.option("header", True).options(**options)
        if fmt == "tsv":
            reader = reader.option("sep", "\t")
        df = reader.csv(path)
        if id_col not in df.columns:
            df = df.withColumn(id_col, F.monotonically_increasing_id())
        return df
    if fmt == "parquet":
        return spark.read.options(**options).parquet(path)
    if fmt == "json":
        return spark.read.options(**options).json(path)
    raise ValueError(f"unknown corpus format: {fmt}")


def ingest_and_vectorize(
    df: DataFrame,
    embedder=None,
    vector_col: str = "vector",
    usage_col: str | None = None,
    only_missing: bool = False,
) -> DataFrame:
    """Embed every document: doc_text = JSON of all non-vector fields (P2),
    vector = embed(doc_text) in one Arrow-batched pass (replaces the
    reference's per-document HTTPS loop, MongoDbService.cs:422-430).

    With `usage_col`, also records the embedding token count per document
    (A6 — the API's (float[], int) pair, OpenAiService.cs:142), feeding
    downstream token accounting in ONE embedding pass.

    With `only_missing`, rows whose `vector_col` is already populated skip
    the embedder entirely — the idempotent-rerun optimization: embedding is
    the expensive external call, and a resumed/partial ingest should only
    pay for the gap (the reference re-embeds everything,
    MongoDbService.cs:422-430)."""
    embedder = embedder or HashNgramEmbedder()
    if only_missing and vector_col in df.columns:
        missing = df.filter(F.col(vector_col).isNull())
        done = df.filter(F.col(vector_col).isNotNull())
        if usage_col is not None:
            done = done.withColumn(usage_col, F.lit(None).cast("int"))
        embedded = ingest_and_vectorize(
            missing, embedder=embedder, vector_col=vector_col, usage_col=usage_col
        )
        return done.unionByName(embedded)
    doc_text = serialize_document(df, exclude=(vector_col,))
    if usage_col is None:
        return df.withColumn(vector_col, embedder.udf()(doc_text))
    d = df.withColumn("_emb", embedder.usage_udf()(doc_text))
    return (
        d.withColumn(vector_col, F.col("_emb.vector"))
        .withColumn(usage_col, F.col("_emb.token_count"))
        .drop("_emb")
    )


def _default_url_transport(url: str, chunk_size: int = 1 << 20):
    """Stream a URL's body in bounded chunks via the stdlib (urllib) —
    the injectable default for ingest_from_url. http(s) only: a loud
    scheme check beats urllib's file:// pass-through silently widening
    the surface."""
    if not url.lower().startswith(("http://", "https://")):
        raise ValueError(f"{url!r}: ingest_from_url transports http(s) only")
    from urllib.request import urlopen

    with urlopen(url) as resp:  # noqa: S310 — scheme validated above
        while True:
            chunk = resp.read(chunk_size)
            if not chunk:
                return
            yield chunk


def ingest_from_url(
    spark: SparkSession,
    container_url: str,
    blob_ids: "tuple[str, ...]" = ("products.json", "customers.json", "salesOrders.json"),
    dest_dir: "str | None" = None,
    transport=None,
) -> "dict[str, DataFrame]":
    """S1 parity with the reference's HTTPS-container ingest
    (Vectorize/IngestAndVectorize.cs:58-78 streams
    {products,customers,salesOrders}.json from a public blob container):
    stream each blob to `dest_dir` in bounded chunks, then read it with
    the collection's declared schema (read_json_collection). Returns
    {collection: DataFrame}; the collection name is the blob id's stem,
    schema-on-read for stems outside COLLECTION_SCHEMAS.

    `transport(url) -> iterator[bytes]` is injectable for hermetic tests
    (the engine's standard seam — RemoteEmbedder/RemoteCompleter do the
    same); default is a chunked stdlib urllib stream, so driver memory
    stays O(chunk), never O(blob).

    Scale note: this is the DEMO-parity convenience for the reference's
    3-file retail corpus (MBs, driver-streamed). A corpus of real size
    should land in object storage and be read by Spark's Hadoop FS layer
    directly (read_json_collection/read_text_corpus already accept
    s3a/abfss/gs paths) — downloading 100 TB through one driver is the
    anti-pattern this engine exists to avoid."""
    import os
    import tempfile

    transport = transport if transport is not None else _default_url_transport
    dest = dest_dir or tempfile.mkdtemp(prefix="vsai_url_ingest_")
    os.makedirs(dest, exist_ok=True)
    out: "dict[str, DataFrame]" = {}
    base = container_url.rstrip("/")
    for blob_id in blob_ids:
        local = os.path.join(dest, os.path.basename(blob_id))
        with open(local, "wb") as f:
            for chunk in transport(f"{base}/{blob_id}"):
                f.write(chunk)
        collection = os.path.splitext(os.path.basename(blob_id))[0]
        out[collection] = read_json_collection(spark, local, collection)
    return out
