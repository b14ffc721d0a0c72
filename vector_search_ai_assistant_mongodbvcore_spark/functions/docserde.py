"""Document-to-text serialization.

The reference embeds and returns *whole documents as JSON strings with the
`vector` field removed* (RemoveVectorAndSerialize,
/root/reference/SharedLib/Services/MongoDbService.cs:397-413; used at
:250-252, :300-303, :352-355, :424-425).  Spark-first equivalent:
`to_json(struct(<all columns except vector>))` — a pure Catalyst expression,
no UDF, prunes the vector column out of downstream scans entirely.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_VECTOR_COLUMNS = ("vector", "embedding")


def serialize_document(
    df: DataFrame,
    exclude: tuple[str, ...] = DEFAULT_VECTOR_COLUMNS,
) -> Column:
    """Column expr: JSON text of every column except the vector column(s).

    Mirrors MongoDbService.RemoveVectorAndSerialize — the payload fed to the
    embedder and to the RAG prompt never contains the raw vector.
    """
    keep = [c for c in df.columns if c not in exclude]
    return F.to_json(F.struct(*[F.col(c) for c in keep]))


def drop_vector_projection(df: DataFrame, exclude: tuple[str, ...] = ("_id",) + DEFAULT_VECTOR_COLUMNS) -> DataFrame:
    """$project {_id: 0, vector: 0} (MongoDbService.cs:213-222) as a column
    pruning — Catalyst pushes the narrowed ReadSchema into the parquet scan."""
    keep = [c for c in df.columns if c not in exclude]
    return df.select(*keep)
