"""Pure column-function kit.

vector.py  — cosine/dot/norm as native Catalyst expressions + numpy fast path
text.py    — text-analysis columns (length/punct/stopword/lang-id/fingerprint)
tokenizer.py — deterministic tokenizer (encode/count/decode) pandas UDFs
html.py    — stdlib HTML->text extraction (crawl bodies -> training text)
url.py     — codegen-pure URL canonicalization + registrable domains
embedder.py  — pluggable embedders; deterministic hash-ngram local embedder
docserde.py  — whole-document JSON serialization minus the vector column
"""

from vector_search_ai_assistant_mongodbvcore_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    l2_norm,
    normalize,
)
from vector_search_ai_assistant_mongodbvcore_spark.functions.docserde import (
    serialize_document,
)

__all__ = [
    "cosine_similarity",
    "dot_product",
    "l2_norm",
    "normalize",
    "serialize_document",
]
