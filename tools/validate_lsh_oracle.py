"""Pre-flight: can DuckDB reproduce lsh_bucket_ids' sign-pattern bucket
codes bit-for-bit from inlined seed-42 hyperplane literals?"""
import sys

import duckdb
import numpy as np

sys.path.insert(0, "/root/repo")
from vector_search_ai_assistant_mongodbvcore_spark.operators.similarity import (
    _hyperplanes,
    _query_codes,
)

SF = "/root/testdata/sf0.01"
DIMS, BITS, TABLES = 64, 6, 6

con = duckdb.connect()
con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")

rows = con.execute("SELECT vec_id, embedding FROM embeddings ORDER BY vec_id").fetchall()
ids = [r[0] for r in rows]
# diagnose nulls BEFORE building the matrix (np.array on a ragged/None
# column would raise and hide the very signal this tool exists to print);
# None -> zero vector, matching stack_vectors' null hygiene
n_null = sum(1 for r in rows if r[1] is None)
dims_found = next((len(r[1]) for r in rows if r[1] is not None), DIMS)
m = np.array(
    [r[1] if r[1] is not None else [0.0] * dims_found for r in rows], dtype=np.float64
)
print(f"{len(ids)} embeddings, dims={m.shape[1]}, nulls={n_null}")

H = _hyperplanes(DIMS, BITS, TABLES, 42)
weights = (1 << np.arange(BITS)).astype(np.int64)
signs = np.einsum("nd,tbd->ntb", m, H) > 0
np_codes = signs @ weights  # (n, t)

# margin: smallest |projection| — sign-flip risk indicator
proj = np.einsum("nd,tbd->ntb", m, H)
print(f"min |projection| = {np.abs(proj).min():.3e}")


def code_sql(emb, t):
    terms = []
    for b in range(BITS):
        plane = "[" + ",".join(repr(float(x)) for x in H[t, b]) + "]::DOUBLE[]"
        terms.append(
            f"(CASE WHEN list_dot_product({emb}::DOUBLE[], {plane}) > 0 THEN {1 << b} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


cols = ", ".join(code_sql("embedding", t) + f" AS c{t}" for t in range(TABLES))
sql_codes = con.execute(
    f"SELECT vec_id, {cols} FROM embeddings ORDER BY vec_id"
).fetchall()
duck = np.array([r[1:] for r in sql_codes], dtype=np.int64)

match = (duck == np_codes).all()
print(f"bucket codes match: {match} ({(duck == np_codes).sum()}/{duck.size})")
if not match:
    bad = np.argwhere(duck != np_codes)[:5]
    for i, t in bad:
        print(f"  row {ids[i]} table {t}: duck={duck[i, t]} np={np_codes[i, t]}")

q = np.random.RandomState(7).randn(64)
qv = [round(float(x), 6) for x in q]
print("query codes:", _query_codes(qv, BITS, TABLES, 42))
