"""Diagnose queries with no CORRECTNESS rows: run each under a driver-like
harness (collect + pandas canonicalize) and time it. Root cause found in
round 4: the gate records the first ~50 registered queries and stops — the
registry is now capped at exactly 50 (queries._ORDER). Default list = the
current rows-only entries (the tail of the order) plus summarize_labels,
the last query the round-3 gate recorded."""
import sys
import time
import traceback

from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
import __spark_entry__ as E

NAMES = sys.argv[1:] or [
    "summarize_labels",
    "corpus_binary_enrichment",
    "chat_turn",
]

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

qs = E.queries()
for name in NAMES:
    t0 = time.time()
    try:
        df = qs[name](spark, "/root/testdata/sf0.01")
        pdf = df.toPandas()
        # mimic driver canonicalization: sort columns by name, sort rows
        pdf = pdf[sorted(pdf.columns)]
        pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
        h = hash(tuple(map(tuple, pdf.itertuples(index=False))))
        print(f"{name}: OK rows={len(pdf)} wall={time.time()-t0:.1f}s hashable=yes")
    except Exception as e:
        print(f"{name}: FAIL after {time.time()-t0:.1f}s: {type(e).__name__}: {e}")
        traceback.print_exc(limit=3)
