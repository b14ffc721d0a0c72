"""Diagnose queries with no CORRECTNESS rows: run each under a driver-like
harness (collect + pandas canonicalize) and time it. Default list = the 4
unrecorded names from rounds 2-3 plus summarize_labels (the LAST query the
driver DID record — its timing anchors where the gate's budget ran out)."""
import sys
import time
import traceback

from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
import __spark_entry__ as E

NAMES = sys.argv[1:] or [
    "summarize_labels",
    "chat_turn",
    "compression_ratios",
    "topic_clusters",
    "multimodal_features",
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
