"""Sources & sinks.

ingest.py — JSON/parquet collection loaders (S1/S2) + ingest-and-vectorize
managed_table.py — versioned parquet table with MERGE/DELETE/txn semantics
                   (S3-S7); a minimal Delta-like commit log since delta-spark
                   is not available in this container. On a production
                   cluster this layer is replaced 1:1 by Delta Lake / Iceberg.
warc.py          — ISO-28500 WARC reader/writer (batch + streaming) and the
                   warc_documents corpus shaping: the Common-Crawl-shaped
                   entry point, one task per crawl shard.
"""
