"""WARC (Web ARChive, ISO 28500) source — the Common-Crawl-shaped entry
point of a web-scale training-data pipeline.

A WARC file is a sequence of records, each:

    WARC/1.0\\r\\n
    <header-name>: <value>\\r\\n ...          (WARC-Type, WARC-Target-URI,
    \\r\\n                                     WARC-Date, Content-Length, ...)
    <Content-Length bytes of payload>
    \\r\\n\\r\\n

Common Crawl ships each record as its OWN gzip member, concatenated
into one .warc.gz (the spec's recommended per-record compression, so a
reader can seek to a record without decompressing the file prefix);
plain uncompressed .warc files are the other common form. Both parse
here: gzip input is inflated member-by-member with zlib so record
boundaries are preserved, plain input is split on the record grammar.

Spark shape: `read_warc` scans the files with the binaryFile source
(one task per file — Common Crawl sizes shards at ~1 GB precisely so a
whole shard is one worker unit) and parses records inside mapInPandas.
For `response` records the HTTP payload is split into status/headers/
body so downstream text extraction (functions/html.html_to_text)
starts from the body bytes. This is a SOURCE — like sources/ingest, it
has no ANSI-SQL twin; correctness is pinned by byte-exact round-trip
tests against WARCs written by `write_warc` (same grammar, both
compressions).

The reference ingests one JSON container over HTTPS
(Vectorize/IngestAndVectorize.cs:58-78); WARC is part of the added
training-data tier — what "ingest" means at 100 TB.
"""

from __future__ import annotations

import gzip
import io
import uuid
import zlib

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "parse_warc_bytes",
    "write_warc",
    "read_warc",
    "read_warc_stream",
    "warc_documents",
    "http_response_parts",
]

_BINARYFILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)

_SCHEMA = (
    "warc_file string, record_id string, warc_type string, url string, "
    "warc_date string, content_type string, http_status int, "
    "http_content_type string, body binary"
)


def _inflate_members(data: bytes) -> bytes:
    """Concatenated gzip members -> the concatenated inflated stream.
    zlib.decompressobj(wbits=47) stops at each member boundary; looping
    over unused_data walks every member (the per-record-gzip layout).
    A corrupt/truncated member (a killed shard download) ends the walk
    with the good prefix — the same tolerance the record grammar has:
    bad tail bytes cost that tail, never the shard's good records."""
    out = io.BytesIO()
    rest = data
    while rest:
        d = zlib.decompressobj(47)
        try:
            out.write(d.decompress(rest))
            out.write(d.flush())
        except zlib.error:
            break
        rest = d.unused_data
    return out.getvalue()


def parse_warc_bytes(data: bytes) -> "list[dict]":
    """Every WARC record in `data` (plain or gzip — sniffed by magic) as
    dicts: {headers: {lowercased name: value}, payload: bytes}. Malformed
    trailing bytes end the scan rather than raise: a truncated final
    record (a killed crawler) must not poison the shard's good records."""
    if data[:2] == b"\x1f\x8b":
        data = _inflate_members(data)
    records: "list[dict]" = []
    i = 0
    n = len(data)
    while i < n:
        # tolerate inter-record padding
        while i < n and data[i : i + 1] in (b"\r", b"\n"):
            i += 1
        if not data[i : i + 5] == b"WARC/":
            break
        head_end = data.find(b"\r\n\r\n", i)
        if head_end < 0:
            break
        headers: "dict[str, str]" = {}
        for line in data[i:head_end].split(b"\r\n")[1:]:
            name, sep, value = line.partition(b":")
            if sep:
                headers[name.strip().decode("latin-1").lower()] = (
                    value.strip().decode("latin-1")
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        payload_start = head_end + 4
        if payload_start + length > n:
            break  # truncated final record
        records.append(
            {"headers": headers, "payload": data[payload_start : payload_start + length]}
        )
        i = payload_start + length
    return records


def http_response_parts(payload: bytes) -> "tuple[int | None, str | None, bytes]":
    """(status, content-type, body) of an HTTP response payload; a
    payload that does not parse as HTTP comes back whole as the body
    with (None, None) — resource/conversion records carry raw bytes."""
    if not payload.startswith(b"HTTP/"):
        return None, None, payload
    head_end = payload.find(b"\r\n\r\n")
    if head_end < 0:
        return None, None, payload
    lines = payload[:head_end].split(b"\r\n")
    try:
        status = int(lines[0].split()[1])
    except (IndexError, ValueError):
        return None, None, payload
    ctype = None
    for line in lines[1:]:
        name, sep, value = line.partition(b":")
        if sep and name.strip().lower() == b"content-type":
            ctype = value.strip().decode("latin-1")
    return status, ctype, payload[head_end + 4 :]


def write_warc(
    path: str,
    records: "list[dict]",
    per_record_gzip: "bool | None" = None,
) -> None:
    """Write `records` ({url, body bytes, warc_type?, date?,
    http_content_type?}) as a spec-shaped WARC file — response records
    wrap the body in an HTTP/1.1 200 payload. Used by the tests (round
    trips pin the parser) and by export tooling that re-shards crawls;
    per_record_gzip defaults on iff `path` ends with .gz."""
    if per_record_gzip is None:
        per_record_gzip = path.endswith(".gz")
    out = io.BytesIO()
    for r in records:
        wtype = r.get("warc_type", "response")
        if wtype == "response":
            ctype = r.get("http_content_type", "text/html")
            payload = (
                b"HTTP/1.1 200 OK\r\nContent-Type: "
                + ctype.encode("latin-1")
                + b"\r\n\r\n"
                + r["body"]
            )
        else:
            payload = r["body"]
        head = (
            b"WARC/1.0\r\n"
            b"WARC-Type: " + wtype.encode("latin-1") + b"\r\n"
            b"WARC-Record-ID: <urn:uuid:" + uuid.uuid4().hex.encode() + b">\r\n"
            b"WARC-Target-URI: " + r.get("url", "").encode("latin-1") + b"\r\n"
            b"WARC-Date: " + r.get("date", "2026-01-01T00:00:00Z").encode() + b"\r\n"
            b"Content-Length: " + str(len(payload)).encode() + b"\r\n"
            b"\r\n"
        )
        record = head + payload + b"\r\n\r\n"
        out.write(gzip.compress(record) if per_record_gzip else record)
    with open(path, "wb") as f:
        f.write(out.getvalue())


def _parse_files(files: DataFrame) -> DataFrame:
    """(path, content) frame -> parsed record rows; shared verbatim by
    the batch and streaming readers so stream==batch parsing holds by
    construction."""
    import pandas as pd

    def parse(batches):
        for pdf in batches:
            rows = []
            for fp, blob in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc_bytes(bytes(blob)):
                    h = rec["headers"]
                    status, ctype, body = http_response_parts(rec["payload"])
                    rows.append(
                        {
                            "warc_file": fp,
                            "record_id": h.get("warc-record-id", ""),
                            "warc_type": h.get("warc-type", ""),
                            "url": h.get("warc-target-uri", ""),
                            "warc_date": h.get("warc-date", ""),
                            "content_type": h.get("content-type", ""),
                            "http_status": status,
                            "http_content_type": ctype,
                            "body": body,
                        }
                    )
            if rows:
                yield pd.DataFrame(rows)

    return files.mapInPandas(parse, _SCHEMA)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC scan: one row per record with the response
    payload split into (http_status, http_content_type, body). One task
    per file (the binaryFile source) — Common Crawl sizes shards so a
    file is a worker-memory-bounded unit; at 100 TB the parallelism is
    the file count, which is exactly how CC publishes (per-segment
    shard lists). Filter warc_type == 'response' for page bodies."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return _parse_files(files)


def read_warc_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming twin of read_warc: new shard files landing under `path`
    become record micro-batches (the binaryFile source streams whole
    files, so a shard is parsed exactly once, by one task, when it
    arrives — the continuous-crawl ingest shape). Identical parse, by
    construction (shared _parse_files); compose with warc_documents and
    the streaming corpus chain (streaming/corpus.start_corpus_stream)
    for crawl-to-training-shards as ONE continuously-running pipeline."""
    files = (
        spark.readStream.format("binaryFile")
        .schema(_BINARYFILE_SCHEMA)
        .load(path)
        .select("path", "content")
    )
    return _parse_files(files)


def warc_documents(records: DataFrame, min_text_chars: int = 1) -> DataFrame:
    """Parsed WARC records -> corpus-shaped documents: keep 2xx HTML
    responses, extract text/title (functions/html.py), emit
    (doc_id = target URI, title, text, warc_file, warc_date, n_chars) —
    the documents-table shape the whole pipeline tier consumes. Works on
    batch and streaming frames alike (pure projections + one Arrow UDF);
    `min_text_chars` drops markup-only pages before they cost the
    downstream gates anything."""
    from pyspark.sql import functions as F

    from vector_search_ai_assistant_mongodbvcore_spark.functions.html import (
        extract_text_udf,
    )

    pages = records.filter(
        (F.col("warc_type") == "response")
        & (F.col("http_status") >= 200)
        & (F.col("http_status") < 300)
        & F.col("http_content_type").startswith("text/html")
    )
    docs = pages.select(
        F.col("url").alias("doc_id"),
        "warc_file",
        "warc_date",
        extract_text_udf()(F.col("body"), F.col("http_content_type")).alias("_x"),
    ).select(
        "doc_id",
        F.col("_x.title").alias("title"),
        F.col("_x.text").alias("text"),
        "warc_file",
        "warc_date",
        F.length("_x.text").alias("n_chars"),
    )
    return docs.filter(F.col("n_chars") >= min_text_chars)
