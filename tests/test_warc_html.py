"""WARC source (sources/warc.py) + HTML text extraction
(functions/html.py): byte-exact round trips through write_warc in both
compressions, truncation/malformed tolerance, HTTP payload splitting,
charset handling, boilerplate stripping, and the WARC -> text ->
quality-gate E2E on Spark."""

from __future__ import annotations

import gzip

from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.functions.html import (
    decode_http_text,
    extract_text_udf,
    html_to_text,
)
from vector_search_ai_assistant_mongodbvcore_spark.sources.warc import (
    http_response_parts,
    parse_warc_bytes,
    read_warc,
    write_warc,
)

PAGE = (
    "<html><head><title> Touring  Bikes </title><style>p{color:red}</style>"
    "</head><body><h1>Touring bikes</h1><script>alert('x')</script>"
    "<p>A comfortable touring bike <b>built</b> for long road trips.</p>"
    "<ul><li>drop bars</li><li>rack mounts</li></ul></body></html>"
)


def _records():
    return [
        {"url": "http://a.example/bikes", "body": PAGE.encode()},
        {"url": "http://a.example/plain", "body": b"just plain text",
         "http_content_type": "text/plain; charset=utf-8"},
        {"url": "http://a.example/meta", "body": b'{"seed": 1}',
         "warc_type": "metadata"},
    ]


def test_roundtrip_plain_and_gzip(tmp_path):
    for name in ("crawl.warc", "crawl.warc.gz"):
        p = str(tmp_path / name)
        write_warc(p, _records())
        recs = parse_warc_bytes(open(p, "rb").read())
        assert [r["headers"]["warc-type"] for r in recs] == [
            "response", "response", "metadata"
        ]
        assert [r["headers"]["warc-target-uri"] for r in recs] == [
            "http://a.example/bikes", "http://a.example/plain", "http://a.example/meta"
        ]
        status, ctype, body = http_response_parts(recs[0]["payload"])
        assert status == 200 and ctype.startswith("text/html")
        assert body == PAGE.encode()
        # non-HTTP payload passes through whole
        s2, c2, b2 = http_response_parts(recs[2]["payload"])
        assert (s2, c2, b2) == (None, None, b'{"seed": 1}')


def test_truncated_and_garbage_tolerance(tmp_path):
    p = str(tmp_path / "t.warc")
    write_warc(p, _records(), per_record_gzip=False)
    data = open(p, "rb").read()
    # chop the final record mid-payload: the good prefix still parses
    assert len(parse_warc_bytes(data[:-20])) == 2
    # garbage tail after a valid record ends the scan cleanly
    assert len(parse_warc_bytes(data + b"NOT A RECORD")) == 3
    assert parse_warc_bytes(b"") == []
    assert parse_warc_bytes(b"random bytes") == []


def test_multi_member_gzip_is_per_record(tmp_path):
    """The .gz layout is one gzip member PER RECORD (the CC/spec layout
    that keeps records independently seekable), not one stream."""
    p = str(tmp_path / "c.warc.gz")
    write_warc(p, _records())
    data = open(p, "rb").read()
    # more than one gzip magic: member per record
    assert data.count(b"\x1f\x8b\x08") >= 3
    # and a single-stream gzip of the same content also parses (sniffed)
    plain = str(tmp_path / "c.warc")
    write_warc(plain, _records(), per_record_gzip=False)
    one_stream = gzip.compress(open(plain, "rb").read())
    assert len(parse_warc_bytes(one_stream)) == 3


def test_html_to_text_strips_boilerplate():
    text, title = html_to_text(PAGE)
    assert title == "Touring Bikes"
    assert "alert" not in text and "color:red" not in text
    lines = text.split("\n")
    assert "Touring bikes" in lines
    assert "A comfortable touring bike built for long road trips." in lines
    assert "drop bars" in lines and "rack mounts" in lines
    # malformed markup never raises
    assert html_to_text("<p>ok<unclosed<</b>")[0].startswith("ok")
    assert html_to_text("")[0] == ""


def test_decode_http_text_charsets():
    assert decode_http_text("naïve".encode("latin-1"), "text/html; charset=ISO-8859-1") == "naïve"
    assert decode_http_text("naïve".encode(), "text/html; charset=utf-8") == "naïve"
    # unknown charset falls back to utf-8; undecodable bytes become U+FFFD
    assert "�" in decode_http_text(b"\xff\xfe", "text/html; charset=not-a-charset")
    assert decode_http_text(None, None) == ""


def test_read_warc_to_corpus_e2e(spark, tmp_path):
    """The 100 TB entry point on Spark: two WARC shards -> read_warc ->
    response filter -> HTML text extraction -> corpus-shaped documents
    feeding the streaming-tier quality gate."""
    from vector_search_ai_assistant_mongodbvcore_spark.streaming.quality import (
        gate_stream,
    )

    d = tmp_path / "crawl"
    d.mkdir()
    write_warc(str(d / "shard-00000.warc.gz"), _records())
    write_warc(
        str(d / "shard-00001.warc.gz"),
        [{"url": "http://b.example/junk", "body": b"<html><body>spam spam spam spam spam spam spam spam spam spam</body></html>"}],
    )
    recs = read_warc(spark, str(d))
    assert recs.count() == 4
    pages = recs.filter(
        (F.col("warc_type") == "response")
        & F.col("http_content_type").startswith("text/html")
    )
    docs = pages.select(
        "url", extract_text_udf()(F.col("body"), F.col("http_content_type")).alias("x")
    ).select("url", F.col("x.text").alias("text"), F.col("x.title").alias("title"))
    rows = {r["url"]: r for r in docs.collect()}
    assert rows["http://a.example/bikes"]["title"] == "Touring Bikes"
    assert "long road trips" in rows["http://a.example/bikes"]["text"]
    # the repetitive junk page exists pre-gate and dies at the gate
    gated = gate_stream(
        docs.withColumnRenamed("url", "doc_id"), text_col="text", id_col="doc_id"
    )
    kept = [r["doc_id"] for r in gated.collect()]
    assert "http://b.example/junk" not in kept


def test_warc_documents_shapes_the_corpus_table(spark, tmp_path):
    """warc_documents: 2xx HTML responses only, documents-table schema,
    markup-only pages dropped by min_text_chars."""
    from vector_search_ai_assistant_mongodbvcore_spark.sources.warc import (
        warc_documents,
    )

    d = tmp_path / "c2"
    d.mkdir()
    write_warc(
        str(d / "s.warc.gz"),
        _records()
        + [{"url": "http://a.example/empty", "body": b"<html><body></body></html>"}],
    )
    docs = warc_documents(read_warc(spark, str(d)), min_text_chars=1)
    rows = {r["doc_id"]: r for r in docs.collect()}
    # plain-text + metadata records and the markup-only page are gone
    assert set(rows) == {"http://a.example/bikes"}
    r = rows["http://a.example/bikes"]
    assert r["title"] == "Touring Bikes" and r["n_chars"] == len(r["text"])
    assert set(docs.columns) == {
        "doc_id", "title", "text", "warc_file", "warc_date", "n_chars"
    }


def test_warc_stream_equals_batch(spark, tmp_path):
    """read_warc_stream + warc_documents over landing shard files ==
    the batch reader on the same dir, row for row — the continuous
    crawl-ingest twin."""
    from vector_search_ai_assistant_mongodbvcore_spark.sources.warc import (
        read_warc_stream,
        warc_documents,
    )

    d = tmp_path / "landing"
    d.mkdir()
    write_warc(str(d / "s0.warc.gz"), _records())
    write_warc(
        str(d / "s1.warc.gz"),
        [{"url": "http://b.example/more", "body": b"<html><title>t</title><body><p>more crawl text here</p></body></html>"}],
    )
    q = (
        warc_documents(read_warc_stream(spark, str(d)))
        .writeStream.format("memory")
        .queryName("warc_docs")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: (r["title"], r["text"])
        for r in spark.sql("SELECT * FROM warc_docs").collect()
    }
    want = {
        r["doc_id"]: (r["title"], r["text"])
        for r in warc_documents(read_warc(spark, str(d))).collect()
    }
    assert got == want and len(got) == 2


def test_truncated_gzip_member_keeps_good_prefix(tmp_path):
    """A corrupt/truncated gzip member (killed shard download) must cost
    only the tail — the earlier members' records still parse."""
    p = str(tmp_path / "g.warc.gz")
    write_warc(p, _records())
    data = open(p, "rb").read()
    assert len(parse_warc_bytes(data[:-15])) >= 2  # last member truncated
    assert len(parse_warc_bytes(data + b"\x1f\x8b\x08garbage")) == 3


def test_crawl_to_training_shards_one_streaming_pipeline(spark, tmp_path):
    """The whole 100 TB shape as ONE continuously-running query: landing
    WARC shards -> read_warc_stream -> warc_documents -> the full
    streaming corpus chain -> packed training shards."""
    from vector_search_ai_assistant_mongodbvcore_spark.sources.warc import (
        read_warc_stream,
        warc_documents,
    )
    from vector_search_ai_assistant_mongodbvcore_spark.streaming.corpus import (
        start_corpus_stream,
    )

    d = tmp_path / "landing"
    d.mkdir()
    body = "<html><title>p{i}</title><body><p>" + " ".join(
        f"steady ordinary word{j} flows along nicely" for j in range(12)
    ) + " page {i}</p></body></html>"
    for shard in (0, 1):
        write_warc(
            str(d / f"s{shard}.warc.gz"),
            [
                {"url": f"https://ex.com/{shard}/{i}",
                 "body": body.replace("{i}", f"{shard}-{i}").encode()}
                for i in range(3)
            ],
        )
    # the chain keys docs by a LONG id — derive it from the URL the way a
    # crawl pipeline does (hash of the canonical URL), bounded to a
    # 40-bit keyspace so downstream seq-id arithmetic has headroom
    docs = warc_documents(read_warc_stream(spark, str(d))).select(
        F.pmod(F.xxhash64("doc_id"), F.lit(1 << 40)).alias("doc_id"), "text"
    )
    q = start_corpus_stream(
        docs,
        out_dir=str(tmp_path / "shards"),
        seq_len=32,
        checkpoint_dir=str(tmp_path / "ckpt"),
        chunk_size=16,
        chunk_overlap=0,
    )
    q.awaitTermination(180)
    seqs = spark.read.parquet(str(tmp_path / "shards"))
    assert seqs.count() > 0
    assert {"seq_id", "input_ids", "doc_ids", "n_toks", "split", "batch"} <= set(
        seqs.columns
    )
    # packed layout: no sequence exceeds seq_len; every token of every
    # surviving page is accounted for across the shards
    assert seqs.filter(F.size("input_ids") > 32).count() == 0
    total = seqs.agg(F.sum(F.size("input_ids"))).collect()[0][0]
    assert total == seqs.agg(F.sum("n_toks")).collect()[0][0] > 0
    # provenance: the crawl's doc keys flow through to the sequences
    assert seqs.select(F.explode("doc_ids")).distinct().count() == 6
