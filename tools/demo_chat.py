"""One-command replay of the reference's demo lifecycle, Spark-first:

  1. serve the retail JSON over localhost HTTP (standing in for the
     public blob container the reference downloads from,
     Vectorize/IngestAndVectorize.cs:58-78)
  2. ingest_from_url -> declared schemas (S1/S2)
  3. ingest_and_vectorize: ONE Arrow-batched embedding pass (replaces
     the reference's per-document HTTPS loop)
  4. build the IVF vector index (the reference's default index kind,
     Search/appsettings.json:24) and serve one partition-pruned top-k
     from it
  5. a SessionStore chat: two turns + first-exchange summarize-rename
     (ChatService.cs:119-165, :273-282); chat retrieval runs the
     engine's exact top-k serving path (the registered chat_turn
     configuration)
  6. the README.md:184-194 add/remove walkthrough: upsert 'Cosmic
     Socks, M' (AddRemoveData.cs action=add) -> searchable, top-ranked;
     delete it (action=remove) -> gone, original results restored

Transports are the deterministic fakes so the demo is hermetic; the
production swap-in is functions/openai_transport.AzureOpenAITransport
(embedding_transport / completion_transport) — same call sites, no other
change. Storage defaults to POSIX; pass --object-store to run the whole
demo on the conditional-put + object-data-plane universe instead.

Usage: python tools/demo_chat.py [--object-store]
"""

from __future__ import annotations

import http.server
import json
import os
import sys
import tempfile
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PRODUCTS = [
    {"id": "p1", "categoryId": "c1", "categoryName": "Bikes", "sku": "BK-T79",
     "name": "Touring-1000 Blue", "description": "A comfortable touring bike built for long road trips", "price": 2384.07, "tags": []},
    {"id": "p2", "categoryId": "c1", "categoryName": "Bikes", "sku": "BK-M68",
     "name": "Mountain-200 Silver", "description": "A rugged mountain bike with front suspension", "price": 2319.99, "tags": []},
    {"id": "p3", "categoryId": "c2", "categoryName": "Socks", "sku": "SO-R809",
     "name": "Racing Socks, L", "description": "Lightweight racing socks that wick away moisture", "price": 8.99, "tags": []},
    {"id": "p4", "categoryId": "c3", "categoryName": "Helmets", "sku": "HL-U509",
     "name": "Sport-100 Helmet", "description": "A sturdy universal fit helmet for safety", "price": 34.99, "tags": []},
]


def main(argv=None, spark=None) -> dict:
    """Run the lifecycle; returns the key outcomes so the pytest smoke
    (tests/test_demo_chat.py) can assert them. `argv` defaults to
    sys.argv; pass an injected `spark` to reuse a live session (it is
    then NOT stopped here). Patched storage globals are restored on
    exit, so back-to-back runs in one process are independent."""
    argv = sys.argv if argv is None else argv
    from pyspark.sql import functions as F

    from vector_search_ai_assistant_mongodbvcore_spark import get_spark
    from vector_search_ai_assistant_mongodbvcore_spark.functions.completion import (
        RemoteCompleter, RemoteSummarizer,
        fake_completion_transport, fake_summarize_transport,
    )
    from vector_search_ai_assistant_mongodbvcore_spark.functions.embedder import HashNgramEmbedder
    from vector_search_ai_assistant_mongodbvcore_spark.operators.chat import (
        chat_turn, summarize_session_name,
    )
    from vector_search_ai_assistant_mongodbvcore_spark.operators.ivf import IvfIndex
    from vector_search_ai_assistant_mongodbvcore_spark.operators.sessions import SessionStore
    from vector_search_ai_assistant_mongodbvcore_spark.operators.vector_search import (
        vector_search,
    )
    from vector_search_ai_assistant_mongodbvcore_spark.sources import managed_table as mt
    from vector_search_ai_assistant_mongodbvcore_spark.sources.ingest import (
        ingest_and_vectorize, ingest_from_url,
    )
    from vector_search_ai_assistant_mongodbvcore_spark.sources.managed_table import (
        ManagedTable,
    )
    from vector_search_ai_assistant_mongodbvcore_spark.streaming.incremental import (
        apply_changes,
    )

    # globals saved BEFORE the try so the finally restores them even if
    # setup (Spark startup, port bind) dies between patch and work
    saved_committer, saved_plane = mt._DEFAULT_COMMITTER, mt._DEFAULT_DATAPLANE
    owns_spark = spark is None
    httpd = None
    result: dict = {}
    try:
        if "--object-store" in argv:
            from vector_search_ai_assistant_mongodbvcore_spark.sources.dataplane import (
                EmulatedObjectDataPlane,
            )

            plane = EmulatedObjectDataPlane()
            mt._DEFAULT_COMMITTER = mt.ConditionalPutCommitter(
                mt.MemoryConditionalStore(), plane
            )
            # the INDEX classes resolve the module default directly, so patch
            # it too — otherwise the index tablespace silently stays POSIX
            mt._DEFAULT_DATAPLANE = plane
            print("[storage] conditional-put pointer + object data plane")

        if owns_spark:
            spark = get_spark(app_name="vsai-demo", cpus=8)
            spark.sparkContext.setLogLevel("ERROR")
        work = tempfile.mkdtemp(prefix="vsai_demo_")

        # 1. the "blob container": localhost HTTP serving the retail JSON
        serve = os.path.join(work, "container")
        os.makedirs(serve)
        with open(os.path.join(serve, "products.json"), "w") as f:
            json.dump(PRODUCTS, f)
        handler = lambda *a, **k: http.server.SimpleHTTPRequestHandler(*a, directory=serve, **k)  # noqa: E731
        httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        url = f"http://127.0.0.1:{httpd.server_address[1]}"
        # 2. ingest with declared schemas
        got = ingest_from_url(spark, url, blob_ids=("products.json",),
                              dest_dir=os.path.join(work, "dl"))
        products = got["products"]
        result["ingested"] = products.count()
        print(f"[ingest] {result['ingested']} products from {url} (declared schema)")

        # 3. one Arrow-batched embedding pass
        emb = HashNgramEmbedder(dims=256)
        corpus = ingest_and_vectorize(products, embedder=emb, usage_col="embed_tokens")
        tok = corpus.agg(F.sum("embed_tokens")).first()[0]
        corpus = corpus.cache()
        print(f"[vectorize] {corpus.count()} vectors, {tok} embedding tokens, one batch pass")

        # 4. the reference's default index kind
        emb_tbl = corpus.select(F.col("id").alias("vec_id"), F.col("vector").alias("embedding"))
        ivf = IvfIndex(spark, os.path.join(work, "ivf")).build(
            emb_tbl, vector_col="embedding", num_lists=2, seed=42, id_col="vec_id"
        )
        probe = [float(x) for x in emb.embed_numpy(["lightweight socks"])[0]]
        hit = ivf.search(probe, k=1, n_probe=1).first()
        result["ivf_top1"] = hit.vec_id
        print(f"[index] IVF built (numLists=2); pruned top-1 for "
              f"'lightweight socks' -> {hit.vec_id} (score {hit.score:.3f})")
        # 4b. the reference's OTHER index kind (`vector-hnsw`,
        # MongoDbService.cs:119-143 — the kind its config names first),
        # served through auto_search's meta-sniffed access-path choice:
        # the same call a config flip would route to either index
        from vector_search_ai_assistant_mongodbvcore_spark.operators.hnsw import (
            PartitionedHnswIndex,
        )
        from vector_search_ai_assistant_mongodbvcore_spark.operators.vector_search import (
            auto_search,
        )

        PartitionedHnswIndex(spark, os.path.join(work, "hnsw")).build(
            emb_tbl, vector_col="embedding", id_col="vec_id", shards=2
        )
        hhit = auto_search(
            spark, emb_tbl, probe, k=1, index_path=os.path.join(work, "hnsw"),
            vector_col="embedding", id_col="vec_id",
        ).first()
        result["hnsw_top1"] = hhit.vec_id
        print(f"[index] HNSW built (m=16/efC=64, 2 segments); graph top-1 "
              f"-> {hhit.vec_id} (score {hhit.score:.3f})")

        # 5. the chat lifecycle
        store = SessionStore(spark, os.path.join(work, "sessions"))
        completer = RemoteCompleter(transport=fake_completion_transport)
        summarizer = RemoteSummarizer(transport=fake_summarize_transport)
        sid = store.create_session()
        for question in ("What kind of socks do you have?",
                         "And do you sell bikes for long trips?"):
            chat_turn(spark, store, corpus, sid, question, emb, completer,
                      k=2, vector_col="vector", id_cols=("id", "name"))
            if store.first_exchange_sessions().count() == 1:
                texts = [r["text"] for r in store.get_messages(sid).select("text").collect()]
                summarize_session_name(store, summarizer, sid, "\n".join(texts))
        sess = store.list_sessions().first()
        result["session_name"] = sess.name
        result["tokens_used"] = sess.tokens_used
        result["n_messages"] = store.get_messages(sid).count()
        print(f"[chat] session {sid[:8]}… renamed to {sess.name!r}, "
              f"tokens_used={sess.tokens_used}")
        for m in store.get_messages(sid).orderBy("ts").collect():
            head = " ".join((m["text"] or "").split())[:88]
            print(f"  {m['sender']:>9}: {head}")

        # 6. README.md:184-194 — real-time add/remove (AddRemoveData.cs):
        # upsert Cosmic Socks -> searchable + top-ranked; delete -> gone
        catalog = ManagedTable(spark, os.path.join(work, "catalog"))
        catalog.overwrite(
            corpus.select("id", "categoryName", "name", "description", "vector")
        )
        cosmic_q = [float(x) for x in emb.embed_numpy(
            ["limited edition cosmic print socks"])[0]]

        def cosmic_names(k):
            top = vector_search(catalog.read(), cosmic_q, k=k,
                                vector_col="vector", id_col="id")
            return [r.name for r in top.collect()]

        change_schema = ("id string, categoryName string, name string, "
                         "description string, _op string")
        cosmic = ("p9", "Socks", "Cosmic Socks, M",
                  "Limited edition cosmic print socks in medium", "upsert")
        apply_changes(catalog, spark.createDataFrame([cosmic], change_schema),
                      keys=["id"], embedder=emb, vector_col="vector")
        result["cosmic_after_add"] = cosmic_names(k=2)[0]
        print(f"[add]    upsert 'Cosmic Socks, M' -> top-1 for its query: "
              f"{result['cosmic_after_add']!r}")
        apply_changes(
            catalog,
            spark.createDataFrame([cosmic[:-1] + ("delete",)], change_schema),
            keys=["id"], embedder=emb, vector_col="vector",
        )
        after_remove = cosmic_names(k=4)
        result["cosmic_gone_after_remove"] = "Cosmic Socks, M" not in after_remove
        print(f"[remove] delete it -> gone from top-{len(after_remove)}: "
              f"{result['cosmic_gone_after_remove']}")
        print("[demo] OK — swap fake transports for "
              "AzureOpenAITransport.from_env() to go live")
        return result
    finally:
        if httpd is not None:
            httpd.shutdown()
        mt._DEFAULT_COMMITTER, mt._DEFAULT_DATAPLANE = saved_committer, saved_plane
        if owns_spark and spark is not None:
            spark.stop()


if __name__ == "__main__":
    main()
