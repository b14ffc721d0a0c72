"""Operator layer: the engine's public query surface (SURVEY.md §2).

vector_search.py — exact top-k cosine search + RAG payload assembly (V1/V2/P1/P2/A1)
ivf.py           — IVF index build (KMeans) + centroid-pruned search (V4)
conversation.py  — running-token-sum history window + chronological re-sort (W1-W3)
prompt_budget.py — token-budgeted proportional prompt trim (F5/F6/A5)
dedup.py         — exact / minhash-LSH / simhash / ngram-jaccard / embedding dedup
similarity.py    — similarity join + brute-force & LSH ANN search
sessions.py      — session/message CRUD over the mutable-table layer (S3-S7)
"""
