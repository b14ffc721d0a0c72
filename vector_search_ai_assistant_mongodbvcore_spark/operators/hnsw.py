"""Pure-numpy HNSW graph kernel (Malkov & Yashunin 2016, arXiv:1603.09320).

Reference parity: the reference's first-named index kind is `vector-hnsw`
with m=16 / efConstruction=64 (/root/reference/SharedLib/Services/
MongoDbService.cs:119-143).  `operators/partitioned_ann.py` already wires an
hnswlib-backed factory at those parameters, but hnswlib is an optional
native extra — this module is the always-runnable twin: the same algorithm
(level sampling, greedy upper-layer descent, ef-bounded beam search on the
base layer, the select-neighbors HEURISTIC from the paper's Algorithm 4)
implemented on numpy, so the graph kernel executes and records recall
evidence in every environment.

Space: cosine, like the reference.  Vectors are L2-normalized once at
build; distance = 1 - dot.  Searches return cosine SIMILARITY, matching
`_ExactSearcher` / the hnswlib wrapper in partitioned_ann.py.

Scale note: this is a LOCAL kernel by design — the distributed form is
`partitioned_ann_topk`, which builds one index per partition (bounded by
spark.sql.files.maxPartitionBytes) and merges the P×k candidates with a
TakeOrderedAndProject.  Build is O(n · ef_construction · log n) sequential
per partition; neighbor-distance evaluation inside the beam search is the
hot loop and is batched through one numpy matvec per expansion.

Determinism: level sampling draws from a seeded Generator in insertion
order, so identical (vectors, seed) produce an identical graph — the
property the engine's fingerprint-based index rebuild checks rely on.
"""

from __future__ import annotations

import heapq

import numpy as np

__all__ = ["NumpyHNSW", "numpy_hnsw_index_factory"]


def _normalize(vectors: np.ndarray) -> np.ndarray:
    m = np.ascontiguousarray(vectors, dtype=np.float64)
    if m.ndim != 2:
        raise ValueError(f"expected (n, dim) vectors, got shape {m.shape}")
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return m / norms


class NumpyHNSW:
    """Hierarchical Navigable Small World graph over cosine space.

    Parameters follow hnswlib naming: `m` is the max out-degree per node
    on layers >= 1 (the base layer allows 2m, the paper's Mmax0);
    `ef_construction` bounds the candidate beam during insert;
    `ef_search` bounds it during queries (raised to k when k is larger).
    """

    def __init__(
        self,
        vectors: np.ndarray,
        m: int = 16,
        ef_construction: int = 64,
        ef_search: int = 64,
        seed: int = 42,
    ):
        if m < 2:
            raise ValueError("m must be >= 2")
        self._v = _normalize(vectors)
        self._n = self._v.shape[0]
        self._m = int(m)
        self._m0 = 2 * int(m)
        self._efc = max(int(ef_construction), self._m)
        self.ef_search = int(ef_search)
        self._mult = 1.0 / np.log(self._m)
        # _links[node] is a list of int lists, one per layer 0..level(node)
        self._links: list[list[list[int]]] = []
        self._entry = -1
        self._top = -1
        rng = np.random.default_rng(seed)
        # draw all levels up front: one uniform per element, in insertion
        # order — the graph is then a pure function of (vectors, seed)
        levels = np.floor(-np.log(rng.uniform(1e-12, 1.0, size=self._n)) * self._mult)
        self._levels = levels.astype(np.int64)
        for i in range(self._n):
            self._insert(i, int(self._levels[i]))

    # -- distance helpers (cosine distance = 1 - dot on normalized rows) --

    def _dist_one(self, q: np.ndarray, node: int) -> float:
        return 1.0 - float(self._v[node] @ q)

    def _dist_many(self, q: np.ndarray, nodes: list[int]) -> np.ndarray:
        return 1.0 - self._v[nodes] @ q

    # -- core graph routines --

    def _greedy_descend(self, q: np.ndarray, ep: int, from_layer: int, to_layer: int) -> int:
        """ef=1 walk: on each layer above `to_layer`, hop to the closest
        neighbor until no neighbor improves."""
        cur, cur_d = ep, self._dist_one(q, ep)
        for layer in range(from_layer, to_layer, -1):
            improved = True
            while improved:
                improved = False
                neigh = self._links[cur][layer]
                if not neigh:
                    continue
                d = self._dist_many(q, neigh)
                j = int(np.argmin(d))
                if d[j] < cur_d:
                    cur, cur_d = neigh[j], float(d[j])
                    improved = True
        return cur

    def _search_layer(self, q: np.ndarray, ep: int, ef: int, layer: int) -> list[tuple[float, int]]:
        """Beam search (paper Algorithm 2): returns <= ef (dist, node)
        pairs, unsorted.  This is the build/search hot loop — visited is
        a flat byte table, neighbor distances are one batched matvec per
        expansion, comparisons run on unboxed floats."""
        v = self._v
        links = self._links
        visited = bytearray(self._n)
        visited[ep] = 1
        d0 = 1.0 - float(v[ep] @ q)
        candidates = [(d0, ep)]  # min-heap by distance
        results = [(-d0, ep)]  # max-heap (neg dist) bounded to ef
        while candidates:
            c_d, c = heapq.heappop(candidates)
            worst = -results[0][0]
            if c_d > worst and len(results) >= ef:
                break
            fresh = []
            for e in links[c][layer]:
                if not visited[e]:
                    visited[e] = 1
                    fresh.append(e)
            if not fresh:
                continue
            dists = (1.0 - v[fresh] @ q).tolist()
            full = len(results) >= ef
            for e, d in zip(fresh, dists):
                if not full or d < worst:
                    heapq.heappush(candidates, (d, e))
                    heapq.heappush(results, (-d, e))
                    if len(results) > ef:
                        heapq.heappop(results)
                    worst = -results[0][0]
                    full = len(results) >= ef
        return [(-nd, e) for nd, e in results]

    def _select_heuristic(self, cand: list[tuple[float, int]], m: int) -> list[int]:
        """Paper Algorithm 4 (keepPrunedConnections=False): keep a
        candidate only if it is closer to the query point than to every
        already-selected neighbor — spreads links across directions
        instead of clustering them.  The candidate-to-candidate distances
        are one small (ef×ef) matmul, not per-candidate matvecs — this
        sits in the insert hot loop (≈2× build wall)."""
        if len(cand) <= 1:
            return [e for _, e in cand]
        order = sorted(range(len(cand)), key=lambda i: cand[i])
        ids = np.fromiter((cand[i][1] for i in order), dtype=np.int64)
        pair = 1.0 - self._v[ids] @ self._v[ids].T  # (ef, ef) — ef is small
        out_pos: list[int] = []
        for j in range(len(ids)):
            if len(out_pos) >= m:
                break
            d_q = cand[order[j]][0]
            if not out_pos or d_q < pair[j, out_pos].min():
                out_pos.append(j)
        if not out_pos:  # all pruned (degenerate duplicates) — keep nearest
            out_pos.append(0)
        return [int(ids[j]) for j in out_pos]

    def _shrink(self, node: int, layer: int) -> None:
        cap = self._m0 if layer == 0 else self._m
        links = self._links[node][layer]
        if len(links) <= cap:
            return
        d = self._dist_many(self._v[node], links)
        cand = list(zip(d.tolist(), links))
        self._links[node][layer] = self._select_heuristic(cand, cap)

    def _insert(self, i: int, level: int) -> None:
        self._links.append([[] for _ in range(level + 1)])
        if self._entry < 0:
            self._entry, self._top = i, level
            return
        q = self._v[i]
        ep = self._entry
        if self._top > level:
            ep = self._greedy_descend(q, ep, self._top, level)
        for layer in range(min(self._top, level), -1, -1):
            w = self._search_layer(q, ep, self._efc, layer)
            neighbors = self._select_heuristic(w, self._m)
            self._links[i][layer] = list(neighbors)
            for e in neighbors:
                self._links[e][layer].append(i)
                self._shrink(e, layer)
            ep = min(w)[1]
        if level > self._top:
            self._entry, self._top = i, level

    # -- public: the partitioned_ann index_factory searcher contract --

    def search(self, q: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
        """Top-k by cosine similarity: (indices, similarities), best first."""
        if self._n == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
        k = min(int(k), self._n)
        qn = np.asarray(q, dtype=np.float64)
        nrm = np.linalg.norm(qn)
        if nrm > 0.0:
            qn = qn / nrm
        ep = self._greedy_descend(qn, self._entry, self._top, 0)
        ef = max(self.ef_search, k)
        w = sorted(self._search_layer(qn, ep, ef, 0))[:k]
        idx = np.array([e for _, e in w], dtype=np.int64)
        sims = np.array([1.0 - d for d, _ in w], dtype=np.float64)
        return idx, sims


def numpy_hnsw_index_factory(
    m: int = 16, ef_construction: int = 64, ef_search: int = 64, seed: int = 42
):
    """index_factory for partitioned_ann_topk backed by NumpyHNSW — the
    reference's HNSW parameters, runnable in every environment (no native
    extra).  Drop-in alternative to `hnsw_index_factory` (hnswlib)."""

    def factory(vectors: np.ndarray) -> NumpyHNSW:
        return NumpyHNSW(
            vectors, m=m, ef_construction=ef_construction, ef_search=ef_search, seed=seed
        )

    return factory
