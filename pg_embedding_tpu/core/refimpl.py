"""Faithful CPU re-implementation of the pg_embedding graph algorithm.

This module re-implements — in plain numpy/heapq, from the published
algorithm semantics — exactly what hnswalg.cpp does:

  * ``search_base_layer``  <- searchBaseLayer        (hnswalg.cpp:42-114)
  * ``neighbors_by_heuristic`` <- getNeighborsByHeuristic (hnswalg.cpp:117-153)
  * ``mutually_connect``   <- mutuallyConnectNewElement  (hnswalg.cpp:155-223)
  * ``bind_point``         <- bindPoint               (hnswalg.cpp:225-232)
  * ``search_knn``         <- searchKnn               (hnswalg.cpp:234-252)

It exists for three reasons:
  1. It is the *recall oracle*: the TPU engine's graphs and search results are
     validated against this known-good implementation of the reference
     algorithm (SURVEY.md §6 — "the reference's role is the recall oracle").
  2. It is the *CPU baseline* for bench.py's vs_baseline ratio.
  3. It pins the reference's exact semantics (tie-breaking, gating rule,
     termination rule) in executable form.

The reference graph is a single-layer (flat) NSW: entry point hardwired to
node 0 (embedding.c:235), node 0's insert is a no-op (hnswalg.cpp:227-228),
maxM = 2*M (embedding.c:224).

C++ ``std::priority_queue<std::pair<dist_t, idx_t>>`` is a max-heap ordered
lexicographically by (dist, idx); we reproduce that ordering with heapq on
negated keys so tie-breaking matches.
"""

from __future__ import annotations

import heapq
from typing import List, Optional, Tuple

import numpy as np

from ..config import HnswConfig, Metric


def _dist(metric: Metric, a: np.ndarray, b: np.ndarray) -> float:
    a = a.astype(np.float32, copy=False)
    b = b.astype(np.float32, copy=False)
    if metric is Metric.L2:
        d = a - b
        return float(np.sqrt(np.float32(np.dot(d, d))))
    if metric is Metric.COSINE:
        dot = float(np.dot(a, b))
        na = float(np.dot(a, a))
        nb = float(np.dot(b, b))
        return 1.0 - dot / np.sqrt(na * nb) if na * nb > 0 else 1.0
    if metric is Metric.MANHATTAN:
        return float(np.sum(np.abs(a - b)))
    raise ValueError(metric)


class _MaxHeap:
    """max-heap of (dist, idx) with std::pair ordering (dist first, idx second)."""

    def __init__(self) -> None:
        self._h: List[Tuple[float, int]] = []

    def push(self, dist: float, idx: int) -> None:
        heapq.heappush(self._h, (-dist, -idx))

    def top(self) -> Tuple[float, int]:
        d, i = self._h[0]
        return -d, -i

    def pop(self) -> Tuple[float, int]:
        d, i = heapq.heappop(self._h)
        return -d, -i

    def __len__(self) -> int:
        return len(self._h)


class RefHnswIndex:
    """In-memory flat-NSW index with reference-exact insert/search semantics."""

    def __init__(self, config: HnswConfig) -> None:
        self.config = config
        self.vectors: List[np.ndarray] = []
        self.links: List[List[int]] = []      # adjacency, len <= maxM
        self.labels: List[int] = []
        self.deleted: List[bool] = []

    # ----- storage-callback analogs (embedding.c:704-850) -----

    @property
    def n_nodes(self) -> int:
        return len(self.vectors)

    def _coords(self, idx: int) -> np.ndarray:
        return self.vectors[idx]

    # ----- searchBaseLayer (hnswalg.cpp:42-114) -----

    def search_base_layer(self, point: np.ndarray, ef: int) -> _MaxHeap:
        top_results = _MaxHeap()
        if self.n_nodes == 0:
            # hnsw_begin_read of enterpoint fails on an empty index
            # (embedding.c:737-742) -> empty heap (gh-2 semantics).
            return top_results
        point = point.astype(np.float32, copy=False)
        visited = np.zeros(self.n_nodes, dtype=bool)

        # min-heap via negation, identical to candidateSet (hnswalg.cpp:53,63)
        candidate_set = _MaxHeap()

        enterpoint = 0  # meta->enterpoint_node is always 0 (embedding.c:235)
        dist = _dist(self.config.metric, point, self._coords(enterpoint))
        top_results.push(dist, enterpoint)
        candidate_set.push(-dist, enterpoint)
        visited[enterpoint] = True
        lower_bound = dist

        while len(candidate_set):
            neg_d, cur = candidate_set.top()
            if -neg_d > lower_bound:  # termination rule (hnswalg.cpp:70-71)
                break
            candidate_set.pop()

            for tnum in self.links[cur]:
                if visited[tnum]:
                    continue
                visited[tnum] = True
                d = _dist(self.config.metric, point, self._coords(tnum))
                # gating rule (hnswalg.cpp:99)
                if len(top_results) < ef or top_results.top()[0] > d:
                    candidate_set.push(-d, tnum)
                    top_results.push(d, tnum)
                    if len(top_results) > ef:
                        top_results.pop()
                    lower_bound = top_results.top()[0]
        return top_results

    # ----- getNeighborsByHeuristic (hnswalg.cpp:117-153) -----

    def _heuristic_from_pairs(self, pairs: List[Tuple[float, int]],
                              nn: int) -> List[Tuple[float, int]]:
        """pairs: (dist_to_query, idx). Returns the kept subset, in the order
        chosen (nearest-first scan), as the reference's returnlist."""
        if len(pairs) < nn:
            return list(pairs)
        # resultSet: max-heap on (-dist, idx) => pops nearest-first with
        # larger idx winning ties (hnswalg.cpp:126,133).
        rs = _MaxHeap()
        for d, i in pairs:
            rs.push(-d, i)
        returnlist: List[Tuple[float, int]] = []
        while len(rs):
            if len(returnlist) >= nn:
                break
            nd, idx = rs.pop()
            dist_to_query = -nd
            good = True
            for _, ridx in returnlist:
                curdist = _dist(self.config.metric, self._coords(ridx),
                                self._coords(idx))
                if curdist < dist_to_query:
                    good = False
                    break
            if good:
                returnlist.append((dist_to_query, idx))
        return returnlist

    # ----- mutuallyConnectNewElement (hnswalg.cpp:155-223) -----

    def _mutually_connect(self, cur_c: int,
                          top_results: _MaxHeap) -> None:
        pairs = []
        while len(top_results):
            pairs.append(top_results.pop())
        pairs.reverse()  # ascending distance
        pruned = len(pairs) >= self.config.m
        kept = self._heuristic_from_pairs(pairs, self.config.m)

        # Link-list order parity: when the heuristic actually pruned, it
        # re-inserts (-dist, idx) pairs (hnswalg.cpp:151-152), so popping the
        # max-heap yields *ascending* distance; when it returned early
        # (size < NN, hnswalg.cpp:119-120) the heap still holds (+dist, idx)
        # and popping yields *descending* distance. Ties pop larger idx first
        # (std::pair comparison).
        if pruned:
            res = [i for _, i in sorted(kept, key=lambda p: (p[0], -p[1]))]
        else:
            res = [i for _, i in sorted(kept, key=lambda p: (-p[0], -p[1]))]

        assert not self.links[cur_c], "Should be blank"  # hnswalg.cpp:170-171
        self.links[cur_c] = list(res)

        max_m = self.config.max_m
        for idx in res:
            assert idx != cur_c, "Connection to the same element"
            other = self.links[idx]
            if len(other) < max_m:
                other.append(cur_c)  # hnswalg.cpp:193-195
            else:
                # re-select the maxM best among {existing links + new node}
                # by distance *to the overflowing node* (hnswalg.cpp:196-220)
                base = self._coords(idx)
                cands: List[Tuple[float, int]] = [
                    (_dist(self.config.metric, self._coords(cur_c), base),
                     cur_c)
                ]
                for j in other:
                    cands.append(
                        (_dist(self.config.metric, self._coords(j), base), j))
                kept2 = self._heuristic_from_pairs(cands, max_m)
                # candidates size is maxM+1 >= maxM, so the heuristic always
                # prunes here -> pop order is ascending distance
                # (hnswalg.cpp:211-219).
                new_list = [i for _, i in
                            sorted(kept2, key=lambda p: (p[0], -p[1]))]
                self.links[idx] = new_list

    # ----- bindPoint / insert path (hnswalg.cpp:225-232; embedding.c:606) ---

    def add(self, point: np.ndarray, label: int) -> int:
        point = np.asarray(point, dtype=np.float32)
        if point.shape != (self.config.dims,):
            raise ValueError(
                f"wrong number of dimensions: {point.shape} vs "
                f"({self.config.dims},)")
        cur_c = self.n_nodes
        self.vectors.append(point)
        self.links.append([])
        self.labels.append(int(label))
        self.deleted.append(False)
        if cur_c != 0:  # first element is a no-op (hnswalg.cpp:227-228)
            top = self.search_base_layer(point, self.config.ef_construction)
            self._mutually_connect(cur_c, top)
        return cur_c

    def build(self, points: np.ndarray, labels) -> None:
        for p, l in zip(points, labels):
            self.add(p, int(l))

    # ----- searchKnn / hnsw_search (hnswalg.cpp:234-277) -----

    def search(self, query: np.ndarray,
               ef_search: Optional[int] = None) -> List[Tuple[float, int]]:
        """Returns [(dist, label)] ascending by distance, tombstones filtered
        (hnswalg.cpp:243-246), at most ef_search entries."""
        k = self.config.ef_search if ef_search is None else ef_search
        top = self.search_base_layer(np.asarray(query, np.float32), k)
        while len(top) > k:
            top.pop()
        out: List[Tuple[float, int]] = []
        while len(top):
            d, idx = top.pop()
            if not self.deleted[idx]:
                out.append((d, self.labels[idx]))
        out.reverse()
        return out

    def search_idx(self, query: np.ndarray, ef: int) -> List[Tuple[float, int]]:
        """Like search() but returns internal node ids, unfiltered — for
        graph/traversal parity tests against the TPU engine."""
        top = self.search_base_layer(np.asarray(query, np.float32), ef)
        out = []
        while len(top):
            out.append(top.pop())
        out.reverse()
        return out

    # ----- tombstones (embedding.c:918-932; hnswalg.cpp:245) -----

    def delete_label(self, label: int) -> int:
        n = 0
        for i, l in enumerate(self.labels):
            if l == label and not self.deleted[i]:
                self.deleted[i] = True
                n += 1
        return n
