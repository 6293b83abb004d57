"""Host-side CSR graph representation.

The TPU-native analog of the reference's per-executor `GraphMap` singleton
(reference algorithm/GraphMap.scala:11-120): instead of a mutable JVM hashmap CSR filled
by side effect, the graph is built once on the host as dense, static-shape arrays and
uploaded to device HBM. Vertex ids are densified (original id -> contiguous index) so all
device arrays are flat i32/f32; `ids` maps back to original ids for output.

Neighbor lists are sorted by (dense dst id) so that prev-membership tests — the
`prevNeighbors.exists(_._1 == dstId)` linear scan in the reference sampler
(reference algorithm/RandomSample.scala:38) — become O(log deg) vectorized binary
searches on device. Multi-edges are preserved (the reference concatenates adjacency with
`reduceByKey(_ ++ _)`, it never dedups edges — UniformRandomWalk.scala:41).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

HASH_MAX_PROBES = 4
HASH_MULT = np.uint32(2654435761)  # Knuth multiplicative hash


@dataclass
class CSRGraph:
    """Static-shape CSR adjacency over densified vertex ids.

    offsets: i64[V+1]; cols: i32[E] (dense ids, sorted within each row);
    weights: f32[E]; ids: original id per dense index.
    """

    offsets: np.ndarray
    cols: np.ndarray
    weights: np.ndarray
    ids: np.ndarray
    # Alias tables for O(1) first-order (weight-proportional) draws, aligned with cols:
    # keep-probability and in-row alias position. Built lazily by build_alias_tables().
    alias_prob: np.ndarray | None = field(default=None, repr=False)
    alias_pos: np.ndarray | None = field(default=None, repr=False)
    # Per-vertex open-addressing membership tables (built by build_hash_tables):
    # the device-side prev-membership test probes <= HASH_MAX_PROBES slots instead of
    # a log2(max_degree)-deep binary search.
    hash_offsets: np.ndarray | None = field(default=None, repr=False)
    hash_mask: np.ndarray | None = field(default=None, repr=False)
    hash_table: np.ndarray | None = field(default=None, repr=False)

    @property
    def num_vertices(self) -> int:
        return len(self.offsets) - 1

    @property
    def num_edges(self) -> int:
        """Total stored arcs — matches the reference's nEdges accumulator semantics
        (sum of adjacency lengths; undirected graphs count each edge twice,
        UniformRandomWalk.scala:60-66)."""
        return len(self.cols)

    @property
    def degrees(self) -> np.ndarray:
        return (self.offsets[1:] - self.offsets[:-1]).astype(np.int32)

    @property
    def max_degree(self) -> int:
        return int(self.degrees.max(initial=0))

    def neighbors(self, v: int) -> tuple[np.ndarray, np.ndarray]:
        """(cols, weights) of dense vertex v. Empty arrays for dead-ends — the engine
        has no 'vertex unknown here' null case (GraphMap.scala:109-120); locality is a
        routing-table question, not a storage sentinel."""
        s, e = self.offsets[v], self.offsets[v + 1]
        return self.cols[s:e], self.weights[s:e]

    def build_alias_tables(self) -> None:
        """Vose alias tables per row over weight-normalized probabilities.

        Vectorized across all rows at once (O(E) passes, no per-row Python loop):
        classic two-stack Vose, but the stacks hold edge indices globally and rows are
        processed independently via per-row running pointers.
        """
        if self.alias_prob is not None:
            return
        E = self.num_edges
        prob = np.ones(E, dtype=np.float32)
        alias = np.arange(E, dtype=np.int64)
        deg = self.offsets[1:] - self.offsets[:-1]
        # scaled[i] = w_i / row_sum * deg  (mean 1.0 per row)
        row_of = np.repeat(np.arange(self.num_vertices), deg)
        row_sum = np.zeros(self.num_vertices, dtype=np.float64)
        np.add.at(row_sum, row_of, self.weights.astype(np.float64))
        with np.errstate(invalid="ignore", divide="ignore"):
            scaled = (self.weights.astype(np.float64) /
                      np.where(row_sum[row_of] > 0, row_sum[row_of], 1.0)) * deg[row_of]

        # Per-row Vose. Rows are independent; iterate rows grouped to keep it numpy-light.
        for v in range(self.num_vertices):
            s, e = int(self.offsets[v]), int(self.offsets[v + 1])
            if e - s <= 1:
                continue
            sc = scaled[s:e].copy()
            small = [i for i in range(e - s) if sc[i] < 1.0]
            large = [i for i in range(e - s) if sc[i] >= 1.0]
            while small and large:
                sm = small.pop()
                lg = large[-1]
                prob[s + sm] = sc[sm]
                alias[s + sm] = lg
                sc[lg] -= 1.0 - sc[sm]
                if sc[lg] < 1.0:
                    large.pop()
                    small.append(lg)
            for i in small + large:
                prob[s + i] = 1.0
        # store alias as in-row positions
        self.alias_prob = prob
        self.alias_pos = (alias - np.repeat(self.offsets[:-1], deg)).astype(np.int32) \
            if E else alias.astype(np.int32)

    def build_hash_tables(self, max_probes: int = HASH_MAX_PROBES) -> None:
        """Per-vertex open-addressing neighbor-set tables, concatenated flat.

        Replaces the reference's O(deg) linear `exists` membership scan
        (RandomSample.scala:38) with <= max_probes random accesses on device —
        cheaper than binary search on TPU, where each probe is a full-width gather."""
        if self.hash_table is not None:
            return
        V = self.num_vertices
        tables = []
        hoff = np.zeros(V + 1, dtype=np.int64)
        hmask = np.zeros(V, dtype=np.int32)
        for v in range(V):
            s, e = int(self.offsets[v]), int(self.offsets[v + 1])
            t = _build_vertex_hash(self.cols[s:e], max_probes) if e > s \
                else np.full(8, -1, dtype=np.int32)
            tables.append(t)
            hmask[v] = len(t) - 1
            hoff[v + 1] = hoff[v] + len(t)
        self.hash_offsets = hoff
        self.hash_mask = hmask
        self.hash_table = (np.concatenate(tables) if tables
                           else np.full(8, -1, dtype=np.int32))


def _build_vertex_hash(keys: np.ndarray, max_probes: int) -> np.ndarray:
    """Open-addressing table (power-of-two size, linear probing) for one vertex's
    neighbor set; grows until every key lands within max_probes probes."""
    keys = np.unique(keys).astype(np.int64)
    size = 8
    need = max(1, len(keys))
    while size < 2 * need:
        size *= 2
    while True:
        table = np.full(size, -1, dtype=np.int32)
        mask = size - 1
        ok = True
        h0 = ((keys.astype(np.uint64) * np.uint64(HASH_MULT)) & np.uint64(0xFFFFFFFF)).astype(np.int64) & mask
        for k, h in zip(keys, h0):
            placed = False
            for i in range(max_probes):
                s = (h + i) & mask
                if table[s] == -1:
                    table[s] = k
                    placed = True
                    break
            if not placed:
                ok = False
                break
        if ok:
            return table
        size *= 2


def from_adjacency(adj: dict[int, list[tuple[int, float]]]) -> CSRGraph:
    """Build a CSR from {orig_src: [(orig_dst, w), ...]}.

    Dense index order = insertion order of keys (mirrors the reference GraphMap's
    first-insert-wins indexing, GraphMap.scala:58-64). Every orig id appearing as a dst
    must already be a key (the loaders guarantee this, like the reference registers
    isolated dst vertices with empty adjacency — UniformRandomWalk.scala:37).
    Rows are sorted by dense dst id; multi-edges preserved.
    """
    ids = np.fromiter(adj.keys(), dtype=np.int64, count=len(adj))
    id_map = {int(orig): i for i, orig in enumerate(ids)}
    V = len(ids)
    deg = np.fromiter((len(adj[int(orig)]) for orig in ids), dtype=np.int64, count=V)
    offsets = np.zeros(V + 1, dtype=np.int64)
    np.cumsum(deg, out=offsets[1:])
    E = int(offsets[-1])
    cols = np.empty(E, dtype=np.int32)
    weights = np.empty(E, dtype=np.float32)
    for i, orig in enumerate(ids):
        row = adj[int(orig)]
        s = offsets[i]
        if not row:
            continue
        dcols = np.fromiter((id_map[d] for d, _ in row), dtype=np.int32, count=len(row))
        dw = np.fromiter((w for _, w in row), dtype=np.float32, count=len(row))
        order = np.argsort(dcols, kind="stable")
        cols[s:s + len(row)] = dcols[order]
        weights[s:s + len(row)] = dw[order]
    return CSRGraph(offsets=offsets, cols=cols, weights=weights, ids=ids)
