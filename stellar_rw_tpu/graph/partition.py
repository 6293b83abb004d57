"""Host-side graph partitioner: per-shard CSR with halo replication.

TPU analog of the reference's two partitioning policies (SURVEY.md §2.3):
  - uniform hash: shard(v) = dense_id(v) % S, mirroring Spark's HashPartitioner with
    Int identity hashCode (reference RandomWalk.scala:16, UniformRandomWalk.scala:42)
  - explicit vertex-cut: shard(v) = the vertex's home partition from the edge file's
    partition column (reference VCutRandomWalk.scala:19-54)

Halo rule (both policies): the adjacency row of v is replicated to every shard that owns
a vertex adjacent to v (in either edge direction). This is exactly the reference's VCut
replication — "the vertex's full merged adjacency is replicated to every partition that
has at least one of its edges" (VCutRandomWalk.scala:43-54) — and it is what makes the
second-order prev-membership test always shard-local: when a walker steps prev -> cur,
prev is adjacent to cur, so the shard owning row(cur) holds a replica of row(prev).
This replaces the reference's trick of shipping `prevNeighbors` inside the walker tuple
across partitions (RandomWalk.scala:101,106-109).

All shards are padded to common static shapes and stacked on a leading shard axis, ready
to be dropped into a shard_map over a 1-D device mesh.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .csr import CSRGraph


@dataclass
class ShardedGraphHost:
    """Stacked per-shard CSR arrays (leading axis = shard). cols hold GLOBAL dense ids;
    rows are ordered owned-first then halo; glob2loc maps global id -> local row."""

    num_shards: int
    route: np.ndarray        # i32[V] global vertex -> owning shard
    offsets: np.ndarray      # i64[S, R_max+1]
    cols: np.ndarray         # i32[S, E_max]
    weights: np.ndarray      # f32[S, E_max]
    alias_prob: np.ndarray   # f32[S, E_max]
    alias_pos: np.ndarray    # i32[S, E_max]
    hash_offsets: np.ndarray  # i64[S, R_max] per-local-row membership-table base
    hash_mask: np.ndarray     # i32[S, R_max]
    hash_table: np.ndarray    # i32[S, H_max]
    glob2loc: np.ndarray     # i32[S, V]
    num_owned: np.ndarray    # i32[S]
    num_local: np.ndarray    # i32[S] (owned + halo)

    @property
    def replication_factor(self) -> float:
        """Mean copies of a vertex row across shards — the reference logs the same
        per-partition replica stats (UniformRandomWalk.scala:48-79)."""
        return float(self.num_local.sum()) / max(1, len(self.route))


def partition_graph(graph: CSRGraph, num_shards: int,
                    route: np.ndarray | None = None) -> ShardedGraphHost:
    graph.build_alias_tables()
    graph.build_hash_tables()
    V = graph.num_vertices
    S = num_shards
    if route is None:
        route = (np.arange(V) % S).astype(np.int32)
    else:
        route = np.asarray(route, dtype=np.int32)
        assert route.shape == (V,) and route.min(initial=0) >= 0 and \
            route.max(initial=0) < S, "route must map every vertex to [0, S)"

    deg = (graph.offsets[1:] - graph.offsets[:-1]).astype(np.int64)
    E = graph.num_edges

    # Halo rows, fully vectorized (no per-shard O(V) masks — required at
    # LiveJournal scale): each arc u->w obliges shard route[u] to hold row(w) and
    # shard route[w] to hold row(u). Unique (shard, row) pairs via a packed key.
    if E:
        src_of_edge = np.repeat(np.arange(V, dtype=np.int64), deg)
        cols64 = graph.cols.astype(np.int64)
        pair_shard = np.concatenate([route[src_of_edge], route[cols64]]).astype(np.int64)
        pair_row = np.concatenate([cols64, src_of_edge])
        key = np.unique(pair_shard * V + pair_row)
        k_shard = (key // V).astype(np.int32)
        k_row = key % V
        is_halo = route[k_row] != k_shard
        k_shard, k_row = k_shard[is_halo], k_row[is_halo]
    else:
        k_shard = np.zeros(0, dtype=np.int32)
        k_row = np.zeros(0, dtype=np.int64)

    # rows per shard: owned ascending, then halo ascending (keys are sorted, so
    # k_row is ascending within each shard)
    rows_per_shard: list[np.ndarray] = []
    for s in range(S):
        owned = np.flatnonzero(route == s).astype(np.int64)
        halo = k_row[k_shard == s]
        rows_per_shard.append(np.concatenate([owned, halo]))

    R_max = max((len(r) for r in rows_per_shard), default=1) or 1
    E_max = max((int(deg[r].sum()) for r in rows_per_shard), default=1) or 1
    hsizes = (graph.hash_offsets[1:] - graph.hash_offsets[:-1]).astype(np.int64)
    H_max = max((int(hsizes[r].sum()) for r in rows_per_shard), default=8) or 8

    offsets = np.zeros((S, R_max + 1), dtype=np.int64)
    cols = np.zeros((S, E_max), dtype=np.int32)
    weights = np.zeros((S, E_max), dtype=np.float32)
    aprob = np.ones((S, E_max), dtype=np.float32)
    apos = np.zeros((S, E_max), dtype=np.int32)
    hoff = np.zeros((S, R_max), dtype=np.int64)
    hmask = np.zeros((S, R_max), dtype=np.int32)
    htab = np.full((S, H_max), -1, dtype=np.int32)
    glob2loc = np.full((S, V), -1, dtype=np.int32)
    num_owned = np.zeros(S, dtype=np.int32)
    num_local = np.zeros(S, dtype=np.int32)

    def _flat_gather_idx(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
        """Concatenated [starts[i], starts[i]+lens[i]) ranges without Python loops:
        element j of range i sits at repeat(starts - cumsum_exclusive, lens) + j."""
        total = int(lens.sum())
        csum = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(lens, out=csum[1:])
        return np.repeat(starts - csum[:-1], lens) + np.arange(total, dtype=np.int64)

    for s, rows in enumerate(rows_per_shard):
        R = len(rows)
        num_owned[s] = int((route == s).sum())
        num_local[s] = R
        if R == 0:
            continue
        glob2loc[s, rows] = np.arange(R, dtype=np.int32)
        lens = deg[rows]
        E_s = int(lens.sum())
        np.cumsum(lens, out=offsets[s, 1:R + 1])
        offsets[s, R + 1:] = offsets[s, R]
        if E_s:
            idx = _flat_gather_idx(graph.offsets[:-1][rows], lens)
            cols[s, :E_s] = graph.cols[idx]
            weights[s, :E_s] = graph.weights[idx]
            aprob[s, :E_s] = graph.alias_prob[idx]
            apos[s, :E_s] = graph.alias_pos[idx]
        hs = hsizes[rows]
        H_s = int(hs.sum())
        hoff[s, 1:R] = np.cumsum(hs)[:-1]
        hmask[s, :R] = graph.hash_mask[rows]
        if H_s:
            hidx = _flat_gather_idx(graph.hash_offsets[:-1][rows], hs)
            htab[s, :H_s] = graph.hash_table[hidx]

    return ShardedGraphHost(
        num_shards=S, route=route, offsets=offsets, cols=cols, weights=weights,
        alias_prob=aprob, alias_pos=apos, hash_offsets=hoff, hash_mask=hmask,
        hash_table=htab, glob2loc=glob2loc,
        num_owned=num_owned, num_local=num_local)
