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
    src_of_edge = np.repeat(np.arange(V, dtype=np.int32), deg)

    # adjacency in the undirected sense: shard s needs row(u) for every u touching an
    # owned vertex from either side
    out_pairs = np.stack([src_of_edge, graph.cols], axis=1)       # v -> u
    halo_sets: list[np.ndarray] = []
    rows_per_shard: list[np.ndarray] = []
    for s in range(S):
        owned = np.nonzero(route == s)[0].astype(np.int32)
        owned_mask = np.zeros(V, dtype=bool)
        owned_mask[owned] = True
        nbr_mask = np.zeros(V, dtype=bool)
        if len(out_pairs):
            # u reachable from owned rows (out-neighbors of owned)
            sel = owned_mask[out_pairs[:, 0]]
            nbr_mask[out_pairs[sel, 1]] = True
            # u with an edge INTO an owned vertex (in-neighbors of owned)
            sel = owned_mask[out_pairs[:, 1]]
            nbr_mask[out_pairs[sel, 0]] = True
        halo = np.nonzero(nbr_mask & ~owned_mask)[0].astype(np.int32)
        halo_sets.append(halo)
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

    for s, rows in enumerate(rows_per_shard):
        num_owned[s] = int((route == s).sum())
        num_local[s] = len(rows)
        glob2loc[s, rows] = np.arange(len(rows), dtype=np.int32)
        e = 0
        he = 0
        for i, v in enumerate(rows):
            a, b = int(graph.offsets[v]), int(graph.offsets[v + 1])
            n = b - a
            cols[s, e:e + n] = graph.cols[a:b]
            weights[s, e:e + n] = graph.weights[a:b]
            aprob[s, e:e + n] = graph.alias_prob[a:b]
            apos[s, e:e + n] = graph.alias_pos[a:b]
            offsets[s, i + 1] = offsets[s, i] + n
            e += n
            ha, hb = int(graph.hash_offsets[v]), int(graph.hash_offsets[v + 1])
            htab[s, he:he + (hb - ha)] = graph.hash_table[ha:hb]
            hoff[s, i] = he
            hmask[s, i] = graph.hash_mask[v]
            he += hb - ha
        offsets[s, len(rows) + 1:] = offsets[s, len(rows)]

    return ShardedGraphHost(
        num_shards=S, route=route, offsets=offsets, cols=cols, weights=weights,
        alias_prob=aprob, alias_pos=apos, hash_offsets=hoff, hash_mask=hmask,
        hash_table=htab, glob2loc=glob2loc,
        num_owned=num_owned, num_local=num_local)
