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
    # Packed fast-path tables per shard (ops/sampling.pack_tables_host semantics,
    # stacked and padded; None when packing was not applicable on some shard).
    row_meta: np.ndarray | None = None      # i32[S, R_max, 2]
    hash_meta: np.ndarray | None = None     # i32[S, R_max, 2] (bucket base, nb-1)
    alias_packed: np.ndarray | None = None  # i32[S, E_max, 4]
    hash_buckets: np.ndarray | None = None  # i32[S, NB_max, 4]

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

    # Halo rows, vectorized per shard: each arc u->w obliges shard route[u] to
    # hold row(w) and shard route[w] to hold row(u). Per-shard boolean masks over
    # V with whole-arc-array writes (O(S*E) vectorized compares total — beats a
    # global 2E-key unique by a wide margin at LiveJournal scale).
    if E:
        src_of_edge = np.repeat(np.arange(V, dtype=np.int64), deg)
        route_src = route[src_of_edge]
        route_dst = route[graph.cols]
    rows_per_shard: list[np.ndarray] = []
    for s in range(S):
        owned_mask = route == s
        nbr_mask = np.zeros(V, dtype=bool)
        if E:
            nbr_mask[graph.cols[route_src == s]] = True   # out-neighbors of owned
            nbr_mask[src_of_edge[route_dst == s]] = True  # in-neighbors of owned
        halo = np.flatnonzero(nbr_mask & ~owned_mask).astype(np.int64)
        owned = np.flatnonzero(owned_mask).astype(np.int64)
        rows_per_shard.append(np.concatenate([owned, halo]))

    R_max = max((len(r) for r in rows_per_shard), default=1) or 1
    E_max = max((int(deg[r].sum()) for r in rows_per_shard), default=1) or 1
    hsizes = (graph.hash_offsets[1:] - graph.hash_offsets[:-1]).astype(np.int64)
    H_max = max((int(hsizes[r].sum()) for r in rows_per_shard), default=8) or 8

    offsets = np.zeros((S, R_max + 1), dtype=np.int64)
    # padding areas beyond each shard's fill are never read on device (offsets/
    # hash bases always stay inside the filled prefix), so np.empty is safe for
    # the big buffers — np.full on the [S, H_max] table alone memsets ~10 GB at
    # LiveJournal scale
    cols = np.empty((S, E_max), dtype=np.int32)
    weights = np.empty((S, E_max), dtype=np.float32)
    aprob = np.empty((S, E_max), dtype=np.float32)
    apos = np.empty((S, E_max), dtype=np.int32)
    hoff = np.zeros((S, R_max), dtype=np.int64)
    hmask = np.zeros((S, R_max), dtype=np.int32)
    htab = np.empty((S, H_max), dtype=np.int32)
    glob2loc = np.full((S, V), -1, dtype=np.int32)
    num_owned = np.zeros(S, dtype=np.int32)
    num_local = np.zeros(S, dtype=np.int32)

    try:
        from .. import native
        _gather = native.gather_rows if native.available() else None
    except Exception:
        _gather = None

    def _fill(starts: np.ndarray, lens: np.ndarray, src: np.ndarray,
              out_row: np.ndarray) -> None:
        """out_row[:lens.sum()] = concat of src[starts[i]:starts[i]+lens[i]].
        Native range-memcpy when available; NumPy flat-index fallback."""
        if _gather is not None:
            _gather(starts, lens, np.ascontiguousarray(src), out_row)
            return
        total = int(lens.sum())
        csum = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(lens, out=csum[1:])
        idx = np.repeat(starts - csum[:-1], lens) + np.arange(total, dtype=np.int64)
        out_row[:total] = src[idx]

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
            starts = graph.offsets[:-1][rows]
            _fill(starts, lens, graph.cols, cols[s])
            _fill(starts, lens, graph.weights, weights[s])
            _fill(starts, lens, graph.alias_prob, aprob[s])
            _fill(starts, lens, graph.alias_pos, apos[s])
        hs = hsizes[rows]
        H_s = int(hs.sum())
        hoff[s, 1:R] = np.cumsum(hs)[:-1]
        hmask[s, :R] = graph.hash_mask[rows]
        if H_s:
            _fill(graph.hash_offsets[:-1][rows], hs, graph.hash_table, htab[s])

    # Per-shard packed fast-path tables (same transaction-count win as the
    # single-chip engine; ops/sampling.pack_tables_host). Any shard where packing
    # is inapplicable disables it for all (the device graph must be uniform).
    from ..ops.sampling import pack_tables_host
    pks: list = []
    ok = True
    for s, rows in enumerate(rows_per_shard):
        R = len(rows)
        E_s = int(offsets[s, R]) if R else 0
        if R == 0 or E_s == 0:
            # nothing to sample here: zero row_meta means degree 0 everywhere,
            # so every local draw is masked; zero hash_meta probes bucket row 0
            # of the -1 fill (membership always False)
            pks.append(None)
            continue
        pk = pack_tables_host(
            offsets[s, :R + 1], cols[s, :E_s], aprob[s, :E_s], apos[s, :E_s])
        if pk is None:
            ok = False
            break
        pks.append(pk)
    if ok:
        row_meta = np.zeros((S, R_max, 2), dtype=np.int32)
        hash_meta = np.zeros((S, R_max, 2), dtype=np.int32)
        alias_packed = np.zeros((S, E_max, 4), dtype=np.int32)
        NB_max = max((len(pk[3]) for pk in pks if pk is not None), default=1) or 1
        hash_buckets = np.full((S, NB_max, 4), -1, dtype=np.int32)
        for s, pk in enumerate(pks):
            if pk is None:
                continue
            R = len(rows_per_shard[s])
            E_s = int(offsets[s, R])
            row_meta[s, :R] = pk[0]
            alias_packed[s, :E_s] = pk[1]
            hash_meta[s, :R] = pk[2]
            hash_buckets[s, :len(pk[3])] = pk[3]
    else:
        row_meta = hash_meta = alias_packed = hash_buckets = None

    return ShardedGraphHost(
        num_shards=S, route=route, offsets=offsets, cols=cols, weights=weights,
        alias_prob=aprob, alias_pos=apos, hash_offsets=hoff, hash_mask=hmask,
        hash_table=htab, glob2loc=glob2loc,
        num_owned=num_owned, num_local=num_local,
        row_meta=row_meta, hash_meta=hash_meta,
        alias_packed=alias_packed, hash_buckets=hash_buckets)
