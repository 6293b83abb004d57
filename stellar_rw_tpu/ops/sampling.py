"""Device-side sampling primitives over CSR adjacency.

This is the TPU-native replacement for the reference's innermost hot code
(reference algorithm/RandomSample.scala:12-62): instead of per-walker O(deg) Scala loops
over `Array[(Int, Float)]`, everything here is vectorized over a dense walker axis with
static shapes, so XLA can tile it onto the VPU and fuse the gathers.

Two samplers implement the same transition distribution:

  * `cdf_sample_*` — exact inverse-CDF over the (padded) biased neighbor row. Matches
    the reference's scan order bit-for-bit given the same uniform (RandomSample.scala:
    12-25: first cumulative-normalized weight >= u, fallback to the row head), including
    the dst==prev > prev-membership > else precedence (RandomSample.scala:36-39).
    O(max_degree) work per walker per step; used for parity tests and small graphs.

  * `rejection_sample` / `rejection_sample_static` — O(1) alias-table draw from
    the first-order distribution (candidate ∝ w) followed by acceptance with
    probability f(dst)/max_f where f ∈ {1/p, 1, 1/q} is the node2vec bias.
    Accepted samples are distributed ∝ w·f(dst), i.e. exactly the reference's
    second-order distribution, without ever materializing the biased row.
    O(log deg) membership test per trial. Both execute the SAME per-(trial,
    walker) schedule — `_static` through a control-flow-free compaction cascade
    (the production plan; a while_loop inside the walk scan costs milliseconds
    per step on v5e even at zero iterations) and the dynamic form through
    while-loop compaction (the exact-in-all-regimes fallback the engines
    re-dispatch on cascade overflow). Corpora are bitwise identical across the
    two whenever no compaction buffer overflows.

Prev-membership (`dst in N(prev)`, the `exists` scan at RandomSample.scala:38) is a
vectorized binary search over rows kept sorted by the CSR builder.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class DeviceGraph(NamedTuple):
    """CSR shard resident in device HBM (arrays only; static metadata rides separately).

    The device analog of the reference's per-executor GraphMap singleton
    (GraphMap.scala:13-16): offsets/cols/weights replace the hashmap+ArrayBuffer CSR;
    alias_prob/alias_pos give O(1) weight-proportional draws.
    """

    offsets: jax.Array      # i32[V+1]
    cols: jax.Array         # i32[E], sorted within each row
    weights: jax.Array      # f32[E]
    alias_prob: jax.Array   # f32[E]
    alias_pos: jax.Array    # i32[E] (in-row alias position)
    hash_offsets: jax.Array  # i32[V] base of each vertex's membership table
    hash_mask: jax.Array     # i32[V] table size - 1 (power of two)
    hash_table: jax.Array    # i32[H] neighbor ids, -1 = empty
    # Packed fast-path tables (pack_tables_host; None = use the unpacked arrays).
    # Random-gather TRANSACTIONS dominate walk-step cost on HBM-resident graphs,
    # so values that are always read together ride one aligned row gather:
    # (row start, degree) and (bucket base, mask) as 8-byte rows, the alias
    # decision + BOTH candidate vertex ids as a 16-byte alias4 row, and the
    # membership test as a 16-byte bucket row: 11 transactions/step -> 4.
    row_meta: jax.Array | None = None      # i32[V,2] (row start, degree)
    hash_meta: jax.Array | None = None     # i32[V,2] (bucket row base, nb-1)
    alias_packed: jax.Array | None = None  # i32[E,4] (prob bits, col-if-keep,
    #                                        col-if-alias, alias pos): one 16-byte
    #                                        slice gather yields the CANDIDATE
    #                                        VERTEX directly — no second cols gather
    hash_buckets: jax.Array | None = None  # i32[NB,4] bucketized membership
    #                                        tables: a key's ONLY possible home is
    #                                        bucket hash(key) & (nb-1) of its row,
    #                                        so membership is one ALIGNED 16-byte
    #                                        row gather + compare (measured 2.2x
    #                                        cheaper than the round-2 unaligned
    #                                        dynamic-slice probe window on v5e)
    vmeta: jax.Array | None = None         # i32[V,4] = row_meta ++ hash_meta:
    #                                        (row start, degree, bucket base,
    #                                        nb-1) as ONE 16-byte row — the
    #                                        single-chip engine gathers it once
    #                                        per step for cur and CARRIES prev's
    #                                        row in the scan, replacing three
    #                                        separate per-step gathers (deg,
    #                                        row_meta[cur], hash_meta[prev])

    @property
    def num_vertices(self) -> int:
        return self.offsets.shape[0] - 1

    @property
    def num_edges(self) -> int:
        return self.cols.shape[0]


BUCKET_SLOTS = 4  # membership bucket width: one aligned 16-byte row gather


def bucket_tables_host(offsets, cols):
    """Bucketized per-vertex membership tables, vectorized on host.

    Each vertex's UNIQUE neighbors are placed in nb power-of-two buckets of
    BUCKET_SLOTS slots; a key's only possible home is bucket
    hash(key) & (nb - 1), so the device membership test is ONE aligned 16-byte
    row gather + 4 compares. (The round-2 layout probed an unaligned window of
    a flat padded table via dynamic_slice — measured 2.2x slower per access
    than an aligned row gather on v5e.) Buckets that overflow BUCKET_SLOTS
    double that row's nb and rebuild (rare: average load is <= 2 keys/bucket).

    Returns (hash_meta i32[V,2] = (bucket row base, nb-1), buckets
    i32[NB, BUCKET_SLOTS], -1 = empty) or None when the layout exceeds i32.
    """
    offsets = np.asarray(offsets, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int32)
    V = len(offsets) - 1
    E = len(cols)
    deg = offsets[1:] - offsets[:-1]
    if E:
        first = np.ones(E, dtype=bool)
        first[1:] = cols[1:] != cols[:-1]
        first[np.clip(offsets[:-1], 0, E - 1)] = True
        row_of = np.repeat(np.arange(V, dtype=np.int64), deg)
        keys = cols[first].astype(np.int64)
        krow = row_of[first]
        udeg = np.zeros(V, dtype=np.int64)
        np.add.at(udeg, krow, 1)
    else:
        keys = np.zeros(0, dtype=np.int64)
        krow = np.zeros(0, dtype=np.int64)
        udeg = np.zeros(V, dtype=np.int64)
    # nb = pow2ceil(need / 2): average load <= 2 of BUCKET_SLOTS slots
    need = np.maximum(udeg, 1)
    nb = (2 ** np.ceil(np.log2(np.maximum(need, 2) / 2.0))).astype(np.int64)
    h0 = ((keys.astype(np.uint64) * np.uint64(HASH_MULT))
          & np.uint64(0xFFFFFFFF)).astype(np.int64)
    idx = np.arange(len(keys), dtype=np.int64)
    while True:
        boff = np.zeros(V + 1, dtype=np.int64)
        np.cumsum(nb, out=boff[1:])
        NB = int(boff[-1])
        if NB >= 2**31 // BUCKET_SLOTS:
            return None  # pathological layout: caller falls back to unpacked
        gb = boff[:-1][krow] + (h0 & (nb[krow] - 1))
        order = np.argsort(gb, kind="stable")
        gbs = gb[order]
        if len(gbs):
            newgrp = np.ones(len(gbs), dtype=bool)
            newgrp[1:] = gbs[1:] != gbs[:-1]
            rank = idx - np.maximum.accumulate(np.where(newgrp, idx, 0))
        else:
            rank = idx
        over = rank >= BUCKET_SLOTS
        if not over.any():
            buckets = np.full((NB, BUCKET_SLOTS), -1, dtype=np.int32)
            buckets[gbs, rank] = keys[order].astype(np.int32)
            hash_meta = np.stack([boff[:-1], nb - 1], 1).astype(np.int32)
            return hash_meta, buckets
        nb[np.unique(krow[order[over]])] *= 2  # grow + rebuild (rare)


def pack_tables_host(offsets, cols, alias_prob, alias_pos):
    """Build the packed fast-path tables (see DeviceGraph) on host, vectorized.

    The alias rows carry BOTH possible candidate vertex ids (keep / alias) so a
    trial's candidate comes out of one 16-byte slice gather with no follow-up
    cols gather; membership rides the aligned bucket tables
    (bucket_tables_host). Returns (row_meta, alias_packed, hash_meta,
    hash_buckets) or None when packing is not applicable (empty graph, layouts
    too large for i32).
    """
    V = len(offsets) - 1
    E = len(alias_pos) if alias_pos is not None else 0
    if V == 0 or E == 0:
        return None
    if int(offsets[-1]) >= 2**31:
        return None
    deg = offsets[1:] - offsets[:-1]
    row_meta = np.stack([offsets[:-1], deg], 1).astype(np.int32)
    prob_bits = np.ascontiguousarray(alias_prob, dtype=np.float32).view(np.int32)
    row_of = np.repeat(np.arange(V, dtype=np.int64), deg)
    col_alias = np.asarray(cols, dtype=np.int32)[
        offsets[:-1][row_of] + alias_pos.astype(np.int64)]
    alias_packed = np.stack(
        [prob_bits, np.asarray(cols, dtype=np.int32), col_alias,
         alias_pos.astype(np.int32)], 1)
    bt = bucket_tables_host(offsets, cols)
    if bt is None:
        return None
    hash_meta, hash_buckets = bt
    return row_meta, alias_packed, hash_meta, hash_buckets


def vmeta_host(row_meta: np.ndarray, hash_meta: np.ndarray) -> np.ndarray:
    """Fuse row_meta and hash_meta into one [V,4] row (see DeviceGraph.vmeta)."""
    return np.concatenate([row_meta, hash_meta], axis=-1)


def device_put_graph(graph, device=None, packed: bool = True) -> DeviceGraph:
    """Upload a host CSRGraph (graph/csr.py) to device HBM.

    packed=True additionally uploads the packed fast-path tables (the production
    rejection sampler then needs 5 random HBM transactions per step instead of 11;
    results are bitwise identical either way)."""
    graph.build_alias_tables()
    graph.build_hash_tables()
    put = lambda x, dt: jax.device_put(jnp.asarray(x, dtype=dt), device)
    pk = pack_tables_host(
        graph.offsets, graph.cols, graph.alias_prob,
        graph.alias_pos) if packed else None
    return DeviceGraph(
        offsets=put(graph.offsets, jnp.int32),
        cols=put(graph.cols, jnp.int32),
        weights=put(graph.weights, jnp.float32),
        alias_prob=put(graph.alias_prob, jnp.float32),
        alias_pos=put(graph.alias_pos, jnp.int32),
        hash_offsets=put(graph.hash_offsets[:-1], jnp.int32),
        hash_mask=put(graph.hash_mask, jnp.int32),
        hash_table=put(graph.hash_table, jnp.int32),
        row_meta=put(pk[0], jnp.int32) if pk else None,
        alias_packed=put(pk[1], jnp.int32) if pk else None,
        hash_meta=put(pk[2], jnp.int32) if pk else None,
        hash_buckets=put(pk[3], jnp.int32) if pk else None,
        vmeta=put(vmeta_host(pk[0], pk[2]), jnp.int32) if pk else None,
    )


def search_iters(max_degree: int) -> int:
    return max(1, math.ceil(math.log2(max_degree + 1))) + 1


def plan_sampler(sampler: str, p: float, q: float) -> tuple[str, int]:
    """Resolve the production sampler + rejection round budget for a (p, q).

    Rejection acceptance of a candidate is f/max_f with f in {1/p, 1, 1/q}, so
    worst-case acceptance is min_f/max_f = 1/ratio. The round budget is sized so
    the truncation probability (a walker keeping its last candidate after every
    trial, sampling.rejection_sample) is < e^-8 ≈ 3e-4 even if every candidate
    lands in the worst bias class: trials = k_candidates * max_rounds ≈ 8*ratio.
    Beyond ratio 32 that budget approaches the exact inverse-CDF scan's cost, so
    the engine switches to the cdf sampler outright (extreme p/q — e.g. 100 —
    are exact there at any degree)."""
    if sampler != "rejection":
        return sampler, 16
    fs = (1.0 / p, 1.0, 1.0 / q)
    ratio = max(fs) / min(fs)
    if ratio > 32.0:
        return "cdf", 16
    return "rejection", max(16, int(2.0 * ratio) + 1)


CDF_PAD_LIMIT = 1 << 27   # elements the padded exact-CDF path may materialize
CDF_CHUNK = 256           # row-slice width of the streaming exact-CDF path


def plan_cdf_chunk(batch_walkers: int, max_degree: int) -> int:
    """0 = padded exact-CDF (one [W, max_degree] materialization — fastest when
    it fits); else the chunk width for the streaming path. Padding cost scales
    as batch x max_degree, which on power-law graphs at LiveJournal scale is an
    OOM (round-2 verdict item 5) — the streaming path holds memory at
    batch x CDF_CHUNK regardless of degree.

    Engines must NOT call this with engine-local batch sizes: the chunked and
    padded paths are distribution-identical but not bitwise, so the decision
    must come from plan_cdf_chunk_corpus (layout-invariant) or the cross-layout
    bitwise guarantees silently break (round-3 advisor finding)."""
    if batch_walkers * max(max_degree, 1) <= CDF_PAD_LIMIT:
        return 0
    return CDF_CHUNK


def plan_cdf_chunk_corpus(num_walks: int, n_starts: int,
                          max_degree: int) -> int:
    """LAYOUT-INVARIANT chunked-vs-padded exact-CDF decision.

    Every engine (single-chip batched, sharded, multi-host, per-round
    streaming/checkpointed) derives the decision from the same corpus-level
    quantity — the FULL corpus walker count num_walks * n_starts — so all
    layouts pick the same CDF path and stay bitwise identical (the two paths
    are only distribution-identical). Conservative by construction: if the
    full-corpus padded materialization fits the limit, any sub-batch of it
    does too; if not, everyone streams (chunked memory is batch x CDF_CHUNK,
    always smaller)."""
    return plan_cdf_chunk(num_walks * n_starts, max_degree)


def in_row(g: DeviceGraph, rows: jax.Array, queries: jax.Array, n_iters: int) -> jax.Array:
    """Vectorized membership: queries[...] in sorted row cols[offsets[rows]:offsets[rows+1]].

    TEST/REFERENCE PATH ONLY — production membership goes through `in_row_hash`
    (constant HASH_PROBES slot reads beat a log2(max_degree)-deep gather chain on
    TPU); this binary search stays as the independent oracle the hash tables are
    cross-validated against (tests/test_sampling.py).

    rows and queries broadcast together; n_iters >= log2(max_degree)+1 (static).
    """
    E = g.num_edges
    lo = g.offsets[rows].astype(jnp.int32)
    end = g.offsets[rows + 1].astype(jnp.int32)
    lo = jnp.broadcast_to(lo, jnp.broadcast_shapes(lo.shape, queries.shape))
    hi = jnp.broadcast_to(end, lo.shape)
    q = jnp.broadcast_to(queries, lo.shape)

    def body(_, lh):
        lo, hi = lh
        active = lo < hi
        mid = (lo + hi) >> 1
        v = g.cols[jnp.clip(mid, 0, max(E - 1, 0))]
        go_right = active & (v < q)
        return jnp.where(go_right, mid + 1, lo), jnp.where(active & (v >= q), mid, hi)

    lo, _ = jax.lax.fori_loop(0, n_iters, body, (lo, hi))
    found = (lo < end) & (g.cols[jnp.clip(lo, 0, max(E - 1, 0))] == q)
    return found


# Knuth multiplicative hash (matches csr.HASH_MULT). MUST stay a host scalar
# (np.uint32), never jnp.uint32: a module-level jnp scalar is a device array that
# jitted code captures as a closure constant, which some PJRT transports re-upload
# on every execution — measured at +1.5-10ms per op touching it on a tunneled TPU,
# and it degrades the whole client session afterwards.
HASH_MULT = np.uint32(2654435761)
HASH_PROBES = 4                      # matches csr.HASH_MAX_PROBES (build-time guarantee)


def in_row_hash(g: DeviceGraph, rows: jax.Array, queries: jax.Array) -> jax.Array:
    """Exact membership test. rows/queries broadcast together.

    Packed graphs use the bucketized tables (a key's ONLY possible home is one
    aligned 4-slot bucket row -> 1 row gather + compare); unpacked graphs fall
    back to HASH_PROBES open-addressing slot reads."""
    h = (queries.astype(jnp.uint32) * HASH_MULT).astype(jnp.int32)
    if g.hash_meta is not None and g.hash_buckets is not None:
        hm = g.hash_meta[rows]
        win = g.hash_buckets[hm[..., 0] + (h & hm[..., 1])]   # [..., 4]
        return jnp.any(win == queries[..., None], axis=-1)
    base = g.hash_offsets[rows]
    mask = g.hash_mask[rows]
    found = None
    for i in range(HASH_PROBES):
        slot = (h + i) & mask
        val = g.hash_table[base + slot]
        hit = val == queries
        found = hit if found is None else (found | hit)
    return found


def _bias(g: DeviceGraph, dst, prev_row, prev_id, p: float, q: float, dtype):
    """node2vec bias f(dst) with the reference's precedence: dst==prev -> 1/p, else
    membership in N(prev) -> 1, else 1/q (RandomSample.scala:36-39).

    prev_row indexes the adjacency (a LOCAL row index on a graph shard); prev_id is
    the vertex id dst values are compared against (GLOBAL dense id). On a single-chip
    whole graph they coincide.
    """
    is_prev = dst == prev_id
    member = in_row_hash(g, prev_row, dst)
    one = jnp.asarray(1.0, dtype)
    return jnp.where(is_prev, one / p, jnp.where(member, one, one / q))


def gather_padded_row(g: DeviceGraph, rows: jax.Array, max_degree: int):
    """Gather rows padded to max_degree: (dsts i32[W,MD], w f32[W,MD], valid bool[W,MD])."""
    E = g.num_edges
    s = g.offsets[rows]
    deg = g.offsets[rows + 1] - s
    pos = jnp.arange(max_degree, dtype=jnp.int32)
    idx = s[:, None] + pos[None, :]
    valid = pos[None, :] < deg[:, None]
    idxc = jnp.clip(idx, 0, max(E - 1, 0))
    return g.cols[idxc], g.weights[idxc], valid


def _cdf_pick(b: jax.Array, valid: jax.Array, u: jax.Array) -> jax.Array:
    """First index with cumulative normalized weight >= u; 0 (row head) if none —
    the reference's `edges.head` fallback (RandomSample.scala:24)."""
    b = jnp.where(valid, b, 0)
    total = jnp.sum(b, axis=-1, keepdims=True)
    c = jnp.cumsum(b / jnp.where(total > 0, total, 1), axis=-1)
    ge = (c >= u[:, None]) & valid
    return jnp.argmax(ge, axis=-1).astype(jnp.int32)


def cdf_sample_first_order(g: DeviceGraph, cur: jax.Array, u: jax.Array,
                           max_degree: int, dtype=jnp.float32) -> jax.Array:
    """Weight-proportional draw (reference RandomSample.sample). Returns dst per walker;
    garbage where deg(cur)==0 (caller masks)."""
    dsts, w, valid = gather_padded_row(g, cur, max_degree)
    j = _cdf_pick(w.astype(dtype), valid, u.astype(dtype))
    return jnp.take_along_axis(dsts, j[:, None], axis=1)[:, 0]


def cdf_sample_second_order(g: DeviceGraph, cur_row: jax.Array, prev_row: jax.Array,
                            prev_id: jax.Array, u: jax.Array, p: float, q: float,
                            max_degree: int, n_iters: int = 0, dtype=jnp.float32) -> jax.Array:
    """Exact biased inverse-CDF draw (reference RandomSample.secondOrderSample).
    cur_row/prev_row index rows of g (local on a shard); prev_id is the vertex id.
    (n_iters is retained for signature stability; membership now uses hash probes.)"""
    dsts, w, valid = gather_padded_row(g, cur_row, max_degree)
    f = _bias(g, dsts, prev_row[:, None], prev_id[:, None], p, q, dtype)
    j = _cdf_pick(w.astype(dtype) * f, valid, u.astype(dtype))
    return jnp.take_along_axis(dsts, j[:, None], axis=1)[:, 0]


def _chunk_scan(g: DeviceGraph, rows: jax.Array, deg: jax.Array, chunk: int,
                body_fn, init):
    """Run body_fn over each row in contiguous `chunk`-wide slices.

    body_fn(carry, idx_in_row i32[W,C], dsts i32[W,C], w f32[W,C],
            valid bool[W,C]) -> carry; iterates while any row has unread
    entries (bounded by ceil(max_deg_in_batch / chunk) — a traced value, so
    batches of short rows stop early regardless of the graph's max degree).
    Memory is O(W * chunk) instead of the padded path's O(W * max_degree):
    the exact-CDF fallback for extreme p/q stays feasible on power-law graphs
    (round-2 verdict item 5; reference semantics RandomSample.scala:12-44).
    """
    E = g.num_edges
    s = g.offsets[rows]
    pos = jnp.arange(chunk, dtype=jnp.int32)
    max_deg = jnp.max(deg)

    def cond(c):
        j, _ = c
        return j * chunk < max_deg

    def body(c):
        j, carry = c
        base = j * chunk
        idx = base + pos[None, :]
        valid = idx < deg[:, None]
        gidx = jnp.clip(s[:, None] + idx, 0, max(E - 1, 0))
        carry = body_fn(carry, idx, g.cols[gidx], g.weights[gidx], valid)
        return j + jnp.int32(1), carry

    _, carry = jax.lax.while_loop(cond, body, (jnp.int32(0), init))
    return carry


def cdf_sample_second_order_chunked(
        g: DeviceGraph, cur_row: jax.Array, prev_row: jax.Array,
        prev_id: jax.Array, u: jax.Array, p: float, q: float,
        chunk: int, dtype=jnp.float32) -> jax.Array:
    """Exact biased inverse-CDF draw with O(W * chunk) memory.

    Distribution-identical to cdf_sample_second_order (the reference scan order
    and head fallback, RandomSample.scala:12-44) but streams each row through
    fixed `chunk`-wide slices: pass 1 accumulates the total biased weight, pass
    2 finds the first index whose running cumulative reaches u * total (the
    unnormalized form of the reference's normalized-cumsum >= u test). The
    padded path materializes [W, max_degree] bias rows — an OOM at LiveJournal
    degrees; this is the production extreme-p/q fallback (plan_sampler ratio >
    32) for power-law graphs."""
    deg = (g.offsets[cur_row + 1] - g.offsets[cur_row]).astype(jnp.int32)
    prev_row_b = prev_row[:, None]
    prev_id_b = prev_id[:, None]

    def bias(dsts):
        return _bias(g, dsts, prev_row_b, prev_id_b, p, q, dtype)

    def acc_total(total, idx, dsts, w, valid):
        b = jnp.where(valid, w.astype(dtype) * bias(dsts), 0)
        return total + jnp.sum(b, axis=1)

    # carry inits derive from cur_row so they keep the same varying-manual-axes
    # type as the loop outputs under shard_map (cf. rejection_sample.dead_dst)
    zerof = (cur_row * 0).astype(dtype)
    total = _chunk_scan(g, cur_row, deg, chunk, acc_total, zerof)
    thresh = u.astype(dtype) * total

    def find(carry, idx, dsts, w, valid):
        cum, found = carry
        b = jnp.where(valid, w.astype(dtype) * bias(dsts), 0)
        c = cum[:, None] + jnp.cumsum(b, axis=1)
        hit = (c >= thresh[:, None]) & valid & (found < 0)[:, None]
        any_hit = jnp.any(hit, axis=1)
        first = jnp.argmax(hit, axis=1)
        pick = jnp.take_along_axis(dsts, first[:, None], axis=1)[:, 0]
        found = jnp.where((found < 0) & any_hit, pick, found)
        return c[:, -1], found

    _, found = _chunk_scan(g, cur_row, deg, chunk, find,
                           (zerof, cur_row * 0 - 1))
    # head fallback (reference RandomSample.scala:24): u beyond the final
    # cumulative (fp underflow / zero rows) -> first neighbor
    E = g.num_edges
    head = g.cols[jnp.clip(g.offsets[cur_row], 0, max(E - 1, 0))]
    return jnp.where(found >= 0, found, head)


def cdf_sample_first_order_chunked(g: DeviceGraph, rows: jax.Array,
                                   u: jax.Array, chunk: int,
                                   dtype=jnp.float32) -> jax.Array:
    """First-order (weight-proportional) chunked inverse-CDF draw — the
    streaming form of cdf_sample_first_order (RandomSample.scala:12-25)."""
    deg = (g.offsets[rows + 1] - g.offsets[rows]).astype(jnp.int32)

    def acc_total(total, idx, dsts, w, valid):
        return total + jnp.sum(jnp.where(valid, w.astype(dtype), 0), axis=1)

    zerof = (rows * 0).astype(dtype)  # varying-safe zero (see second-order)
    total = _chunk_scan(g, rows, deg, chunk, acc_total, zerof)
    thresh = u.astype(dtype) * total

    def find(carry, idx, dsts, w, valid):
        cum, found = carry
        b = jnp.where(valid, w.astype(dtype), 0)
        c = cum[:, None] + jnp.cumsum(b, axis=1)
        hit = (c >= thresh[:, None]) & valid & (found < 0)[:, None]
        any_hit = jnp.any(hit, axis=1)
        first = jnp.argmax(hit, axis=1)
        pick = jnp.take_along_axis(dsts, first[:, None], axis=1)[:, 0]
        found = jnp.where((found < 0) & any_hit, pick, found)
        return c[:, -1], found

    _, found = _chunk_scan(g, rows, deg, chunk, find,
                           (zerof, rows * 0 - 1))
    E = g.num_edges
    head = g.cols[jnp.clip(g.offsets[rows], 0, max(E - 1, 0))]
    return jnp.where(found >= 0, found, head)


def alias_draw(g: DeviceGraph, rows: jax.Array, u_pos: jax.Array,
               u_keep: jax.Array, meta=None) -> jax.Array:
    """O(1) draw of a neighbor of each row, ∝ edge weight, via Vose alias tables.

    With packed tables: row_meta + one 16-byte alias4 gather (2 random
    transactions); unpacked fallback: 5 transactions. meta = (row start, degree)
    already gathered by the caller skips the row_meta gather.
    Bitwise-identical results on every path."""
    E = g.num_edges
    if meta is not None and g.alias_packed is not None:
        s, deg = meta
        j = jnp.minimum((u_pos * deg.astype(u_pos.dtype)).astype(jnp.int32),
                        jnp.maximum(deg - 1, 0))
        apk = g.alias_packed[jnp.clip(s + j, 0, max(E - 1, 0))]
        aprob = jax.lax.bitcast_convert_type(apk[:, 0], jnp.float32)
        return jnp.where(u_keep < aprob, apk[:, 1], apk[:, 2])
    if g.alias_packed is not None and g.row_meta is not None:
        rm = g.row_meta[rows]
        s, deg = rm[:, 0], rm[:, 1]
        j = jnp.minimum((u_pos * deg.astype(u_pos.dtype)).astype(jnp.int32),
                        jnp.maximum(deg - 1, 0))
        apk = g.alias_packed[jnp.clip(s + j, 0, max(E - 1, 0))]
        aprob = jax.lax.bitcast_convert_type(apk[:, 0], jnp.float32)
        return jnp.where(u_keep < aprob, apk[:, 1], apk[:, 2])
    s = g.offsets[rows]
    deg = g.offsets[rows + 1] - s
    j = jnp.minimum((u_pos * deg.astype(u_pos.dtype)).astype(jnp.int32),
                    jnp.maximum(deg - 1, 0))
    k = jnp.clip(s + j, 0, max(E - 1, 0))
    pos = jnp.where(u_keep < g.alias_prob[k], j, g.alias_pos[k])
    return g.cols[jnp.clip(s + pos, 0, max(E - 1, 0))]


DRAW_QUANTUM = 8192


def draw_width(n: int) -> int:
    """Stream width for rejection-sampler uniforms: the strictly-greater multiple
    of DRAW_QUANTUM. Every engine draws trial uniforms at shape (3, draw_width(W))
    for the SAME W (the unpadded start count), so single-chip, batched, and
    sharded layouts consume bitwise-identical streams without any reliance on the
    PRNG's counter layout — which in turn allows swapping the threefry impl for
    the much faster XLA RngBitGenerator ('rbg') keys. The strict inequality
    guarantees draw_width(W) > W, so any lane index >= draw_width(W) can only
    belong to shard PADDING (start -1, result masked); when a shard layout's
    padded width ceil(W/S)*S exceeds draw_width(W) (S does not divide
    DRAW_QUANTUM), `_pad_lanes` extends the stream with zeros for exactly those
    never-consumed lanes instead of silently clamping (round-2 advisor fix)."""
    return (n // DRAW_QUANTUM + 1) * DRAW_QUANTUM


def _pad_lanes(u: jax.Array, n: int) -> jax.Array:
    """Slice-or-pad the trailing (lane) axis to exactly n.

    Padded lanes (index >= draw_width(n_stream) > n_stream) map to shard-padding
    walkers only — their start is -1 and every result is masked — so zero-filling
    them preserves the cross-layout bitwise guarantee for all real walkers while
    keeping gid-aligned segment layouts (a silent clamp would misalign the
    distributed engine's u[gid] gathers)."""
    Wd = u.shape[-1]
    if n <= Wd:
        return u[..., :n]
    pad = [(0, 0)] * (u.ndim - 1) + [(0, n - Wd)]
    return jnp.pad(u, pad)


def make_key(seed: int, impl: str = "threefry") -> jax.Array:
    """Walk-engine PRNG key. 'threefry' = the default counter-based stream
    (reproducible across platforms). 'rbg' = XLA RngBitGenerator draws with
    threefry key derivation — ~an order of magnitude cheaper array draws on TPU
    (the walk engine is PRNG-compute-bound); deterministic for a fixed
    platform+version, and identical across engines/layouts either way."""
    if impl in ("threefry", "threefry2x32", None, ""):
        return jax.random.PRNGKey(seed)
    return jax.random.key(seed, impl=impl)


def round_uniforms(step_key: jax.Array, n: int, n_stream: int | None = None):
    """Per-trial uniforms for the rejection sampler.

    Returns draw(j) -> (u_pos, u_keep, u_acc), each 1-D [n]: one fused
    (3, draw_width) array draw per trial j (single fold_in + single generator
    call — the walk engine is bound by PRNG compute, so fewer/larger draws
    matter), sliced to the first n lanes. n_stream (default n) is the UNPADDED
    walker count the stream width is derived from; engines whose batch is padded
    (sharded W_pad) must pass the unpadded count so all layouts share one width.
    """
    Wd = draw_width(n_stream if n_stream is not None else n)

    def draw(j):
        # dtype pinned f32: rejection streams are platform-invariant (an
        # x64-enabled host would otherwise draw f64 and diverge from TPU) and
        # exactly reproducible per-element by ops/prng.uniform3_at
        u = _pad_lanes(
            jax.random.uniform(jax.random.fold_in(step_key, j), (3, Wd),
                               dtype=jnp.float32), n)
        return u[0], u[1], u[2]
    return draw


def round_uniforms_batched(step_keys: jax.Array, n: int,
                           n_stream: int | None = None):
    """Batched-rounds variant of round_uniforms: step_keys is a stacked [R, ...]
    key array (one per walk round); draw(j) returns three 1-D [R*n] arrays whose
    segment r*n:(r+1)*n is bitwise identical to round_uniforms(step_keys[r], n,
    n_stream)(j) — so a corpus generated R-rounds-at-a-time matches R separate
    single-round calls exactly, and a sharded engine gathering by global walker
    id (round r, lane w -> index r*n + w) reads the same values.
    """
    Wd = draw_width(n_stream if n_stream is not None else n)

    def draw(j):
        u = jax.vmap(
            lambda k: jax.random.uniform(jax.random.fold_in(k, j), (3, Wd),
                                         dtype=jnp.float32)
        )(step_keys)                              # [R, 3, Wd]
        u = _pad_lanes(u, n).transpose(1, 0, 2)   # [3, R, n] (slice/pad, no gather)
        return tuple(u[i].reshape(-1) for i in range(3))
    return draw


def tail_uniforms_batched(step_keys: jax.Array, n: int):
    """Per-walker-keyed uniforms for TAIL trials (trial index >= DENSE_TRIALS).

    The triple for the walker at global batch position idx (round r = idx // n,
    in-round lane w = idx % n) at trial j is
    uniform(fold_in(fold_in(step_keys[r], j), w), (3,)) — a function of (round
    key, trial, lane) ONLY. Any execution of that trial (dense small-batch
    finish, full-width overflow drain, compacted straggler tail, or a sharded
    engine serving the walker remotely) therefore reads identical values while
    paying PRNG compute only for the lanes it actually serves. This is the
    straggler-tail lever: the old scheme drew a full (3, draw_width) stream per
    tail round to feed a width/TAIL_FRAC sub-batch.

    n is the engine's PADDED per-round lane count; real walkers sit at lanes
    [0, n_stream) in every layout, so (r, w) — and hence the stream — is
    layout-independent for them.

    THREEFRY KEYS ONLY: threefry is vmap-stable (a vmapped per-lane draw equals
    the individually-applied draw), which is what makes these values independent
    of the serving batch's shape. The 'rbg' impl is not — engines must fall back
    to the legacy full-width tail stream there (see use_tail_draws)."""
    def draw(j, idx):
        kj = jax.vmap(lambda k: jax.random.fold_in(k, j))(step_keys)  # [R]
        r = idx // n
        w = idx % n
        u = jax.vmap(
            lambda k, wi: jax.random.uniform(jax.random.fold_in(k, wi), (3,),
                                             dtype=jnp.float32)
        )(kj[r], w)
        return u[:, 0], u[:, 1], u[:, 2]
    return draw


def use_tail_draws(rng_impl: str) -> bool:
    """Whether tail_uniforms_batched streams are usable: requires a vmap-stable
    PRNG (threefry). 'rbg' draws change with the vmapped batch shape, which
    would break the cross-layout bitwise guarantee — those engines keep the
    full-width legacy tail stream instead."""
    return rng_impl in ("threefry", "threefry2x32", "", None)


DENSE_TRIALS = 2      # full-width trials before straggler compaction
TAIL_K = 2            # trials per compacted tail round
TAIL_FRAC = 16        # tail buffer = walkers / TAIL_FRAC (floor 256)

# Static-cascade schedule (rejection_sample_static): compaction levels as
# (width divisor, trials); the LAST level's trial count is ignored — it runs
# whatever remains of the max_rounds*k_candidates budget. Widths scale with
# the batch (W // divisor, floored) because straggler counts do: survivors of
# the dense phase are acceptance-BIASED (walkers in member-heavy
# neighborhoods persist at ~min-class rates, not iid), so each level keeps a
# ~4x margin over the rates measured on power-law graphs at p=q=0.25
# (2.7% after the dense phase, ~0.5% after +4 trials, ~0.02% after +14).
# Overflow is counted, not lost: callers re-dispatch on the dynamic schedule.
STATIC_LEVELS = ((16, 4), (128, 10), (1024, 0))
STATIC_S_FLOOR = 256  # per-level width floor (tests shrink it to force overflow)


def _make_trial(g: DeviceGraph, p: float, q: float, max_f: float,
                packed: bool):
    """Build the one-trial closure shared by both rejection samplers.

    trial(u3, rs, rd, hb, hm, pi) -> (candidate, accept), vectorized over ANY
    leading shape — the static cascade evaluates a whole [T, s] block of trials
    in one call (independent draws, so parallel evaluation + lowest-accepting-
    trial selection is exactly the sequential first-accept-wins result).
    A walker's (cand, accept) depends only on its own uniform values — never on
    batch width or position — so any schedule execution yields identical
    results (the cross-layout bitwise guarantee).
    """
    E = g.num_edges

    def membership(cand, hb, hm):
        """cand in N(prev): one ALIGNED bucket-row gather + 4 compares (packed;
        a key's only possible home is bucket h & hm of its row), else
        HASH_PROBES separate open-addressing gathers (unpacked fallback)."""
        h = (cand.astype(jnp.uint32) * HASH_MULT).astype(jnp.int32)
        if packed:
            win = g.hash_buckets[hb + (h & hm)]   # [..., BUCKET_SLOTS]
            return jnp.any(win == cand[..., None], axis=-1)
        member = None
        for i in range(HASH_PROBES):
            hit = g.hash_table[hb + ((h + i) & hm)] == cand
            member = hit if member is None else (member | hit)
        return member

    def trial(u3, rs, rd, hb, hm, pi):
        """One trial for a (sub)batch with uniforms u3 = (u_pos, u_keep,
        u_acc), row starts rs, degrees rd, hash meta (hb, hm), prev ids pi."""
        u_pos, u_keep, u_acc = u3
        jpos = jnp.minimum((u_pos * rd.astype(u_pos.dtype)).astype(jnp.int32),
                           jnp.maximum(rd - 1, 0))
        k = jnp.clip(rs + jpos, 0, max(E - 1, 0))
        if packed:
            apk = g.alias_packed[k]
            aprob = jax.lax.bitcast_convert_type(apk[..., 0], jnp.float32)
            cand = jnp.where(u_keep < aprob, apk[..., 1], apk[..., 2])
        else:
            pos = jnp.where(u_keep < g.alias_prob[k], jpos, g.alias_pos[k])
            cand = g.cols[jnp.clip(rs + pos, 0, max(E - 1, 0))]
        one = jnp.float32(1.0)
        if q == 1.0:
            # member and non-member classes are both 1 — no membership probe
            f = jnp.where(cand == pi, one / p, one)
        else:
            member = membership(cand, hb, hm)
            f = jnp.where(cand == pi, one / p,
                          jnp.where(member, one, one / q))
        return cand, u_acc * max_f < f

    return trial


def _row_meta_for(g: DeviceGraph, cur_row, prev_row, packed: bool, meta):
    """(row start, degree, hash base, hash mask) per walker; `meta` precomputed
    by the caller (the vmeta carry) skips the gathers."""
    if meta is not None:
        return meta
    if packed:
        rm = g.row_meta[cur_row]
        hmeta = g.hash_meta[prev_row]
        return rm[:, 0], rm[:, 1], hmeta[:, 0], hmeta[:, 1]
    row_start = g.offsets[cur_row]
    row_deg = g.offsets[cur_row + 1] - row_start
    return row_start, row_deg, g.hash_offsets[prev_row], g.hash_mask[prev_row]


def rejection_sample_static(g: DeviceGraph, cur_row: jax.Array,
                            prev_row: jax.Array, prev_id: jax.Array,
                            alive: jax.Array, draw_uniforms, p: float,
                            q: float, n_iters: int = 0, max_rounds: int = 16,
                            gather=None, k_candidates: int = 4,
                            tail_draw=None, tail_idx=None, meta=None
                            ) -> tuple[jax.Array, jax.Array]:
    """Second-order draw with the SAME trial schedule as `rejection_sample`
    but a CONTROL-FLOW-FREE execution plan. Returns (dst, overflow i32 scalar).

    Motivation (measured on v5e, round 5): a `lax.while_loop` inside the walk
    scan costs milliseconds per step even when it iterates ZERO times — the
    dynamic sampler's overflow-drain + tail loops were 4x the cost of the
    gather-bound dense trials themselves. This plan replaces them with a static
    cascade:

      phase 1: DENSE_TRIALS trials at full width (identical to the dynamic
        sampler's dense phase);
      tail: a cascade of STATIC_LEVELS compaction levels. Each level's
        stragglers compact (one `nonzero` over the PREVIOUS level's buffer —
        only level 1 scans the full batch) into a width-scaled buffer, and
        that level's trials are evaluated as ONE batched [T, s] block —
        independent draws, so the lowest accepting trial index IS the
        sequential first-accept result; the last level runs whatever remains
        of the trial budget.

    Exactness: every walker that gets a compaction slot executes its full
    max_rounds*k_candidates trial budget, consuming the SAME per-(trial,
    walker) uniforms as the dynamic schedule — bitwise-identical corpora
    (asserted by tests/test_sampling.py::test_static_matches_dynamic).
    Walkers that do NOT fit a buffer (overflow — requires straggler rates far
    above anything the planned bias regimes produce; capacities are 4-20x the
    measured rates) keep their last candidate and are COUNTED in the returned
    overflow scalar: callers re-dispatch the whole corpus on the dynamic
    engine when it is nonzero (engine.random_walks), so full-budget schedule
    semantics are preserved end to end in every regime.
    """
    max_f = max(1.0 / p, 1.0, 1.0 / q)
    max_trials = max_rounds * k_candidates
    dead_dst = cur_row * 0
    W = cur_row.shape[0]
    pick = gather if gather is not None else (lambda u: u)
    packed = g.row_meta is not None
    zero = jnp.int32(0)

    row_start, row_deg, hash_base, hash_mask = _row_meta_for(
        g, cur_row, prev_row, packed, meta)
    trial = _make_trial(g, p, q, max_f, packed)

    def dense_u(j):
        return tuple(pick(u) for u in draw_uniforms(j))

    if p == 1.0 and q == 1.0:
        # bias ≡ 1 ⇒ trial 0 always accepts (see rejection_sample)
        cand, _ = trial(dense_u(0), row_start, row_deg, hash_base, hash_mask,
                        prev_id)
        return cand, zero

    def fold(state, cand, acc):
        """First-accept-wins bookkeeping for one full-width trial."""
        accepted, dst, cand_last = state
        take = acc & ~accepted
        dst = jnp.where(take, cand, dst)
        cand_last = jnp.where(~accepted & ~acc, cand, cand_last)
        return accepted | acc, dst, cand_last

    if tail_idx is None:
        tail_idx = jnp.arange(W, dtype=jnp.int32)

    nd = min(DENSE_TRIALS, max_trials)
    state = (~alive, dead_dst, dead_dst)
    for j in range(nd):
        state = fold(state, *trial(dense_u(j), row_start, row_deg, hash_base,
                                   hash_mask, prev_id))
    accepted, dst, cand_last = state
    if max_trials <= nd:
        return jnp.where(accepted, dst, cand_last), zero

    def block_u(j, ti, sel):
        """Uniforms for trial j of a compacted block at global positions ti
        (sel is the legacy full-stream fallback selector, cf. tail_u)."""
        if tail_draw is not None:
            return tail_draw(j, ti)
        return tuple(sel(u) for u in draw_uniforms(j))

    def par_trials(j0, T, pre_done, cl, rs, rd, hb, hm, pi, ti, sel):
        """Trials j0..j0+T-1 for one compacted block as ONE [T, s] batch.
        pre_done marks padding lanes (their cl value passes through);
        returns (done, final) where never-accepting lanes take the LAST
        trial's candidate — exactly the sequential schedule's cand_last."""
        us = [block_u(j0 + j, ti, sel) for j in range(T)]
        u3 = tuple(jnp.stack([u[i] for u in us]) for i in range(3))  # [T, s]
        pib = pi[None] if getattr(pi, "ndim", 0) else pi
        cand, acc = trial(u3, rs[None], rd[None], hb[None], hm[None], pib)
        acc = acc & ~pre_done[None]
        hit = jnp.any(acc, axis=0)
        firstj = jnp.argmax(acc, axis=0)
        chosen = jnp.take_along_axis(cand, firstj[None], axis=0)[0]
        final = jnp.where(pre_done, cl, jnp.where(hit, chosen, cand[-1]))
        return pre_done | hit, final

    # tail: level cascade. Each level compacts the PREVIOUS level's
    # stragglers (so only the level-1 `nonzero` scans the full batch) and
    # runs its trials as one parallel block; parent results are patched on
    # the way back out.
    strag = alive & ~accepted
    n_str = jnp.sum(strag, dtype=jnp.int32)
    s1 = min(W, max(STATIC_S_FLOOR, W // STATIC_LEVELS[0][0]))
    ci = jnp.nonzero(strag, size=s1, fill_value=W)[0]
    overflow = jnp.maximum(n_str - s1, 0)
    vc = ci < W
    cic = jnp.minimum(ci, W - 1).astype(jnp.int32)
    blk = dict(
        pre_done=~vc, cl=cand_last[cic], rs=row_start[cic], rd=row_deg[cic],
        hb=hash_base[cic], hm=hash_mask[cic],
        pi=prev_id[cic] if getattr(prev_id, "ndim", 0) else prev_id,
        ti=tail_idx[cic], orig=cic, width=s1)

    assert all(t > 0 for _, t in STATIC_LEVELS[:-1]), \
        "non-final STATIC_LEVELS need a positive trial count"
    j = nd
    parents = []   # (parent fin, child slot, child valid, parent width)
    fin = cand_last[cic]   # in case the budget is exhausted before any level
    for li, (frac, t_lvl) in enumerate(STATIC_LEVELS):
        last = li == len(STATIC_LEVELS) - 1
        t = max_trials - j if last else min(t_lvl, max_trials - j)
        if t <= 0:
            break
        sel = (lambda orig: lambda u: pick(u)[orig])(blk["orig"])
        done, fin = par_trials(j, t, blk["pre_done"], blk["cl"], blk["rs"],
                               blk["rd"], blk["hb"], blk["hm"], blk["pi"],
                               blk["ti"], sel)
        j += t
        if last or j >= max_trials:
            break
        # descend: compact this block's stragglers into the next level
        sw = blk["width"]
        s_next = min(sw, max(STATIC_S_FLOOR, W // STATIC_LEVELS[li + 1][0]))
        n_next = jnp.sum(~done, dtype=jnp.int32)
        ci_n = jnp.nonzero(~done, size=s_next, fill_value=sw)[0]
        overflow = overflow + jnp.maximum(n_next - s_next, 0)
        v_n = ci_n < sw
        cic_n = jnp.minimum(ci_n, sw - 1).astype(jnp.int32)
        parents.append((fin, ci_n, v_n, sw))
        blk = dict(
            pre_done=~v_n, cl=fin[cic_n], rs=blk["rs"][cic_n],
            rd=blk["rd"][cic_n], hb=blk["hb"][cic_n], hm=blk["hm"][cic_n],
            pi=(blk["pi"][cic_n] if getattr(blk["pi"], "ndim", 0)
                else blk["pi"]),
            ti=blk["ti"][cic_n], orig=blk["orig"][cic_n], width=s_next)

    # unwind: patch each level's results into its parent block
    for pfin, ci_n, v_n, sw in reversed(parents):
        slot = jnp.where(v_n, jnp.minimum(ci_n, sw - 1), sw)
        fin = pfin.at[slot].set(fin, mode="drop")

    dst = dst.at[ci].set(fin, mode="drop")
    accepted = accepted.at[ci].set(True, mode="drop")
    return jnp.where(accepted, dst, cand_last), overflow


def rejection_sample(g: DeviceGraph, cur_row: jax.Array, prev_row: jax.Array,
                     prev_id: jax.Array, alive: jax.Array,
                     draw_uniforms, p: float, q: float, n_iters: int = 0,
                     max_rounds: int = 16, gather=None, k_candidates: int = 4,
                     tail_draw=None, tail_idx=None, meta=None) -> jax.Array:
    """Second-order draw by alias candidate + bias acceptance, with straggler
    compaction.

    Exact node2vec distribution: candidate ∝ w, accept with prob f/max_f, so accepted
    ∝ w·f — the distribution the reference materializes explicitly
    (RandomSample.scala:27-44).

    Trial schedule (the key TPU cost shape): a walker's result depends ONLY on its
    per-walker uniform stream and the trial index at which it first accepts, so the
    schedule can be executed at any width without changing results. Walk steps are
    gather-rate-bound (measured ~1.5e8 random-gathered elems/s on v5e) and low-
    acceptance stragglers (bias-class f/max_f as low as min_f/max_f) would hold
    every lane hostage for tens of full-width rounds. So:
      phase 1: DENSE_TRIALS trials at full width (clears the typical >95%);
      phase 2: still-unaccepted walkers are compacted into a width/TAIL_FRAC
        buffer (overflow: extra dense rounds first — rare, exactness preserved)
        and finish their schedule at narrow width, TAIL_K trials per round.
    Walkers not accepted after max_rounds*k_candidates total trials keep their
    last candidate (probability (1-min_accept)^budget, negligible for p,q in
    [1/4, 4]; plan_sampler switches to the exact CDF beyond ratio 32).

    Structural fast paths (bitwise-identical where they overlap the general
    schedule): p==q==1 makes the bias ≡ 1, so trial 0 always accepts — one alias
    gather per step, no membership probes, no loops; q==1 makes the member and
    non-member bias classes equal, so the membership probe is skipped entirely.

    Uniform sources: draw_uniforms(j) yields the j-th full-width uniform triple
    (see round_uniforms) used for the DENSE_TRIALS dense trials; `gather` maps
    each drawn 1-D array onto the walker batch (distributed shards pass a
    gid-gather so every walker consumes the same stream regardless of which
    shard samples it). Tail trials (j >= DENSE_TRIALS) use tail_draw(j, idx)
    (see tail_uniforms_batched) with per-walker positions tail_idx, so a tail
    round pays PRNG compute only for the lanes it serves; when tail_draw is None
    the dense stream + gather serves all trials (legacy/test path). n_iters
    retained for signature stability; k_candidates scales the trial budget.
    """
    max_f = max(1.0 / p, 1.0, 1.0 / q)
    max_trials = max_rounds * k_candidates
    # derive from cur_row (not a fresh constant) so the carry keeps the same
    # varying-manual-axes type as the loop outputs under shard_map
    dead_dst = cur_row * 0
    W = cur_row.shape[0]
    pick = gather if gather is not None else (lambda u: u)
    packed = g.row_meta is not None

    # hoist per-walker row metadata out of the candidate loop: these gathers are
    # invariant across trials. The packed tables serve each pair with ONE 8-byte
    # slice gather instead of two; `meta` = (row_start, row_deg, hash_base,
    # hash_mask) precomputed by the caller (the vmeta carry) skips them entirely.
    row_start, row_deg, hash_base, hash_mask = _row_meta_for(
        g, cur_row, prev_row, packed, meta)
    trial = _make_trial(g, p, q, max_f, packed)

    def dense_u(j):
        return tuple(pick(u) for u in draw_uniforms(j))

    if p == 1.0 and q == 1.0:
        # bias ≡ 1 ⇒ f == max_f == 1 ⇒ trial 0 always accepts: emit its
        # candidate directly (bitwise identical to the full schedule, which
        # would take trial 0's candidate unconditionally).
        cand, _ = trial(dense_u(0), row_start, row_deg, hash_base, hash_mask,
                        prev_id)
        return cand

    def tail_u(j, idx, sel):
        """Uniforms for tail trial j of the sub-batch at global positions idx
        (sel is the legacy full-stream fallback selector)."""
        if tail_draw is not None:
            return tail_draw(j, idx)
        return tuple(sel(u) for u in draw_uniforms(j))

    def fold(state, cand, acc):
        """First-accept-wins bookkeeping for one trial."""
        accepted, dst, cand_last = state
        take = acc & ~accepted
        dst = jnp.where(take, cand, dst)
        cand_last = jnp.where(~accepted & ~acc, cand, cand_last)
        return accepted | acc, dst, cand_last

    if tail_idx is None:
        tail_idx = jnp.arange(W, dtype=jnp.int32)

    # phase 1: DENSE_TRIALS full-width trials (clears the typical bulk)
    state = (~alive, dead_dst, dead_dst)
    for j in range(min(DENSE_TRIALS, max_trials)):
        state = fold(state, *trial(dense_u(j), row_start, row_deg, hash_base,
                                   hash_mask, prev_id))
    accepted, dst, cand_last = state

    s = min(W, max(256, W // TAIL_FRAC))
    j0 = jnp.int32(min(DENSE_TRIALS, max_trials))

    if s >= W or max_trials <= DENSE_TRIALS:
        # small batch: finish densely (compaction buys nothing below ~256 lanes)
        def cond_d(c):
            (acc, _, _), j = c
            return (j < max_trials) & ~jnp.all(acc)

        def body_d(c):
            st, j = c
            for k in range(TAIL_K):
                st = fold(st, *trial(tail_u(j + k, tail_idx, pick), row_start,
                                     row_deg, hash_base, hash_mask, prev_id))
            return st, j + TAIL_K

        (accepted, dst, cand_last), _ = jax.lax.while_loop(
            cond_d, body_d, (state, j0))
        return jnp.where(accepted, dst, cand_last)

    # phase 2a: rare overflow drain — extra dense rounds until stragglers fit
    def cond_o(c):
        (acc, _, _), j = c
        return (j < max_trials) & \
            (jnp.sum(alive & ~acc, dtype=jnp.int32) > s)

    def body_o(c):
        st, j = c
        for k in range(TAIL_K):
            st = fold(st, *trial(tail_u(j + k, tail_idx, pick), row_start,
                                 row_deg, hash_base, hash_mask, prev_id))
        return st, j + TAIL_K

    (accepted, dst, cand_last), j_at = jax.lax.while_loop(
        cond_o, body_o, (state, j0))

    # phase 2b: compact stragglers to width s and finish their schedule there
    ci = jnp.nonzero(alive & ~accepted, size=s, fill_value=W)[0]
    valid_c = ci < W
    cic = jnp.minimum(ci, W - 1).astype(jnp.int32)
    rs_c, rd_c = row_start[cic], row_deg[cic]
    hb_c, hm_c = hash_base[cic], hash_mask[cic]
    pi_c = prev_id[cic] if getattr(prev_id, "ndim", 0) else prev_id
    ti_c = tail_idx[cic]
    sel_c = lambda u: pick(u)[cic]
    dead_c = cic * 0

    def cond_t(c):
        (acc, _, _), j = c
        return (j < max_trials) & ~jnp.all(acc)

    def body_t(c):
        st, j = c
        for k in range(TAIL_K):
            st = fold(st, *trial(tail_u(j + k, ti_c, sel_c), rs_c, rd_c,
                                 hb_c, hm_c, pi_c))
        return st, j + TAIL_K

    # Seed the compacted carry with the dense-phase cand_last so that a walker
    # whose trial budget is already exhausted (j_at == max_trials after the
    # overflow drain — the tail loop then never runs) falls back to its last
    # dense-phase candidate exactly as the dense schedule does, instead of a
    # bogus local row 0 (round-2 advisor fix).
    (acc_c, dst_c, cl_c), _ = jax.lax.while_loop(
        cond_t, body_t, ((~valid_c, dead_c, cand_last[cic]), j_at))

    final_c = jnp.where(acc_c, dst_c, cl_c)
    dst = dst.at[ci].set(final_c, mode="drop")
    accepted = accepted.at[ci].set(True, mode="drop")
    return jnp.where(accepted, dst, cand_last)
