"""Multi-chip walk engine: shard_map over a 1-D device mesh.

TPU-native replacement for the reference's BSP superstep machinery
(reference RandomWalk.scala:91-192): the per-superstep Spark shuffle of boundary
walkers becomes a fixed-capacity bucketed `lax.all_to_all` over ICI, the routing-table
RDD/zipPartitions placement trick becomes a replicated i32[V] vertex->shard array, and
driver-side convergence counting disappears entirely (dense lock-step stepping with
done-masks; SURVEY.md §2.3, §5.8).

Design: "remote sampling" — walker state never migrates. Each step every live walker
sends a tiny request (cur, prev, gid) to the shard that owns row(cur); that owner
samples the transition locally (halo replication makes the prev-membership test local,
see graph/partition.py) and the destination comes back through the inverse all-to-all.
Two collectives per step, payload O(walkers · 4 ints), instead of shipping whole paths
+ prevNeighbor lists around like the reference's walker transfer
(UniformRandomWalk.scala:103-112).

Determinism: every uniform is drawn from a counter-based stream indexed by GLOBAL
walker id (1-D draws, see ops.sampling.round_uniforms), so walks are bitwise identical
to the single-chip engine for any shard count — the distributed analog of the
reference's injectable-RNG test seam.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..graph.csr import CSRGraph
from ..graph.partition import ShardedGraphHost, partition_graph
from ..ops import sampling
from ..ops.sampling import DeviceGraph
from ..walk.engine import WalkSpec

AXIS = "shards"


def make_mesh(num_shards: int | None = None) -> Mesh:
    devs = jax.devices()
    n = num_shards or len(devs)
    return Mesh(np.array(devs[:n]), (AXIS,))


def _bucket_by_dest(dest, fields, S: int, C: int, fills):
    """Place per-walker fields into [S, C] send buffers keyed by destination shard.
    Returns buffers in field order. Bucket slot = rank among same-destination walkers
    (stable), so layouts are deterministic."""
    n = dest.shape[0]
    order = jnp.argsort(dest, stable=True)
    sd = dest[order]
    counts = jnp.zeros((S,), jnp.int32).at[dest].add(1)
    start = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]])
    rank = jnp.arange(n, dtype=jnp.int32) - start[sd]
    outs = []
    for field, fill in zip(fields, fills):
        buf = jnp.full((S, C), fill, field.dtype)
        outs.append(buf.at[sd, rank].set(field[order], mode="drop"))
    return outs


def _exchange_and_sample(
    g: DeviceGraph, glob2loc, route, cur, prev, alive, gids,
    step_key, spec: WalkSpec, W_total: int, S: int, first: bool,
):
    """One superstep: route requests to row owners, sample there, route replies back.
    Returns dst per local walker (-1 where dead-end / not alive)."""
    W_s = cur.shape[0]
    C = W_s  # worst-case capacity: every local walker to one shard
    my = jax.lax.axis_index(AXIS).astype(jnp.int32)
    dest = jnp.where(alive, route[cur], my)
    slots = jnp.arange(W_s, dtype=jnp.int32)
    s_cur, s_prev, s_gid, s_slot = _bucket_by_dest(
        dest, (cur, prev, gids, slots), S, C, (0, 0, -1, 0))
    s_sent = s_gid >= 0

    a2a = lambda x: jax.lax.all_to_all(x, AXIS, 0, 0, tiled=True)
    r_cur, r_prev, r_gid = a2a(s_cur), a2a(s_prev), a2a(s_gid)

    # ---- owner side: sample over the local CSR shard ----
    fcur = r_cur.reshape(-1)
    fprev = r_prev.reshape(-1)
    fgid = jnp.clip(r_gid.reshape(-1), 0, W_total - 1)
    valid = r_gid.reshape(-1) >= 0
    cur_row = jnp.maximum(glob2loc[fcur], 0)
    prev_row = jnp.maximum(glob2loc[fprev], 0)
    deg = (g.offsets[cur_row + 1] - g.offsets[cur_row]).astype(jnp.int32)
    can = valid & (deg > 0)
    gather = lambda u: u[fgid]
    if spec.sampler == "cdf":
        dt = jnp.dtype(spec.dtype)
        u = gather(jax.random.uniform(step_key, (W_total,), dtype=dt))
        if first:
            dst = sampling.cdf_sample_first_order(g, cur_row, u, spec.max_degree, dt)
        else:
            dst = sampling.cdf_sample_second_order(
                g, cur_row, prev_row, fprev, u, spec.p, spec.q,
                spec.max_degree, spec.n_search_iters, dt)
    else:
        draw = sampling.round_uniforms(step_key, W_total)
        if first:
            u_pos, u_keep, _ = (gather(u) for u in draw(0))
            dst = sampling.alias_draw(g, cur_row, u_pos, u_keep)
        else:
            dst = sampling.rejection_sample(
                g, cur_row, prev_row, fprev, can, draw, spec.p, spec.q,
                spec.n_search_iters, spec.max_rounds, gather=gather,
                k_candidates=spec.k_candidates)
    dst = jnp.where(can, dst, -1)

    # ---- reply: inverse all-to-all back into the sender's bucket layout ----
    back = a2a(dst.reshape(S, C))
    flat_slot = jnp.where(s_sent, s_slot, W_s).reshape(-1)  # W_s = dropped
    new_dst = jnp.full((W_s,), -1, jnp.int32).at[flat_slot].set(
        back.reshape(-1), mode="drop")
    return new_dst


@partial(jax.jit, static_argnames=("spec", "S", "mesh"))
def distributed_walk_once(arrays, route, starts_pad, key, spec: WalkSpec,
                          S: int, mesh: Mesh) -> jax.Array:
    """One walk per (padded) start vertex across S shards -> [W_pad, L+2] (-1 pad).
    `arrays` = stacked ShardedGraphHost arrays already as jnp; starts_pad length is a
    multiple of S; padded entries must carry start -1 (never sampled, all-(-1) rows)."""
    W_pad = starts_pad.shape[0]
    W_s = W_pad // S

    def shard_fn(offsets, cols, weights, aprob, apos, hoff, hmask, htab,
                 glob2loc, route, starts_s):
        g = DeviceGraph(offsets=offsets[0].astype(jnp.int32), cols=cols[0],
                        weights=weights[0], alias_prob=aprob[0], alias_pos=apos[0],
                        hash_offsets=hoff[0], hash_mask=hmask[0], hash_table=htab[0])
        g2l = glob2loc[0]
        my = jax.lax.axis_index(AXIS).astype(jnp.int32)
        starts_l = starts_s
        gids = my * W_s + jnp.arange(W_s, dtype=jnp.int32)
        real = starts_l >= 0
        start_rows = jnp.maximum(starts_l, 0)

        first = _exchange_and_sample(
            g, g2l, route, start_rows, start_rows, real, gids,
            jax.random.fold_in(key, 0), spec, W_pad, S, first=True)
        alive0 = real & (first >= 0)

        def body(carry, t):
            cur, prev, alive = carry
            dst = _exchange_and_sample(
                g, g2l, route, cur, prev, alive, gids,
                jax.random.fold_in(key, t), spec, W_pad, S, first=False)
            alive_next = alive & (dst >= 0)
            out = jnp.where(alive_next, dst, -1)
            new_cur = jnp.where(alive_next, dst, cur)
            new_prev = jnp.where(alive_next, cur, prev)
            return (new_cur, new_prev, alive_next), out

        cur0 = jnp.where(alive0, first, start_rows)
        (_, _, _), steps = jax.lax.scan(
            body, (cur0, start_rows, alive0),
            jnp.arange(1, spec.walk_length + 1))
        paths = jnp.concatenate(
            [jnp.where(real, starts_l, -1)[:, None],
             jnp.where(alive0, first, -1)[:, None],
             steps.T.astype(jnp.int32)], axis=1)
        return paths

    sharded = P(AXIS, *([None] * 1))
    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS, None), P(AXIS, None), P(AXIS, None),
                  P(AXIS, None), P(AXIS, None), P(AXIS, None), P(AXIS, None),
                  P(AXIS, None), P(None), P(AXIS)),
        out_specs=P(AXIS, None))
    return fn(*arrays, route, starts_pad)


def device_put_sharded_graph(hsg: ShardedGraphHost, mesh: Mesh):
    """Upload stacked shard arrays, sharded on the leading axis, route replicated."""
    shard = jax.sharding.NamedSharding(mesh, P(AXIS))
    repl = jax.sharding.NamedSharding(mesh, P(None))
    put = lambda x, dt, s: jax.device_put(jnp.asarray(x, dtype=dt), s)
    arrays = (
        put(hsg.offsets, jnp.int32, shard),
        put(hsg.cols, jnp.int32, shard),
        put(hsg.weights, jnp.float32, shard),
        put(hsg.alias_prob, jnp.float32, shard),
        put(hsg.alias_pos, jnp.int32, shard),
        put(hsg.hash_offsets, jnp.int32, shard),
        put(hsg.hash_mask, jnp.int32, shard),
        put(hsg.hash_table, jnp.int32, shard),
        put(hsg.glob2loc, jnp.int32, shard),
    )
    route = put(hsg.route, jnp.int32, repl)
    return arrays, route


def distributed_random_walks(
    graph: CSRGraph,
    walk_length: int,
    num_walks: int,
    p: float = 1.0,
    q: float = 1.0,
    seed: int = 0,
    sampler: str = "rejection",
    dtype: str = "float32",
    num_shards: int | None = None,
    route: np.ndarray | None = None,
    starts: np.ndarray | None = None,
) -> np.ndarray:
    """Sharded corpus generation mirroring engine.random_walks — bitwise identical
    results for any shard count (same counter-based streams)."""
    mesh = make_mesh(num_shards)
    S = mesh.devices.size
    hsg = partition_graph(graph, S, route)
    arrays, route_dev = device_put_sharded_graph(hsg, mesh)
    if starts is None:
        starts = np.arange(graph.num_vertices, dtype=np.int32)
    W = len(starts)
    W_pad = -(-W // S) * S
    starts_pad = np.full(W_pad, -1, dtype=np.int32)
    starts_pad[:W] = starts
    spec = WalkSpec(
        walk_length=walk_length, p=float(p), q=float(q), sampler=sampler,
        max_degree=max(graph.max_degree, 1),
        n_search_iters=sampling.search_iters(graph.max_degree),
        dtype=dtype,
    )
    starts_dev = jax.device_put(
        jnp.asarray(starts_pad), jax.sharding.NamedSharding(mesh, P(AXIS)))
    base = jax.random.PRNGKey(seed)
    # pre-fold round keys: eager fold_in between async dispatches stalls tunneled
    # PJRT transports (see ops/sampling.HASH_MULT note)
    keys = [jax.random.fold_in(base, r) for r in range(num_walks)]
    jax.block_until_ready(keys)
    rounds = []
    for r in range(num_walks):
        paths = distributed_walk_once(
            arrays, route_dev, starts_dev, keys[r], spec, S, mesh)
        rounds.append(np.asarray(paths)[:W])
    return np.concatenate(rounds, axis=0)
