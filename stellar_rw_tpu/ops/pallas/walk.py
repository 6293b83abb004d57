"""EXPERIMENTAL Pallas walk kernel: VMEM-resident tables, MXU one-hot fetch.

The production walk sampler (ops/sampling.rejection_sample) is measured AT the
chip's HBM random-access bound (~7e7 aligned row transactions/s, BASELINE.md
round-3 cost model). The only way past that bound on one chip is to stop
touching HBM per trial. Mosaic supports no per-lane vector gather (probed on
v5e: every jnp.take/take_along_axis form is rejected; only one-hot matmuls
land), so this kernel restructures the step around the MXU:

  * per vertex, ALL per-step data rides one padded f32 row:
    [degree | neighbor ids (MD) | alias partner ids (MD) | alias keep-prob (MD)];
  * per step, ONE one-hot matmul (W x V) @ (V x K) fetches the current
    vertices' full rows into registers — the only "gather" in the kernel;
  * every trial then runs on the fetched rows as pure VPU work: alias position
    select via an MD-wide one-hot mask, prev-membership as an MD-wide compare
    against the CARRIED previous row (no hash tables at all), p/q bias +
    acceptance elementwise. Ids stay exact through f32 (< 2^24).

Cost scales as O(V * (3*MD+1)) MXU flops per walker-step, so this is the
small-shard / degree-bounded regime (tables + one-hot tiles must also fit
VMEM) — exactly the "try a smaller shard" experiment from the round-2 verdict
(north star: "alias-table sampling in Pallas over CSR adjacency"). The XLA
engine remains the production path for everything else; bench extras record
the measured comparison.

Semantics: same second-order distribution as the XLA sampler (candidate ∝ w,
accept with bias/max_bias; reference RandomSample.scala:27-44), driven by the
TPU core PRNG — distribution-equivalent, NOT bitwise equal to the XLA engines
(validated against exact transition probabilities in tests/test_pallas.py;
interpret-mode tests feed external jax.random uniforms because the in-kernel
TPU PRNG has no CPU emulation).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _u01(bits):
    """random bits -> float32 uniform in [0, 1): keep the low 23 bits via a
    POSITIVE mask (the TPU PRNG hands back signed i32, and Mosaic supports
    neither u32->f32 casts nor logical shifts on it)."""
    return ((bits & jnp.int32(0x7FFFFF)).astype(jnp.float32)
            * np.float32(1.0 / (1 << 23)))


def _pad_to(x: int, m: int) -> int:
    return -(-x // m) * m


MAX_MD = 42  # 1 + 3*MD lanes must fit one 128-lane row


def build_row_tables(graph, max_degree: int | None = None) -> np.ndarray:
    """Host prep: ONE 128-lane f32 row per vertex — f32[V_pad, 128].

    Lane layout: [deg | cols(MD) | alias_cols(MD) | alias_prob(MD) | 0-pad].
    Everything a walk step needs rides a single one-hot matmul fetch; fields
    are read back with lane-index MASKS, never lane slices (Mosaic requires
    128-aligned slices). MD <= 42 so the three MD-wide fields + deg fit 128
    lanes — the prototype's degree bound. Padded neighbor slots carry id -1
    (never drawn: jpos < deg; never match a membership compare)."""
    graph.build_alias_tables()
    MD = int(max_degree or max(graph.max_degree, 1))
    assert graph.max_degree <= MD <= MAX_MD, (graph.max_degree, MD)
    V = graph.num_vertices
    deg = (graph.offsets[1:] - graph.offsets[:-1]).astype(np.int64)
    E = graph.num_edges
    pos = np.arange(MD)
    idx = graph.offsets[:-1, None] + pos[None, :]
    valid = pos[None, :] < deg[:, None]
    idxc = np.clip(idx, 0, max(E - 1, 0))
    cols_pad = np.where(valid, graph.cols[idxc], -1).astype(np.float32)
    acols_pad = np.where(
        valid,
        graph.cols[np.clip(graph.offsets[:-1, None] + graph.alias_pos[idxc],
                           0, max(E - 1, 0))],
        -1).astype(np.float32)
    aprob_pad = np.where(valid, graph.alias_prob[idxc], 1.0).astype(np.float32)
    V_pad = _pad_to(max(V, 8), 8)
    tab = np.zeros((V_pad, 128), np.float32)
    tab[:V, 0] = deg
    tab[:V, 1:1 + MD] = cols_pad
    tab[:V, 1 + MD:1 + 2 * MD] = acols_pad
    tab[:V, 1 + 2 * MD:1 + 3 * MD] = aprob_pad
    return tab


def _walk_kernel(par_ref, tab_ref, *rest, walk_length: int,
                 p: float, q: float, max_trials: int, md: int,
                 use_prng: bool, tile: int):
    # par_ref (SMEM): [seed, V_real, W_real] — the corpus start layout is
    # tile(arange(V), num_walks) + -1 padding, so starts are DERIVED in-kernel
    # from the walker gid (avoids a 1-D input whose XLA/Mosaic layouts clash)
    if use_prng:
        out_ref, = rest
        pltpu.prng_seed(par_ref[0], pl.program_id(0))
    else:
        u_ref, out_ref = rest          # [1 + L*max_trials, 3, W]
    W = tile
    gid = (jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)[0]
           + pl.program_id(0) * W)
    starts = jnp.where(gid < par_ref[2], gid % par_ref[1], -1)
    V_pad = tab_ref.shape[0]
    max_f = max(1.0 / p, 1.0, 1.0 / q)
    one = jnp.float32(1.0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (W, 128), 1)
    is_cols = (lane >= 1) & (lane <= md)           # neighbor-id lanes
    v_iota = jax.lax.broadcasted_iota(jnp.int32, (W, V_pad), 1)

    def fetch(cur):
        """The only gather: one-hot (W x V_pad) @ rowdat (V_pad x 128).

        Precision MUST be HIGHEST: the TPU MXU's default bf16 passes round
        vertex ids > 256 stored in the table (measured on v5e: ~25% invalid
        arcs), silently corrupting the walk."""
        oh = (cur[:, None] == v_iota).astype(jnp.float32)
        return jnp.dot(oh, tab_ref[:], preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)

    def draw3(row):
        if use_prng:
            u = _u01(pltpu.prng_random_bits((3, W)))
        else:
            u = u_ref[row]
        return u[0], u[1], u[2]

    def lane_select(row, lane_idx):
        """row[w, lane_idx[w]] via a lane mask + reduce (no lane slicing —
        Mosaic only allows 128-aligned slices)."""
        sel = (lane_idx[:, None] == lane).astype(jnp.float32)
        return jnp.sum(row * sel, axis=1)

    def sample(row, deg, degi, u_pos, u_keep):
        """Alias draw from a fetched row -> candidate id (f32)."""
        jpos = jnp.minimum((u_pos * deg).astype(jnp.int32), degi)
        keep_id = lane_select(row, 1 + jpos)
        alias_id = lane_select(row, 1 + md + jpos)
        aprob = lane_select(row, 1 + 2 * md + jpos)
        return jnp.where(u_keep < aprob, keep_id, alias_id)

    real = starts >= 0
    cur0 = jnp.maximum(starts, 0)
    row0 = fetch(cur0)                 # [W, 128]
    deg0 = lane_select(row0, jnp.zeros((W,), jnp.int32))
    # loop carries hold MASKS as f32 0/1, never bool vectors (Mosaic cannot
    # legalize 1-bit vectors in scf.for carries or minor-dim insertions)
    alive0 = real.astype(jnp.float32) * (deg0 > 0).astype(jnp.float32)
    degi0 = jnp.maximum(deg0.astype(jnp.int32) - 1, 0)

    # first-order step (reference initFirstStep): plain alias draw on row0
    u_pos, u_keep, _ = draw3(0)
    first = sample(row0, deg0, degi0, u_pos, u_keep).astype(jnp.int32)

    # out is [L+2, W] (transposed): per-step writes index the SUBLANE dim —
    # a dynamic lane index would need 128-alignment Mosaic cannot prove
    out_ref[0, :] = jnp.where(real, starts, -1)
    out_ref[1, :] = jnp.where(alive0 > 0, first, -1)

    def step(t, carry):
        cur, prev_row, prev_id, alive = carry      # alive: f32 0/1
        row = fetch(cur)
        deg = lane_select(row, jnp.zeros((W,), jnp.int32))
        alive = alive * (deg > 0).astype(jnp.float32)
        degi = jnp.maximum(deg.astype(jnp.int32) - 1, 0)
        prev_f = prev_id.astype(jnp.float32)

        def trial(j, st):
            accepted, dst, cand_last = st          # accepted: f32 0/1
            u_pos, u_keep, u_acc = draw3(1 + t * max_trials + j)
            cand = sample(row, deg, degi, u_pos, u_keep)
            member = jnp.any((prev_row == cand[:, None]) & is_cols, axis=1)
            f = jnp.where(cand == prev_f, one / p,
                          jnp.where(member, one, one / q))
            acc = (u_acc * max_f < f).astype(jnp.float32)
            take = acc * (one - accepted)
            dst = take * cand + (one - take) * dst
            rej = (one - accepted) * (one - acc)
            cand_last = rej * cand + (one - rej) * cand_last
            return jnp.minimum(accepted + acc, one), dst, cand_last

        st = jax.lax.fori_loop(
            0, max_trials, trial,
            (one - alive, jnp.zeros((W,), jnp.float32),
             jnp.zeros((W,), jnp.float32)))
        accepted, dst, cand_last = st
        dst = jnp.where(accepted > 0, dst, cand_last).astype(jnp.int32)
        ab = alive > 0
        out_ref[t + 2, :] = jnp.where(ab, dst, -1)
        new_cur = jnp.where(ab, dst, cur)
        af = alive[:, None]
        new_prev_row = af * row + (1.0 - af) * prev_row
        return (new_cur, new_prev_row,
                jnp.where(ab, cur, prev_id), alive)

    jax.lax.fori_loop(
        0, walk_length, step,
        (jnp.where(alive0 > 0, first, cur0), row0, cur0, alive0))


@partial(jax.jit, static_argnames=("walk_length", "p", "q", "max_trials",
                                   "md", "tile", "W_pad", "interpret"))
def walk_corpus_vmem(tab, params, walk_length: int, p: float, q: float,
                     md: int, W_pad: int, max_trials: int = 8,
                     tile: int = 256, interpret: bool = False, uniforms=None):
    """Walk corpus with VMEM-resident row tables -> [W_pad, walk_length+2] i32.

    tab from build_row_tables (md = the MD it was built with). params =
    i32[3] (seed, V, W_real): the start layout is tile(arange(V), R) with -1
    padding beyond W_real, derived in-kernel from the walker gid. uniforms:
    optional [1 + walk_length*max_trials, 3, W_pad] f32 external trial
    uniforms (required under interpret mode — the TPU PRNG has no CPU
    emulation)."""
    W = W_pad
    assert W % tile == 0, (W, tile)
    grid = (W // tile,)
    use_prng = uniforms is None
    kernel = partial(_walk_kernel, walk_length=walk_length, p=float(p),
                     q=float(q), max_trials=max_trials, md=md,
                     use_prng=use_prng, tile=tile)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),               # [seed, V, W_real]
        pl.BlockSpec(tab.shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM),               # row tables
    ]
    args = [params, tab]
    if not use_prng:
        R3 = uniforms.shape[0]
        in_specs.append(pl.BlockSpec((R3, 3, tile), lambda i: (0, 0, i),
                                     memory_space=pltpu.VMEM))
        args.append(uniforms)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((walk_length + 2, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((walk_length + 2, W), jnp.int32),
        interpret=(pltpu.InterpretParams() if interpret else False),
    )(*args).T


def vmem_tables_bytes(tab: np.ndarray) -> int:
    return int(tab.size) * 4


def pallas_walks(graph, walk_length: int, num_walks: int, p: float, q: float,
                 seed: int = 0, tile: int = 256, interpret: bool = False,
                 max_trials: int = 8, external_uniforms: bool = False):
    """Convenience driver: host row tables + padded starts -> dense corpus
    [num_walks * V, walk_length + 2] (layout-compatible with
    engine.random_walks; distribution-equivalent, not bitwise)."""
    md = max(graph.max_degree, 1)
    tab = build_row_tables(graph, md)
    V = graph.num_vertices
    W = num_walks * V
    W_pad = _pad_to(max(W, tile), tile)
    uniforms = None
    if external_uniforms:
        uniforms = jax.random.uniform(
            jax.random.PRNGKey(seed),
            (1 + walk_length * max_trials, 3, W_pad), jnp.float32)
    params = jnp.asarray([seed, V, W], jnp.int32)
    out = walk_corpus_vmem(jnp.asarray(tab), params, walk_length,
                           float(p), float(q), md=md, W_pad=W_pad,
                           max_trials=max_trials, tile=tile,
                           interpret=interpret, uniforms=uniforms)
    return np.asarray(out[:W])
