"""Fused SGNS shared-negative gradient kernel (Pallas / MXU).

The hot math of the block-shared-negatives skip-gram step
(models/word2vec._sgns_apply_shared — the TPU-native replacement for the
reference's MLlib Word2Vec fit, reference Main.scala:89-97,116) is four
matmuls chained through a [P, kB] logit matrix:

    neg   = vi @ wn.T          [P, kB]   (MXU)
    g_neg = sigmoid(neg) * m              (VPU)
    d_vi  = g_pos*vo + g_neg @ wn         (MXU)
    d_wn  = g_neg.T @ vi                  (MXU)

Left to XLA these fuse only partially: the [P, kB] logits round-trip HBM
between the forward dot and the two gradient dots once P·kB outgrows fusion
thresholds. This kernel keeps the logit tile and all per-tile operands in
VMEM, so each pair block is read from HBM exactly once and the only HBM
traffic is vi/vo in, d_vi/d_vo out, plus one kB×D accumulator — the
bandwidth lower bound for this update.

Layout: grid over P tiles; wn ([kB, D]) rides VMEM whole (kB, D ≤ ~2k at
f32 stays well under the ~16 MB VMEM budget); d_wn accumulates across the
sequential TPU grid in its output ref.

Numerics match the XLA path (f32 MXU accumulation); CPU tests run the same
kernel in interpreter mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _sgns_kernel(vi_ref, vo_ref, wn_ref, gpos_ref, mask_ref,
                 dvi_ref, dvo_ref, dwn_ref):
    """One P-tile: logits, sigmoids and all three gradient matmuls in VMEM.

    gpos ( (sigmoid(pos)-1)*valid ) is computed outside: the positive dot is
    a cheap elementwise row-dot that XLA fuses into the gather; what needs
    fusing here is everything touching the [TILE_P, kB] negative-logit tile.
    """
    vi = vi_ref[:]                                   # [T, D]
    wn = wn_ref[:]                                   # [kB, D]
    g_pos = gpos_ref[:]                              # [T, 1]
    m = mask_ref[:]                                  # [T, 1] = valid * neg_weight
    neg = jax.lax.dot_general(
        vi, wn, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # [T, kB] (MXU)
    g_neg = jax.nn.sigmoid(neg) * m                  # VPU, never leaves VMEM
    dvi_ref[:] = g_pos * vo_ref[:] + jnp.dot(
        g_neg, wn, preferred_element_type=jnp.float32)
    dvo_ref[:] = g_pos * vi
    d_wn = jax.lax.dot_general(
        g_neg, vi, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # [kB, D] (MXU)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dwn_ref[:] = jnp.zeros_like(dwn_ref)

    dwn_ref[:] += d_wn


def _pick_tile(D: int, kB: int, budget_bytes: int = 12 << 20) -> int:
    """Largest P-tile whose VMEM working set fits the scoped budget.

    Estimate per tile t (f32): double-buffered vi/vo in + dvi/dvo out
    (8·t·D), wn + dwn resident (2·kB·D), and the neg/g_neg logit tiles
    (2·t·kB). Measured on v5e: tile=1024/kB=2048 blows the 16 MB scoped
    limit; this picks 512 there and 1024 for kB ≤ 512 (the fastest
    configurations that fit).
    """
    for t in (2048, 1024, 512, 256, 128):
        if 4 * (8 * t * D + 2 * kB * D + 2 * t * kB) <= budget_bytes:
            return t
    return 128


@functools.partial(jax.jit, static_argnames=("tile_p", "interpret"))
def sgns_shared_grads(vi: jax.Array, vo: jax.Array, wn: jax.Array,
                      g_pos: jax.Array, neg_mask: jax.Array,
                      tile_p: int | None = None, interpret: bool | None = None):
    """Fused gradients for the shared-negative SGNS step.

    Args:
      vi, vo: [P, D] center / context embeddings (already gathered).
      wn: [kB, D] shared negative embeddings.
      g_pos: [P] positive-pair gradient (sigmoid(<vi,vo>)-1)*valid.
      neg_mask: [P] per-pair negative weight (valid * k/kB).
      tile_p: P-tile override; default picks the largest VMEM-safe tile.
      interpret: force interpreter mode (defaults to True off-TPU).

    Returns (d_vi [P, D], d_vo [P, D], d_wn [kB, D]).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    P, D = vi.shape
    kB = wn.shape[0]
    if tile_p is None:
        tile_p = _pick_tile(_round_up(D, _LANE), _round_up(kB, _LANE))
    Pp, Dp, kp = _round_up(P, tile_p), _round_up(D, _LANE), _round_up(kB, _LANE)
    pad2 = lambda x, r, c: jnp.pad(x, ((0, r - x.shape[0]), (0, c - x.shape[1])))
    vi_p = pad2(vi, Pp, Dp)
    vo_p = pad2(vo, Pp, Dp)
    wn_p = pad2(wn, kp, Dp)
    # padded pairs carry zero masks => zero gradients; padded negatives are
    # zero rows => zero d_vi contribution, and their d_wn rows are sliced off
    gp = pad2(g_pos.astype(jnp.float32)[:, None], Pp, 1)
    nm = pad2(neg_mask.astype(jnp.float32)[:, None], Pp, 1)

    grid = (Pp // tile_p,)
    row_spec = pl.BlockSpec((tile_p, Dp), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    col1_spec = pl.BlockSpec((tile_p, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    full_spec = pl.BlockSpec((kp, Dp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    d_vi, d_vo, d_wn = pl.pallas_call(
        _sgns_kernel,
        grid=grid,
        in_specs=[row_spec, row_spec, full_spec, col1_spec, col1_spec],
        out_specs=[row_spec, row_spec, full_spec],
        out_shape=[
            jax.ShapeDtypeStruct((Pp, Dp), jnp.float32),
            jax.ShapeDtypeStruct((Pp, Dp), jnp.float32),
            jax.ShapeDtypeStruct((kp, Dp), jnp.float32),
        ],
        interpret=interpret,
    )(vi_p, vo_p, wn_p, gp, nm)
    return d_vi[:P, :D], d_vo[:P, :D], d_wn[:kB, :D]
