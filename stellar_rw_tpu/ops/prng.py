"""Exact element slices of JAX threefry array draws — O(local) sharded PRNG.

The determinism contract of every engine in this framework is: the uniform a
walker consumes at (round r, step t, trial j, lane w) is element [.., w] of the
single-chip engine's ARRAY draw `uniform(fold_in-chain(key), shape)` (see
ops/sampling.round_uniforms_batched). Round 3's sharded engine satisfied it by
having EVERY device materialize the full global stream and gather `u[gid]` —
O(global walkers) PRNG compute per device per step, an S-times redundancy that
grows linearly with the mesh (round-3 verdict missing item 2; the reference's
executors only ever draw randomness for their own walkers,
RandomWalk.scala:75-76).

This module computes individual elements of those array draws directly from
(key, flat index): a device generates values only for its own walkers plus the
remote requests it serves, bitwise identical to slicing the full draw.

JAX's default threefry mode is PARTITIONABLE (jax_threefry_partitionable,
default since jax 0.4.30): `bits(key, shape)[i]` for row-major flat index i is
    o0 ^ o1  where  (o0, o1) = threefry2x32_block(k0, k1, hi32(i), lo32(i))
— one block per element, counters derived from the element's own index, with
NO dependence on the draw's total size (that independence is exactly what
makes the draw shardable, and it is what makes this slice exact).
f32 conversion: `bitcast(0x3f800000 | (bits >> 9)) - 1.0`.

The layout is validated bit-for-bit against jax.random.uniform in
tests/test_prng_slice.py — if a future JAX changes it, that test localizes the
re-pin. The slice path only serves float32 threefry streams; engines fall back
to full-width draws for float64 / 'rbg' (use_slice_draws below).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


_ROT_A = (13, 15, 26, 6)
_ROT_B = (17, 29, 16, 24)
_PARITY = 0x1BD11BDA  # threefry key-schedule parity constant


def _rotl(v, d: int):
    return (v << jnp.uint32(d)) | (v >> jnp.uint32(32 - d))


def threefry2x32_block(k0, k1, c0, c1):
    """One threefry-2x32 block (20 rounds), elementwise over uint32 arrays.

    Bit-identical to XLA's threefry2x32 primitive: (o0, o1) are the two output
    words for counter pair (c0, c1) under key (k0, k1) (Salmon et al., SC'11;
    the round/key schedule mirrors jax._src.prng._threefry2x32_lowering)."""
    k0 = k0.astype(jnp.uint32)
    k1 = k1.astype(jnp.uint32)
    ks2 = k0 ^ k1 ^ jnp.uint32(_PARITY)
    x0 = c0.astype(jnp.uint32) + k0
    x1 = c1.astype(jnp.uint32) + k1

    def four(x0, x1, rots):
        for r in rots:
            x0 = x0 + x1
            x1 = _rotl(x1, r)
            x1 = x0 ^ x1
        return x0, x1

    x0, x1 = four(x0, x1, _ROT_A)
    x0, x1 = x0 + k1, x1 + ks2 + jnp.uint32(1)
    x0, x1 = four(x0, x1, _ROT_B)
    x0, x1 = x0 + ks2, x1 + k0 + jnp.uint32(2)
    x0, x1 = four(x0, x1, _ROT_A)
    x0, x1 = x0 + k0, x1 + k1 + jnp.uint32(3)
    x0, x1 = four(x0, x1, _ROT_B)
    x0, x1 = x0 + k1, x1 + ks2 + jnp.uint32(4)
    x0, x1 = four(x0, x1, _ROT_A)
    return x0 + ks2, x1 + k0 + jnp.uint32(5)


def _bits_to_f32(bits):
    """jax.random.uniform's [0, 1) mapping for 32-bit draws."""
    fb = (bits >> jnp.uint32(9)) | jnp.uint32(0x3F800000)
    return jax.lax.bitcast_convert_type(fb, jnp.float32) - jnp.float32(1.0)


def bits_at(k0, k1, idx):
    """Element `idx` (row-major flat, < 2**31) of jax.random.bits(key, shape)
    for uint32 in partitionable threefry mode. k0/k1 broadcast against idx
    (pass gathered per-element key words for mixed-round batches)."""
    c1 = idx.astype(jnp.uint32)
    o0, o1 = threefry2x32_block(k0, k1, jnp.zeros_like(c1), c1)
    return o0 ^ o1


def uniform_at(kd, idx):
    """Element `idx` of jax.random.uniform(key, shape, float32) (row-major).

    kd: uint32[..., 2] raw key data (jax.random.key_data), indexed so that
    kd[..., 0]/kd[..., 1] broadcast against idx (e.g. per-element round
    keys)."""
    return _bits_to_f32(bits_at(kd[..., 0], kd[..., 1], idx))


def uniform3_at(kd, w, Wd: int):
    """Elements (0, w), (1, w), (2, w) of jax.random.uniform(key, (3, Wd)).

    The rejection sampler's per-trial triple (u_pos, u_keep, u_acc) for lane w
    (see ops/sampling.round_uniforms): three blocks per lane instead of the
    full (3, Wd) materialization. kd as in uniform_at."""
    k0, k1 = kd[..., 0], kd[..., 1]
    u0 = _bits_to_f32(bits_at(k0, k1, w))
    u1 = _bits_to_f32(bits_at(k0, k1, w + Wd))
    u2 = _bits_to_f32(bits_at(k0, k1, w + 2 * Wd))
    return u0, u1, u2


def use_slice_draws(rng_impl: str, dtype) -> bool:
    """Whether the O(local) slice path can serve an engine's streams: requires
    partitionable threefry (not 'rbg') and f32 draws (f64 consumes two 32-bit
    words per element in a different interleave — engines keep the full-width
    legacy stream there, as for rbg)."""
    if not jax.config.jax_threefry_partitionable:
        return False
    return rng_impl in ("threefry", "threefry2x32", "", None) and \
        jnp.dtype(dtype) == jnp.float32
