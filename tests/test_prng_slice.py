"""Bit-exact validation of ops/prng slice draws against jax.random.

These tests pin the (partitionable) threefry counter layout the O(local)
sharded PRNG path relies on (ops/prng.py): element i of
uniform(key, shape, f32) must be reproducible from (key_data, i) alone. If a
JAX upgrade changes the layout, these fail first and localize the re-pin."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stellar_rw_tpu.ops import prng, sampling


def _kd(key):
    return jax.random.key_data(key) if jnp.issubdtype(
        key.dtype, jax.dtypes.prng_key) else key


@pytest.mark.parametrize("n", [1, 2, 7, 255, 8192 * 3])
def test_uniform_at_matches_full_draw(n):
    key = jax.random.PRNGKey(42)
    full = np.asarray(jax.random.uniform(key, (n,), dtype=jnp.float32))
    idx = jnp.arange(n, dtype=jnp.int32)
    sliced = np.asarray(prng.uniform_at(_kd(key), idx))
    np.testing.assert_array_equal(full, sliced)


def test_uniform_at_random_subset():
    n = 10_001
    key = jax.random.fold_in(jax.random.PRNGKey(7), 3)
    full = np.asarray(jax.random.uniform(key, (n,), dtype=jnp.float32))
    idx = np.random.default_rng(0).integers(0, n, size=257)
    sliced = np.asarray(prng.uniform_at(_kd(key), jnp.asarray(idx, jnp.int32)))
    np.testing.assert_array_equal(full[idx], sliced)


def test_uniform3_at_matches_round_uniforms():
    """The triple-slice must reproduce the exact per-trial streams the
    rejection sampler consumes (round_uniforms: one (3, draw_width) draw)."""
    W = 300
    Wd = sampling.draw_width(W)
    step_key = jax.random.fold_in(jax.random.PRNGKey(5), 11)
    draw = sampling.round_uniforms(step_key, W)
    for j in [0, 1, 5]:
        u_pos, u_keep, u_acc = (np.asarray(u) for u in draw(j))
        kd = _kd(jax.random.fold_in(step_key, j))
        w = jnp.arange(W, dtype=jnp.int32)
        s0, s1, s2 = (np.asarray(u) for u in prng.uniform3_at(kd, w, Wd))
        np.testing.assert_array_equal(u_pos, s0)
        np.testing.assert_array_equal(u_keep, s1)
        np.testing.assert_array_equal(u_acc, s2)


def test_uniform3_at_per_element_keys():
    """Mixed-round batches gather per-element key data (the sharded engine's
    gid -> round mapping): broadcasting keys elementwise must equal the
    per-round full draws."""
    W = 64
    Wd = sampling.draw_width(W)
    base = jax.random.PRNGKey(9)
    keys = jax.vmap(lambda r: jax.random.fold_in(base, r))(jnp.arange(4))
    kd = jax.vmap(_kd)(keys)                       # [4, 2]
    r = jnp.asarray([0, 3, 1, 2, 2, 0], jnp.int32)
    w = jnp.asarray([0, 5, 63, 17, 2, 63], jnp.int32)
    got = prng.uniform3_at(kd[r], w, Wd)
    for i in range(len(r)):
        full = jax.random.uniform(keys[int(r[i])], (3, Wd),
                                  dtype=jnp.float32)
        for c in range(3):
            np.testing.assert_array_equal(np.asarray(full[c, int(w[i])]),
                                          np.asarray(got[c][i]))


def test_round_uniforms_batched_sliceable():
    """End-to-end contract with the engines' batched-round streams: element
    gid = r*n + w of round_uniforms_batched's draw(j) must equal the
    per-element slice with round r's trial key."""
    W, R = 100, 3
    base = jax.random.PRNGKey(13)
    step_keys = jax.vmap(lambda rr: jax.random.fold_in(base, rr))(jnp.arange(R))
    draw = sampling.round_uniforms_batched(step_keys, W)
    Wd = sampling.draw_width(W)
    gid = jnp.asarray([0, 5, 99, 100, 150, 299], jnp.int32)
    r, w = gid // W, gid % W
    kd_j = jax.vmap(_kd)(jax.vmap(
        lambda k: jax.random.fold_in(k, 1))(step_keys))     # trial j=1 keys
    got = prng.uniform3_at(kd_j[r], w, Wd)
    full = draw(1)
    for c in range(3):
        np.testing.assert_array_equal(np.asarray(full[c])[np.asarray(gid)],
                                      np.asarray(got[c]))


def test_use_slice_draws_gating():
    assert prng.use_slice_draws("threefry", "float32")
    assert not prng.use_slice_draws("rbg", "float32")
    assert not prng.use_slice_draws("threefry", "float64")
