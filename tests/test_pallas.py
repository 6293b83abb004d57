"""Pallas kernel tests (interpreter mode on the CPU mesh).

The fused SGNS shared-negative kernel must produce the same gradients as the
plain-XLA formulation in models/word2vec._sgns_apply_shared — same math, the
kernel only changes where the [P, kB] logit tile lives.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stellar_rw_tpu.models import word2vec as w2v
from stellar_rw_tpu.ops.pallas.sgns import sgns_shared_grads


def _ref_grads(vi, vo, wn, g_pos, neg_mask):
    neg = jnp.dot(vi, wn.T, preferred_element_type=jnp.float32)
    g_neg = jax.nn.sigmoid(neg) * neg_mask[:, None]
    d_vi = g_pos[:, None] * vo + jnp.dot(g_neg, wn,
                                         preferred_element_type=jnp.float32)
    d_vo = g_pos[:, None] * vi
    d_wn = jnp.dot(g_neg.T, vi, preferred_element_type=jnp.float32)
    return d_vi, d_vo, d_wn


@pytest.mark.parametrize("P,D,kB,tile", [
    (512, 128, 128, 256),   # aligned
    (300, 50, 37, 256),     # every axis needs padding
    (7, 128, 256, 512),     # P smaller than one tile
])
def test_sgns_kernel_matches_xla(P, D, kB, tile):
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 5)
    vi = jax.random.normal(ks[0], (P, D), jnp.float32) * 0.3
    vo = jax.random.normal(ks[1], (P, D), jnp.float32) * 0.3
    wn = jax.random.normal(ks[2], (kB, D), jnp.float32) * 0.3
    g_pos = jax.random.normal(ks[3], (P,), jnp.float32)
    valid = (jax.random.uniform(ks[4], (P,)) > 0.3).astype(jnp.float32)
    g_pos = g_pos * valid
    neg_mask = valid * 0.125

    got = sgns_shared_grads(vi, vo, wn, g_pos, neg_mask,
                            tile_p=tile, interpret=True)
    want = _ref_grads(vi, vo, wn, g_pos, neg_mask)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-5)


def test_sgns_apply_shared_pallas_parity():
    """Full update step: use_pallas=True must match the XLA path."""
    V, D, P, kB = 40, 32, 64, 16
    k = jax.random.PRNGKey(7)
    ks = jax.random.split(k, 6)
    w_in = jax.random.normal(ks[0], (V, D), jnp.float32) * 0.1
    w_out = jax.random.normal(ks[1], (V, D), jnp.float32) * 0.1
    centers = jax.random.randint(ks[2], (P,), 0, V)
    contexts = jax.random.randint(ks[3], (P,), 0, V)
    valid = jax.random.uniform(ks[4], (P,)) > 0.2
    negs = jax.random.randint(ks[5], (kB,), 0, V)
    lr = jnp.float32(0.05)

    a_in, a_out = w2v._sgns_apply_shared(
        w_in, w_out, centers, contexts, valid, negs, lr, neg_weight=0.3125)
    # interpret mode is forced off-TPU inside the kernel wrapper
    b_in, b_out = w2v._sgns_apply_shared(
        w_in, w_out, centers, contexts, valid, negs, lr, neg_weight=0.3125,
        use_pallas=True)
    np.testing.assert_allclose(np.asarray(a_in), np.asarray(b_in),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(a_out), np.asarray(b_out),
                               rtol=1e-5, atol=1e-6)


def test_train_skipgram_pallas_path_runs():
    """End-to-end smoke: a tiny corpus trains through the fused kernel."""
    rng = np.random.default_rng(0)
    corpus = rng.integers(0, 30, size=(16, 12)).astype(np.int32)
    cfg = w2v.SGNSConfig(dim=16, window=3, negatives=4, iters=1,
                         shared_negatives=8, use_pallas=True, row_block=8)
    w_in, w_out = w2v.train_skipgram(corpus, 30, cfg)
    assert w_in.shape == (30, 16) and np.isfinite(w_in).all()


def test_pallas_walk_kernel_distribution():
    """VMEM-resident walk kernel (ops/pallas/walk.py): realized transition
    frequencies from a fixed (prev, cur) state must match the exact node2vec
    probabilities. Interpreter mode with external uniforms (the in-kernel TPU
    PRNG has no CPU emulation)."""
    from stellar_rw_tpu.graph import csr
    from stellar_rw_tpu.ops.pallas import walk as pw
    from stellar_rw_tpu.walk import oracle

    adj = {0: [(1, 1.0)], 1: [(0, 1.0), (2, 2.0), (3, 1.0), (4, 0.5)],
           2: [(1, 1.0), (0, 1.0)], 3: [(1, 1.0)], 4: [(1, 1.0)]}
    g = csr.from_adjacency(adj)
    p, q = 0.5, 2.0
    w = pw.pallas_walks(g, walk_length=1, num_walks=1600, p=p, q=q, seed=3,
                        tile=1024, interpret=True, external_uniforms=True)
    rows = w[w[:, 0] == 0]
    assert np.all(rows[:, 1] == 1)          # deg(0) == 1
    M = len(rows)
    freq = np.bincount(rows[:, 2], minlength=5) / M
    expected = oracle.exact_transition_probs(g, 0, 1, p, q)
    for v, pr in expected.items():
        se = np.sqrt(pr * (1 - pr) / M)
        assert abs(freq[v] - pr) < max(5 * se, 5e-3), (v, freq[v], pr)


def test_pallas_walk_kernel_shapes_and_dead_ends():
    """Dead-end and padding semantics match the XLA engine's dense corpus
    layout (walkLength+2 columns, -1 after a dead end, -1 rows for padding)."""
    from stellar_rw_tpu.graph import csr
    from stellar_rw_tpu.ops.pallas import walk as pw

    # directed chain 0 -> 1 -> 2 (2 is a dead end)
    adj = {0: [(1, 1.0)], 1: [(2, 1.0)], 2: []}
    g = csr.from_adjacency(adj)
    w = pw.pallas_walks(g, walk_length=4, num_walks=2, p=1.0, q=1.0, seed=0,
                        tile=512, interpret=True, external_uniforms=True)
    assert w.shape == (6, 6)
    by_start = {int(r[0]): r for r in w[:3]}
    np.testing.assert_array_equal(by_start[0], [0, 1, 2, -1, -1, -1])
    np.testing.assert_array_equal(by_start[1], [1, 2, -1, -1, -1, -1])
    np.testing.assert_array_equal(by_start[2], [2, -1, -1, -1, -1, -1])
