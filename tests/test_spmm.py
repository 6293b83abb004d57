"""SpMM/SDDMM primitives vs dense NumPy reference."""

import jax
import jax.numpy as jnp
import numpy as np

from stellar_rw_tpu.graph import io
from stellar_rw_tpu.ops import spmm


def _dense_adj(g):
    A = np.zeros((g.num_vertices, g.num_vertices), dtype=np.float64)
    for v in range(g.num_vertices):
        cols, w = g.neighbors(v)
        for c, wi in zip(cols, w):
            A[v, int(c)] += float(wi)  # multi-edges accumulate
    return A


def test_spmm_matches_dense(karate_path):
    g = io.load_edge_list(karate_path, weighted=False, directed=False)
    es = spmm.EdgeStructure.from_csr(g)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(g.num_vertices, 16)).astype(np.float32)
    got = np.asarray(spmm.spmm(es, jnp.asarray(x)))
    want = _dense_adj(g) @ x.astype(np.float64)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_spmm_mean_and_isolates(testgraph_path):
    g = io.load_edge_list(testgraph_path, weighted=False, directed=True)
    es = spmm.EdgeStructure.from_csr(g)
    x = np.array([[2.0, 4.0], [10.0, 20.0]], dtype=np.float32)
    idx = {int(o): i for i, o in enumerate(g.ids)}
    got = np.asarray(spmm.spmm_mean(es, jnp.asarray(x)))
    # vertex 1 -> mean over {2}; vertex 2 has no out-edges -> zeros
    np.testing.assert_allclose(got[idx[1]], x[idx[2]])
    np.testing.assert_allclose(got[idx[2]], [0.0, 0.0])


def test_sddmm_matches_dense(karate_path):
    g = io.load_edge_list(karate_path, weighted=False, directed=False)
    es = spmm.EdgeStructure.from_csr(g)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(g.num_vertices, 8)).astype(np.float32)
    y = rng.normal(size=(g.num_vertices, 8)).astype(np.float32)
    got = np.asarray(spmm.sddmm(es, jnp.asarray(x), jnp.asarray(y)))
    row = np.asarray(es.row)
    col = np.asarray(es.col)
    want = np.einsum("ed,ed->e", x[row], y[col])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_sddmm_softmax_rows_sum_to_one(karate_path):
    g = io.load_edge_list(karate_path, weighted=False, directed=False)
    es = spmm.EdgeStructure.from_csr(g)
    rng = np.random.default_rng(2)
    scores = jnp.asarray(rng.normal(size=(g.num_edges,)).astype(np.float32))
    a = np.asarray(spmm.sddmm_softmax(es, scores))
    row = np.asarray(es.row)
    sums = np.zeros(g.num_vertices)
    np.add.at(sums, row, a)
    deg = np.asarray(g.degrees)
    np.testing.assert_allclose(sums[deg > 0], 1.0, rtol=1e-5)


def test_spmm_is_differentiable(karate_path):
    g = io.load_edge_list(karate_path, weighted=False, directed=False)
    es = spmm.EdgeStructure.from_csr(g)
    x = jnp.ones((g.num_vertices, 4), jnp.float32)

    def loss(x):
        return jnp.sum(spmm.spmm_mean(es, x) ** 2)

    grad = jax.grad(loss)(x)
    assert grad.shape == x.shape and bool(jnp.any(grad != 0))
