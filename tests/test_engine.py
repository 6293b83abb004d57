"""Walk-engine correctness.

The central technique mirrors the reference's end-to-end suite (SURVEY.md §4,
UniformRandomWalkTest.scala:181-321): run the full engine under deterministic,
counter-based randomness and compare every path element-wise against the serial NumPy
oracle. Shared randomness: the engine consumes uniform(fold_in(key, t))[w] for walker w
at step t, so the test regenerates exactly that stream for the oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stellar_rw_tpu.graph import csr, io
from stellar_rw_tpu.ops import sampling
from stellar_rw_tpu.walk import engine, oracle


def _walk_uniforms(key, walk_length, n_walkers, dtype=jnp.float64):
    """The exact uniform stream walk_once consumes in cdf mode: [L+1, W]."""
    us = [
        np.asarray(jax.random.uniform(jax.random.fold_in(key, t), (n_walkers,),
                                      dtype=dtype))
        for t in range(walk_length + 1)
    ]
    return np.stack(us, axis=0)


@pytest.mark.parametrize("p,q,walk_length,directed", [
    (1.0, 1.0, 1, False),
    (1.0, 1.0, 50, False),
    (0.25, 0.25, 12, False),
    (4.0, 0.5, 12, False),
    (1.0, 1.0, 12, True),
    (0.5, 2.0, 50, True),
])
def test_engine_matches_oracle_elementwise(karate_path, p, q, walk_length, directed):
    g = io.load_edge_list(karate_path, weighted=False, directed=directed)
    dg = sampling.device_put_graph(g)
    spec = engine.WalkSpec(
        walk_length=walk_length, p=p, q=q, sampler="cdf",
        max_degree=g.max_degree, n_search_iters=sampling.search_iters(g.max_degree),
        dtype="float64",
    )
    starts = jnp.arange(g.num_vertices, dtype=jnp.int32)
    key = jax.random.PRNGKey(3)
    paths = np.asarray(engine.walk_once(dg, starts, key, spec))
    us = _walk_uniforms(key, walk_length, g.num_vertices)
    for w in range(g.num_vertices):
        expect = oracle.oracle_walk(g, w, walk_length, p, q, us[:, w])
        got = paths[w][paths[w] >= 0]
        assert np.array_equal(got, expect), (w, got, expect)


def test_walk_shapes_and_corpus(karate_path):
    """Corpus invariants (reference RandomWalk.scala:82,103,132,164-167): num_walks
    paths per vertex, each path has walk_length+2 vertices unless cut by a dead-end."""
    g = io.load_edge_list(karate_path, weighted=False, directed=False)
    L, R = 10, 3
    walks = engine.random_walks(g, walk_length=L, num_walks=R, seed=1)
    assert walks.shape == (R * g.num_vertices, L + 2)
    # karate undirected has no dead ends: every path is full length
    assert np.all(walks >= 0)
    # round r walker w starts at vertex w
    for r in range(R):
        np.testing.assert_array_equal(
            walks[r * g.num_vertices:(r + 1) * g.num_vertices, 0],
            np.arange(g.num_vertices))
    # every step is a real edge
    idx = {int(o): i for i, o in enumerate(g.ids)}
    for row in walks[:40]:
        for a, b in zip(row[:-1], row[1:]):
            cols, _ = g.neighbors(int(a))
            assert int(b) in set(int(c) for c in cols)


def test_dead_end_semantics(testgraph_path):
    """Directed 1->2: walker from 1 walks one step then dies at 2 (length 2);
    walker from 2 is isolated (length 1) — reference RandomWalk.scala:59-61,115-120."""
    g = io.load_edge_list(testgraph_path, weighted=False, directed=True)
    idx = {int(o): i for i, o in enumerate(g.ids)}
    for sampler in ("cdf", "rejection"):
        walks = engine.random_walks(
            g, walk_length=5, num_walks=1, seed=0, sampler=sampler)
        by_start = {int(r[0]): r for r in walks}
        r1 = by_start[idx[1]]
        assert r1[1] == idx[2] and np.all(r1[2:] == -1)
        r2 = by_start[idx[2]]
        assert np.all(r2[1:] == -1)


def test_self_loop_and_multiedge():
    """Self-loops and multi-edges sample correctly (precedence dst==prev -> 1/p even
    when the self edge also appears in N(prev))."""
    adj = {
        0: [(0, 1.0), (1, 1.0)],
        1: [(0, 1.0), (1, 1.0), (1, 1.0)],  # multi self-edge at 1
    }
    g = csr.from_adjacency(adj)
    walks = engine.random_walks(g, walk_length=20, num_walks=2, p=0.5, q=2.0, seed=5)
    assert np.all(walks >= 0)
    # all steps land on real vertices
    assert set(np.unique(walks)) <= {0, 1}


@pytest.mark.parametrize("sampler", ["cdf", "rejection"])
def test_engine_level_distribution(karate_path, sampler):
    """End-to-end transition distribution check: aggregate empirical (prev,curr)->next
    frequencies over many engine walks and compare to the exact node2vec distribution
    (the χ²-style parity test SURVEY.md §4 calls for)."""
    g = io.load_edge_list(karate_path, weighted=False, directed=False)
    p, q = 0.5, 2.0
    W, L = 20000, 4
    hub = int(np.argmax(g.degrees))
    walks = engine.random_walks(
        g, walk_length=L, num_walks=1, p=p, q=q, seed=9, sampler=sampler,
        starts=np.full(W, hub, dtype=np.int32))
    # gather transitions conditioned on context (prev, curr)
    from collections import Counter, defaultdict
    counts: dict[tuple, Counter] = defaultdict(Counter)
    for row in walks:
        row = row[row >= 0]
        for i in range(2, len(row)):
            counts[(int(row[i - 2]), int(row[i - 1]))][int(row[i])] += 1
    checked = 0
    for (pv, cv), c in counts.items():
        n = sum(c.values())
        if n < 400:
            continue
        expected = oracle.exact_transition_probs(g, pv, cv, p, q)
        for v, pr in expected.items():
            se = np.sqrt(pr * (1 - pr) / n)
            assert abs(c[v] / n - pr) < max(6 * se, 0.03), ((pv, cv, v), c[v] / n, pr)
        checked += 1
    assert checked >= 3
