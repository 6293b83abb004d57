"""Dataset loaders + multi-label quality harness (round-2 verdict item 6:
BlogCatalog-format loader and a labeled synthetic, wired to bench --quality)."""

import numpy as np
import pytest

from stellar_rw_tpu.graph import datasets
from stellar_rw_tpu.models import eval as ev


def test_blogcatalog_format_loader(tmp_path):
    """Tiny fixture in the standard BlogCatalog distribution layout."""
    (tmp_path / "edges.csv").write_text("1,2\n2,3\n3,1\n4,2\n")
    (tmp_path / "group-edges.csv").write_text("1,1\n2,1\n2,2\n3,2\n4,2\n")
    (tmp_path / "nodes.csv").write_text("1\n2\n3\n4\n5\n")
    g, labels = datasets.load_blogcatalog(str(tmp_path))
    assert g.num_vertices == 5          # nodes.csv fixes V (vertex 5 isolated)
    assert g.num_edges == 8             # 4 undirected edges -> 8 arcs
    assert labels.shape == (5, 2)
    np.testing.assert_array_equal(labels[1], [1, 1])   # node 2: groups 1+2
    np.testing.assert_array_equal(labels[4], [0, 0])   # node 5: no group
    # arcs go both ways
    assert 1 in g.neighbors(0)[0] and 0 in g.neighbors(1)[0]


def test_synth_labeled_graph_structure():
    g, labels = datasets.synth_labeled_graph(2000, 20_000, communities=8,
                                             seed=5)
    assert g.num_vertices == 2000
    assert labels.shape == (2000, 8)
    per_node = labels.sum(axis=1)
    assert per_node.min() >= 1 and per_node.max() <= 2
    assert (per_node == 2).mean() > 0.1          # overlap actually present
    # community structure dominates: a random within-community pair is far
    # more likely to be an edge than a random cross-community pair
    deg = g.degrees
    src_of = np.repeat(np.arange(g.num_vertices), deg)
    share = (labels[src_of] & labels[g.cols]).any(axis=1).mean()
    assert share > 0.6, share


def test_multilabel_micro_f1_separable():
    """Perfectly separable embeddings -> near-perfect micro-F1; random
    embeddings -> near-chance. Validates the top-k_i protocol end to end."""
    rng = np.random.default_rng(0)
    V, K, D = 600, 6, 16
    labels = np.zeros((V, K), np.int8)
    labels[np.arange(V), np.arange(V) % K] = 1
    sec = np.arange(V // 4)
    labels[sec, (sec + 1) % K] = 1                      # overlapping second label
    centers = rng.standard_normal((K, D))
    X = labels @ centers + 0.05 * rng.standard_normal((V, D))
    f1 = ev.multilabel_micro_f1(X, labels, train_frac=0.5, seed=0)
    assert f1 > 0.95, f1
    f1_rand = ev.multilabel_micro_f1(
        rng.standard_normal((V, D)), labels, train_frac=0.5, seed=0)
    assert f1_rand < 0.5, f1_rand


def test_quality_pipeline_small():
    """Full node2vec -> micro-F1 on a small labeled synthetic: community
    labels must be recoverable from the embeddings (well above chance)."""
    from stellar_rw_tpu.models import word2vec as w2v
    from stellar_rw_tpu.walk import engine

    g, labels = datasets.synth_labeled_graph(1500, 15_000, communities=6,
                                             seed=7)
    walks = engine.random_walks(g, walk_length=20, num_walks=3, p=0.25, q=0.25,
                                seed=1)
    cfg = w2v.SGNSConfig(dim=32, window=5, negatives=5, lr=0.1, iters=3,
                         seed=1, shared_negatives=64)
    w_in, _ = w2v.train_skipgram(walks, g.num_vertices, cfg)
    f1 = ev.multilabel_micro_f1(w_in, labels, train_frac=0.5, seed=0)
    assert f1 > 0.55, f1   # chance is ~1/6 primary + overlap noise


def test_mat_loader_roundtrip(tmp_path):
    """node2vec-paper .mat layout (sparse 'network' + 'group') loads into the
    CSR + multihot-label shape the quality harness consumes."""
    scipy = pytest.importorskip("scipy")
    from scipy import sparse
    from scipy.io import savemat

    rng = np.random.default_rng(0)
    V = 40
    a = sparse.random(V, V, density=0.1, random_state=1, format="coo")
    net = (a + a.T).tocoo()                       # symmetric weighted network
    grp = sparse.coo_matrix(
        (np.ones(V), (np.arange(V), rng.integers(0, 3, V))), shape=(V, 3))
    p = tmp_path / "toy.mat"
    savemat(p, {"network": net, "group": grp})
    g, labels = datasets.load_mat_graph(str(p))
    assert g.num_vertices == V and labels.shape == (V, 3)
    assert g.num_edges == net.nnz
    # arcs + weights faithful for a spot of vertices
    dense = net.toarray()
    for v in range(0, V, 7):
        cols, w = g.neighbors(v)
        nz = np.flatnonzero(dense[v])
        np.testing.assert_array_equal(np.sort(cols), nz)
        np.testing.assert_allclose(
            w[np.argsort(cols)], dense[v][nz].astype(np.float32))
    assert labels.sum() == V


def test_blogcatalog_empty_membership_file(tmp_path):
    """Empty/absent memberships must load as zero labels, not IndexError
    (round-3 advisor, low: read_pairs used to return a shape-(0,) array)."""
    (tmp_path / "edges.csv").write_text("1,2\n2,3\n")
    (tmp_path / "group-edges.csv").write_text("\n")
    (tmp_path / "nodes.csv").write_text("1\n2\n3\n")
    g, labels = datasets.load_blogcatalog(str(tmp_path))
    assert g.num_vertices == 3
    assert labels.shape == (3, 0)
    assert labels.sum() == 0


def test_sample_non_edges_vectorized():
    """Batched negative sampler (round-4 verdict weak item 5): valid non-edges
    even on a dense graph where most candidate pairs are rejected."""
    V = 40
    pairs = np.array([(a, b) for a in range(V) for b in range(V)
                      if a != b and not (a % 7 == 0 and b % 5 == 0)],
                     dtype=np.int64)
    negs = ev.sample_non_edges(pairs, V, 500, np.random.default_rng(0))
    assert negs.shape == (500, 2)
    eset = set(map(tuple, pairs.tolist()))
    for a, b in negs.tolist():
        assert a != b and (a, b) not in eset and (b, a) not in eset
