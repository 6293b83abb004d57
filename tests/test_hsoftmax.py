"""Hierarchical-softmax yardstick trainer (round-4 verdict missing item 3):
the reference's actual objective (MLlib skip-gram + HS, Main.scala:89-97),
implemented to measure NS-vs-HS quality parity on identical corpora."""

import numpy as np

from stellar_rw_tpu.graph import io
from stellar_rw_tpu.models import eval as ev
from stellar_rw_tpu.models import hsoftmax as hs
from stellar_rw_tpu.models import word2vec as w2v
from stellar_rw_tpu.walk import engine


def test_huffman_code_properties():
    rng = np.random.default_rng(0)
    counts = rng.zipf(1.5, 200).astype(np.float64)
    points, labels, mask = hs.build_huffman(counts)
    V, L = points.shape
    assert V == 200
    lens = mask.sum(axis=1).astype(int)
    # prefix-free: no live code is a prefix of another (codes reconstructed
    # from labels: bit = 1 - label)
    codes = {}
    for v in range(V):
        bits = tuple(int(1 - labels[v, j]) for j in range(lens[v]))
        codes[v] = bits
    seen = set(codes.values())
    assert len(seen) == V                      # all distinct
    for v, bits in codes.items():
        for k in range(1, len(bits)):
            assert bits[:k] not in seen        # no live prefix collisions
    # more frequent tokens get codes no longer than the rarest token's
    hi = int(np.argmax(counts))
    lo = int(np.argmin(counts))
    assert lens[hi] <= lens[lo]
    # optimality: expected length equals the classic Huffman bound computed
    # independently via the sibling-sum recurrence
    total = counts.sum()
    expected = float((counts * lens).sum() / total)
    entropy = float(-(counts / total * np.log2(counts / total)).sum())
    assert entropy <= expected < entropy + 1.0
    # inner-node ids are in range
    live = mask > 0
    assert points[live].min() >= 0 and points[live].max() < V - 1


def test_huffman_tiny_vocab():
    points, labels, mask = hs.build_huffman(np.asarray([5.0]))
    assert points.shape == (1, 1) and mask.sum() == 0
    points, labels, mask = hs.build_huffman(np.asarray([3.0, 1.0]))
    assert mask.sum() == 2                     # both leaves: 1-bit codes
    assert points.max() == 0


def test_hs_trainer_karate_quality(karate_path):
    """The HS yardstick must reach the same karate quality gates as the SGNS
    product trainer — the precondition for using it as a parity baseline."""
    g = io.load_edge_list(karate_path, weighted=False, directed=False)
    walks = engine.random_walks(g, walk_length=20, num_walks=10, p=0.25,
                                q=0.25, seed=2)
    cfg = w2v.SGNSConfig(dim=32, window=5, lr=0.2, iters=20, seed=2)
    syn0 = hs.train_skipgram_hs(walks, g.num_vertices, cfg)
    assert syn0.shape == (34, 32) and np.isfinite(syn0).all()
    edges = [(v, int(d)) for v in range(g.num_vertices)
             for d in g.neighbors(v)[0] if v < int(d)]
    auc = ev.link_prediction_auc(syn0, np.asarray(edges), g.num_vertices,
                                 seed=0)
    acc = ev.node_classification_accuracy(syn0, ev.karate_labels(g.ids),
                                          seed=0)
    assert auc > 0.7 and acc >= 0.85, (auc, acc)
