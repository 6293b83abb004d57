"""Skip-gram trainer quality + mechanics.

The reference delegates to MLlib and never tests word2vec (SURVEY.md §4 "Not tested");
BASELINE.json makes embedding quality the spec, so these tests train on karate walks
and assert downstream quality (link-prediction AUC, faction classification)."""

import numpy as np
import pytest

from stellar_rw_tpu.graph import io
from stellar_rw_tpu.models import eval as ev
from stellar_rw_tpu.models import word2vec as w2v
from stellar_rw_tpu.walk import engine


def test_pair_generation_masks():
    import jax
    block = np.array([[0, 1, 2, -1, -1]], dtype=np.int32)
    c, x, v = w2v._pairs_for_block(jax.numpy.asarray(block), jax.random.PRNGKey(0), 2)
    c, x, v = np.asarray(c), np.asarray(x), np.asarray(v)
    # no valid pair may involve padding or out-of-bounds
    assert np.all(c[v] >= 0) and np.all(x[v] >= 0)
    # at offset distance 1 pairs (0,1),(1,0),(1,2),(2,1) must be present
    # (dynamic window >= 1 always)
    got = set(zip(c[v].tolist(), x[v].tolist()))
    assert {(0, 1), (1, 0), (1, 2), (2, 1)} <= got
    assert (0, -1) not in got


def test_negative_table_distribution():
    import jax
    from stellar_rw_tpu.ops.alias import build_alias
    counts = np.array([1.0, 10.0, 100.0])
    keep, alias = build_alias(counts ** 0.75)
    negs = w2v._draw_negatives(
        jax.random.PRNGKey(0), (50000,), jax.numpy.asarray(keep),
        jax.numpy.asarray(alias))
    freq = np.bincount(np.asarray(negs), minlength=3) / 50000
    expect = counts ** 0.75 / (counts ** 0.75).sum()
    np.testing.assert_allclose(freq, expect, atol=0.01)


@pytest.fixture(scope="module")
def karate_embeddings(karate_path):
    g = io.load_edge_list(karate_path, weighted=False, directed=False)
    walks = engine.random_walks(g, walk_length=20, num_walks=10, p=1.0, q=1.0, seed=2)
    cfg = w2v.SGNSConfig(dim=32, window=5, negatives=5, lr=0.2, iters=20, seed=1)
    w_in, w_out = w2v.train_skipgram(walks, g.num_vertices, cfg)
    return g, w_in


def test_loss_decreases(karate_path):
    import jax
    g = io.load_edge_list(karate_path, weighted=False, directed=False)
    walks = engine.random_walks(g, walk_length=10, num_walks=3, seed=0)
    cfg = w2v.SGNSConfig(dim=16, window=4, negatives=4, lr=0.05, iters=1, seed=0)

    def probe_loss(w_in, w_out):
        key = jax.random.PRNGKey(9)
        centers = jax.random.randint(key, (512,), 0, g.num_vertices)
        # contexts = actual neighbors (positive pairs should score high after training)
        ctx = []
        for c in np.asarray(centers):
            cols, _ = g.neighbors(int(c))
            ctx.append(int(cols[0]) if len(cols) else int(c))
        negs = jax.random.randint(jax.random.fold_in(key, 1), (512, 4), 0,
                                  g.num_vertices)
        return float(w2v.sgns_loss(
            jax.numpy.asarray(w_in), jax.numpy.asarray(w_out), centers,
            jax.numpy.asarray(np.asarray(ctx)), negs))

    key = jax.random.PRNGKey(0)
    w_in0, w_out0 = w2v._init_embeddings(g.num_vertices, 16, key)
    loss0 = probe_loss(np.asarray(w_in0), np.asarray(w_out0))
    cfg10 = w2v.SGNSConfig(dim=16, window=4, negatives=4, lr=0.05, iters=10, seed=0)
    w_in, w_out = w2v.train_skipgram(walks, g.num_vertices, cfg10)
    loss1 = probe_loss(w_in, w_out)
    assert loss1 < loss0, (loss0, loss1)


def test_karate_link_prediction(karate_embeddings):
    g, w_in = karate_embeddings
    edges = []
    for v in range(g.num_vertices):
        cols, _ = g.neighbors(v)
        for d in cols:
            if v < int(d):
                edges.append((v, int(d)))
    auc = ev.link_prediction_auc(w_in, np.asarray(edges), g.num_vertices, seed=0)
    assert auc > 0.75, auc


def test_karate_faction_classification(karate_embeddings):
    g, w_in = karate_embeddings
    labels = ev.karate_labels(g.ids)
    acc = ev.node_classification_accuracy(w_in, labels, train_frac=0.5, seed=0)
    assert acc >= 0.90, acc


def test_token_corpus_roundtrip():
    corpus, vocab = w2v.corpus_from_token_lists([["a", "b", "a"], ["b", "c"]])
    assert vocab[0] in ("a", "b")  # both have count 2, order by token as tiebreak
    assert corpus.shape == (2, 3)
    assert corpus[1, 2] == -1
    inv = {i: t for i, t in enumerate(vocab)}
    assert [inv[int(i)] for i in corpus[0]] == ["a", "b", "a"]


def test_shared_negatives_training(karate_path):
    """The MXU path (block-shared negatives, weighted k/kB) must reach the same
    downstream quality as exact per-pair negative sampling."""
    g = io.load_edge_list(karate_path, weighted=False, directed=False)
    walks = engine.random_walks(g, walk_length=20, num_walks=10, seed=2)
    cfg = w2v.SGNSConfig(dim=32, window=5, negatives=5, lr=0.2, iters=20, seed=1,
                         shared_negatives=32)
    w_in, w_out = w2v.train_skipgram(walks, g.num_vertices, cfg)
    edges = [(v, int(d)) for v in range(g.num_vertices)
             for d in g.neighbors(v)[0] if v < int(d)]
    auc = ev.link_prediction_auc(w_in, np.asarray(edges), g.num_vertices, seed=0)
    acc = ev.node_classification_accuracy(w_in, ev.karate_labels(g.ids), seed=0)
    assert auc > 0.7 and acc >= 0.85, (auc, acc)


def test_dim_sharded_apply_matches_replicated():
    """One SGNS step with the tables dim-sharded over a 2-device mesh must equal
    the replicated step (column parallelism only changes WHERE partial dots are
    summed, not the math)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS

    rng = np.random.default_rng(0)
    V, D, P, k = 50, 16, 64, 3
    w_in = rng.normal(size=(V, D)).astype(np.float32) * 0.1
    w_out = rng.normal(size=(V, D)).astype(np.float32) * 0.1
    centers = rng.integers(0, V, P).astype(np.int32)
    contexts = rng.integers(0, V, P).astype(np.int32)
    valid = rng.random(P) < 0.9
    negs = rng.integers(0, V, (P, k)).astype(np.int32)
    lr = np.float32(0.1)

    ref_in, ref_out = w2v._sgns_apply(
        jnp.asarray(w_in), jnp.asarray(w_out), jnp.asarray(centers),
        jnp.asarray(contexts), jnp.asarray(valid), jnp.asarray(negs), lr)

    mesh = Mesh(np.array(jax.devices()[:2]), ("mp",))
    sh = NamedSharding(mesh, PS(None, "mp"))
    fn = jax.shard_map(
        lambda wi, wo, c, x, v, n: w2v._sgns_apply(
            wi, wo, c, x, v, n, lr, dim_axis="mp"),
        mesh=mesh,
        in_specs=(PS(None, "mp"), PS(None, "mp"), PS(), PS(), PS(), PS()),
        out_specs=(PS(None, "mp"), PS(None, "mp")))
    got_in, got_out = fn(
        jax.device_put(jnp.asarray(w_in), sh), jax.device_put(jnp.asarray(w_out), sh),
        jnp.asarray(centers), jnp.asarray(contexts), jnp.asarray(valid),
        jnp.asarray(negs))
    # per-device slice is [V, D/2] — the tables genuinely live sharded
    assert got_in.sharding.shard_shape(got_in.shape) == (V, D // 2)
    np.testing.assert_allclose(np.asarray(got_in), np.asarray(ref_in),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                               rtol=1e-5, atol=1e-6)


def test_model_sharded_training(karate_path):
    """model_shards=2 (optionally x dp) trains with the tables stored [V, D/2]
    per device and reaches the same downstream quality (SURVEY.md §2.3-5 sharded
    embedding tables; VERDICT round-1 item 5)."""
    g = io.load_edge_list(karate_path, weighted=False, directed=False)
    walks = engine.random_walks(g, walk_length=20, num_walks=10, seed=2)
    cfg = w2v.SGNSConfig(dim=32, window=5, negatives=5, lr=0.2, iters=20, seed=1,
                         model_shards=2)
    w_in, _ = w2v.train_skipgram(walks, g.num_vertices, cfg, num_partitions=2)
    edges = [(v, int(d)) for v in range(g.num_vertices)
             for d in g.neighbors(v)[0] if v < int(d)]
    auc = ev.link_prediction_auc(w_in, np.asarray(edges), g.num_vertices, seed=0)
    acc = ev.node_classification_accuracy(w_in, ev.karate_labels(g.ids), seed=0)
    assert auc > 0.7 and acc >= 0.85, (auc, acc)


def test_data_parallel_training(karate_path):
    """w2vPartitions semantics: data-parallel shards with per-epoch parameter merge
    (reference Main.scala:93 / MLlib numPartitions). Quality must hold at P=4."""
    g = io.load_edge_list(karate_path, weighted=False, directed=False)
    walks = engine.random_walks(g, walk_length=20, num_walks=10, seed=2)
    cfg = w2v.SGNSConfig(dim=32, window=5, negatives=5, lr=0.2, iters=20, seed=1)
    w_in, w_out = w2v.train_skipgram(walks, g.num_vertices, cfg, num_partitions=4)
    assert w_in.shape == (g.num_vertices, 32)
    edges = [(v, int(d)) for v in range(g.num_vertices)
             for d in g.neighbors(v)[0] if v < int(d)]
    auc = ev.link_prediction_auc(w_in, np.asarray(edges), g.num_vertices, seed=0)
    acc = ev.node_classification_accuracy(w_in, ev.karate_labels(g.ids), seed=0)
    assert auc > 0.7 and acc >= 0.85, (auc, acc)


def test_shared_pos_matches_pair_granular():
    """The block-position-granular shared-negative step (round-3 table-traffic
    lever) must compute the same update as the pair-granular form — same
    pairs, same gradients, same scatter-mean normalization (fp order aside)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    V, D, B, T, win, kB = 500, 32, 8, 21, 5, 64
    block = rng.integers(0, V, (B, T)).astype(np.int32)
    block[0, :3] = -1                      # padding present
    key = jax.random.PRNGKey(7)
    centers, contexts, valid = w2v._pairs_for_block(jnp.asarray(block), key, win)
    pos_c, pos_x, valid2 = w2v._pairs_pos_for_block(jnp.asarray(block), key, win)
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(valid2))
    # positions resolve to the same tokens wherever the pair is valid
    flat = block.reshape(-1)
    v = np.asarray(valid)
    np.testing.assert_array_equal(flat[np.asarray(pos_c)][v],
                                  np.asarray(centers)[v])
    np.testing.assert_array_equal(flat[np.asarray(pos_x)][v],
                                  np.asarray(contexts)[v])
    negs = jnp.asarray(rng.integers(0, V, kB).astype(np.int32))
    w_in = jnp.asarray((rng.standard_normal((V, D)) * 0.1).astype(np.float32))
    w_out = jnp.asarray((rng.standard_normal((V, D)) * 0.1).astype(np.float32))
    a_in, a_out = w2v._sgns_apply_shared(
        w_in, w_out, centers, contexts, valid, negs, 0.1, neg_weight=5 / kB)
    b_in, b_out = w2v._sgns_apply_shared_pos(
        w_in, w_out, jnp.asarray(block), pos_c, pos_x, valid2, negs, 0.1,
        neg_weight=5 / kB)
    np.testing.assert_allclose(np.asarray(a_in), np.asarray(b_in),
                               rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(a_out), np.asarray(b_out),
                               rtol=2e-4, atol=2e-6)


def test_shared_conv_matches_pos_granular():
    """The dense shifted-window shared-negative step (round-4: no pair
    gathers/scatters at all) must compute the same update as the
    position-granular form — same pair set, same gradients, same
    normalization (fp order aside)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    V, D, B, T, win, kB = 400, 32, 6, 23, 5, 64
    block = rng.integers(0, V, (B, T)).astype(np.int32)
    block[1, 17:] = -1                     # padding present
    key = jax.random.PRNGKey(9)
    pos_c, pos_x, validf = w2v._pairs_pos_for_block(jnp.asarray(block), key, win)
    valid, _ = w2v._valid_for_block(jnp.asarray(block), key, win)
    np.testing.assert_array_equal(np.asarray(validf),
                                  np.asarray(valid).reshape(-1))
    negs = jnp.asarray(rng.integers(0, V, kB).astype(np.int32))
    w_in = jnp.asarray((rng.standard_normal((V, D)) * 0.1).astype(np.float32))
    w_out = jnp.asarray((rng.standard_normal((V, D)) * 0.1).astype(np.float32))
    a_in, a_out = w2v._sgns_apply_shared_pos(
        w_in, w_out, jnp.asarray(block), pos_c, pos_x, validf, negs, 0.1,
        neg_weight=5 / kB)
    b_in, b_out = w2v._sgns_apply_shared_conv(
        w_in, w_out, jnp.asarray(block), valid, negs, 0.1,
        neg_weight=5 / kB, window=win)
    np.testing.assert_allclose(np.asarray(a_in), np.asarray(b_in),
                               rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(a_out), np.asarray(b_out),
                               rtol=2e-4, atol=2e-6)


def test_shared_conv_dp_branch_matches_pos_dp_branch():
    """The conv formulation's psum (dp) branch must be update-identical to the
    position-granular psum branch — same accumulator/count merge semantics
    (the dp branch normalizes negative-row/context collisions differently
    from the single-replica branch by design, so the comparison is
    branch-to-branch)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as PS

    rng = np.random.default_rng(2)
    V, D, B, T, win, kB = 200, 16, 4, 12, 3, 32
    block = rng.integers(0, V, (B, T)).astype(np.int32)
    key = jax.random.PRNGKey(3)
    pos_c, pos_x, validf = w2v._pairs_pos_for_block(jnp.asarray(block), key, win)
    valid, _ = w2v._valid_for_block(jnp.asarray(block), key, win)
    negs = jnp.asarray(rng.integers(0, V, kB).astype(np.int32))
    w_in = jnp.asarray((rng.standard_normal((V, D)) * 0.1).astype(np.float32))
    w_out = jnp.asarray((rng.standard_normal((V, D)) * 0.1).astype(np.float32))
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:1]), ("dp",))

    def run(fn):
        return jax.shard_map(fn, mesh=mesh, in_specs=(PS(), PS()),
                             out_specs=(PS(), PS()))(w_in, w_out)

    a_in, a_out = run(lambda wi, wo: w2v._sgns_apply_shared_pos(
        wi, wo, jnp.asarray(block), pos_c, pos_x, validf, negs, 0.1,
        neg_weight=5 / kB, axis_name="dp"))
    b_in, b_out = run(lambda wi, wo: w2v._sgns_apply_shared_conv(
        wi, wo, jnp.asarray(block), valid, negs, 0.1,
        neg_weight=5 / kB, window=win, axis_name="dp"))
    np.testing.assert_allclose(np.asarray(a_in), np.asarray(b_in),
                               rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(a_out), np.asarray(b_out),
                               rtol=2e-4, atol=2e-6)


def test_shared_band_matches_conv():
    """The banded-matmul formulation (shared_impl="band" — kept as a measured
    ablation; v5e runs it slower than conv) must compute the same update as
    the conv formulation, including with padding present."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(4)
    V, D, B, T, win, kB = 400, 32, 6, 23, 5, 64
    block = rng.integers(0, V, (B, T)).astype(np.int32)
    block[2, 15:] = -1                     # padding present
    key = jax.random.PRNGKey(11)
    valid, _ = w2v._valid_for_block(jnp.asarray(block), key, win)
    negs = jnp.asarray(rng.integers(0, V, kB).astype(np.int32))
    w_in = jnp.asarray((rng.standard_normal((V, D)) * 0.1).astype(np.float32))
    w_out = jnp.asarray((rng.standard_normal((V, D)) * 0.1).astype(np.float32))
    a_in, a_out = w2v._sgns_apply_shared_conv(
        w_in, w_out, jnp.asarray(block), valid, negs, 0.1,
        neg_weight=5 / kB, window=win)
    b_in, b_out = w2v._sgns_apply_shared_conv(
        w_in, w_out, jnp.asarray(block), valid, negs, 0.1,
        neg_weight=5 / kB, window=win, band=True)
    np.testing.assert_allclose(np.asarray(a_in), np.asarray(b_in),
                               rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(a_out), np.asarray(b_out),
                               rtol=2e-4, atol=2e-6)
