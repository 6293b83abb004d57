"""Packed fast-path tables (ops/sampling.pack_tables_host + rejection_sample).

The packed tables change only HOW bytes are fetched (aligned-row gathers, 4
random HBM transactions per single-trial walk step instead of 11), never WHAT
is sampled: the same counter-based
uniform streams drive the same alias/acceptance decisions, so corpora must be
bitwise identical packed vs unpacked.
"""

import numpy as np
import pytest

from stellar_rw_tpu.graph.csr import from_edge_arrays
from stellar_rw_tpu.ops import sampling
from stellar_rw_tpu.walk import engine


def _random_graph(V=300, E=3000, seed=3, weighted=True):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, V, E)
    dst = rng.integers(0, V, E)
    keep = src != dst
    w = rng.uniform(0.2, 3.0, keep.sum()).astype(np.float32) if weighted else None
    return from_edge_arrays(src[keep], dst[keep], weights=w, num_vertices=V,
                            symmetrize=True)


def test_bucket_tables_exact_membership():
    """Bucketized membership layout: every unique neighbor of v sits in its ONE
    designated bucket (hash & mask) of v's rows, and nothing else does — so the
    single aligned bucket-row gather is an exact membership test."""
    g = _random_graph()
    bt = sampling.bucket_tables_host(g.offsets, g.cols)
    assert bt is not None
    hash_meta, buckets = bt
    V = g.num_vertices
    for v in range(0, V, 7):
        base, mask = int(hash_meta[v, 0]), int(hash_meta[v, 1])
        nbrs = set(int(c) for c in g.neighbors(v)[0])
        # all neighbors present in their designated bucket
        for k in nbrs:
            h = int((np.uint64(k) * np.uint64(sampling.HASH_MULT)) & np.uint64(0xFFFFFFFF))
            row = buckets[base + (h & mask)]
            assert k in row.tolist(), (v, k)
        # bucket rows of v contain only v's neighbors or empties
        stored = set(int(x) for x in buckets[base: base + mask + 1].ravel()
                     if x >= 0)
        assert stored == nbrs, v
        # negative probes: non-neighbors never match their designated bucket
        for k in range(0, V, 13):
            if k in nbrs:
                continue
            h = int((np.uint64(k) * np.uint64(sampling.HASH_MULT)) & np.uint64(0xFFFFFFFF))
            assert k not in buckets[base + (h & mask)].tolist(), (v, k)


@pytest.mark.parametrize("p,q", [(0.25, 4.0), (1.0, 1.0)])
def test_packed_corpus_bitwise_identical(p, q):
    graph = _random_graph()
    dg_packed = sampling.device_put_graph(graph)
    assert dg_packed.row_meta is not None  # packed is the default
    dg_plain = sampling.device_put_graph(graph, packed=False)
    assert dg_plain.row_meta is None
    kw = dict(walk_length=15, num_walks=3, p=p, q=q, seed=11,
              sampler="rejection")
    a = engine.random_walks(graph, device_graph=dg_packed, **kw)
    b = engine.random_walks(graph, device_graph=dg_plain, **kw)
    np.testing.assert_array_equal(a, b)


def test_packed_alias_bits_roundtrip():
    graph = _random_graph(weighted=True)
    graph.build_alias_tables()
    graph.build_hash_tables()
    pk = sampling.pack_tables_host(graph.offsets, graph.cols, graph.alias_prob,
                                   graph.alias_pos)
    _, alias_packed, _, _ = pk
    np.testing.assert_array_equal(
        np.ascontiguousarray(alias_packed[:, 0]).view(np.float32),
        graph.alias_prob)
    # slots 1/2 carry the two possible candidate vertex ids; slot 3 the position
    np.testing.assert_array_equal(alias_packed[:, 1], graph.cols)
    deg = graph.offsets[1:] - graph.offsets[:-1]
    row_of = np.repeat(np.arange(graph.num_vertices), deg)
    np.testing.assert_array_equal(
        alias_packed[:, 2],
        graph.cols[graph.offsets[:-1][row_of] + graph.alias_pos])
    np.testing.assert_array_equal(alias_packed[:, 3], graph.alias_pos)


def test_distributed_packed_matches_unpacked():
    """The sharded engine must produce the same corpus whether or not the
    partitioner's packed fast-path tables are uploaded."""
    import jax
    from jax.sharding import PartitionSpec as P

    from stellar_rw_tpu.graph.partition import partition_graph
    from stellar_rw_tpu.parallel import distributed
    from stellar_rw_tpu.walk.engine import WalkSpec

    graph = _random_graph(V=120, E=900, seed=9)
    mesh = distributed.make_mesh(4)
    hsg = partition_graph(graph, 4)
    assert hsg.row_meta is not None
    starts = np.arange(120, dtype=np.int32)
    spec = WalkSpec(walk_length=9, p=0.5, q=2.0, sampler="rejection",
                    max_degree=max(graph.max_degree, 1),
                    n_search_iters=sampling.search_iters(graph.max_degree))
    sh = jax.sharding.NamedSharding(mesh, P(distributed.AXIS))
    starts_dev = jax.device_put(starts, sh)
    key = jax.random.PRNGKey(2)

    def corpus(h):
        arrays, route = distributed.device_put_sharded_graph(h, mesh)
        paths, _ = distributed.distributed_walk_corpus(
            arrays, route, starts_dev, key, np.int32(0), spec,
            num_walks=2, S=4, C=16, mesh=mesh)
        return np.asarray(paths)

    packed = corpus(hsg)
    hsg.row_meta = hsg.hash_meta = hsg.alias_packed = hsg.hash_buckets = None
    plain = corpus(hsg)
    np.testing.assert_array_equal(packed, plain)


def test_tail_compaction_matches_dense_schedule(monkeypatch):
    """Straggler compaction is a pure execution-width optimization: corpora must
    be bitwise identical to running the whole trial schedule densely."""
    import stellar_rw_tpu.ops.sampling as sp

    graph = _random_graph(V=2000, E=16000, seed=21)
    # schedule="dynamic" pins the while-loop sampler (TAIL_FRAC only exists
    # there; the static cascade has its own parity suite,
    # tests/test_static_schedule.py)
    kw = dict(walk_length=12, num_walks=2, p=4.0, q=0.25, seed=5,
              sampler="rejection", schedule="dynamic")
    compacted = engine.random_walks(graph, **kw)
    monkeypatch.setattr(sp, "TAIL_FRAC", 1)  # s == W -> dense branch
    engine.walk_corpus.clear_cache()
    dense = engine.random_walks(graph, **kw)
    engine.walk_corpus.clear_cache()
    np.testing.assert_array_equal(compacted, dense)


def test_bucket_tables_fuzz():
    """Property fuzz: across random graph shapes (dense, sparse, skewed, with
    multi-edges and isolated vertices), every unique neighbor is found in its
    designated bucket and nothing else matches — including rows that forced
    the overflow-doubling rebuild."""
    rng = np.random.default_rng(42)
    for trial in range(12):
        V = int(rng.integers(2, 200))
        E = int(rng.integers(0, 8 * V))
        src = rng.integers(0, V, E)
        dst = rng.integers(0, V, E)
        g = from_edge_arrays(src, dst, num_vertices=V,
                             symmetrize=bool(rng.random() < 0.5))
        bt = sampling.bucket_tables_host(g.offsets, g.cols)
        assert bt is not None
        hash_meta, buckets = bt
        probe = rng.integers(0, V, 30)
        for v in rng.integers(0, V, 20):
            base, mask = int(hash_meta[v, 0]), int(hash_meta[v, 1])
            nbrs = set(int(c) for c in g.neighbors(int(v))[0])
            stored = set(int(x)
                         for x in buckets[base: base + mask + 1].ravel()
                         if x >= 0)
            assert stored == nbrs, (trial, v)
            for k in np.concatenate([list(nbrs)[:10], probe]).astype(np.int64):
                h = int((np.uint64(k) * np.uint64(sampling.HASH_MULT))
                        & np.uint64(0xFFFFFFFF))
                hit = int(k) in buckets[base + (h & mask)].tolist()
                assert hit == (int(k) in nbrs), (trial, v, int(k))
