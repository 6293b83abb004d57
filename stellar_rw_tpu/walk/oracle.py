"""NumPy serial oracle: the executable correctness spec for the walk engines.

Port of the reference's sampling + walk semantics (the same role the in-test serial
walker plays in the reference suite, UniformRandomWalkTest.scala:293-321):

  - first-order sample: normalize by the row sum, inverse-CDF scan picking the FIRST
    neighbor whose cumulative probability >= u, falling back to the first edge
    (reference RandomSample.sample, RandomSample.scala:12-25)
  - second-order bias: w/p if dst == prev; w if dst in N(prev); else w/q
    (reference RandomSample.computeSecondOrderWeights, RandomSample.scala:27-44)
  - walk shape: [src, first-order step, then walkLength second-order steps] =
    walkLength+2 vertices, shorter on dead-ends; isolated source gives [src]
    (reference RandomWalk.scala:51-66,103-133)

Randomness is injected as a per-sample uniform stream (the oracle consumes exactly one
uniform per sample) — the counter-based analog of the reference's injectable
`nextFloat: () => Float` seam (RandomSample.scala:5).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from ..graph.csr import CSRGraph


def inverse_cdf_pick(weights: np.ndarray, u: float, dtype=np.float64) -> int:
    """Index of the first neighbor with cumulative normalized weight >= u; 0 if none."""
    w = weights.astype(dtype)
    total = w.sum(dtype=dtype)
    acc = np.cumsum(w / total, dtype=dtype)
    hits = np.nonzero(acc >= dtype(u))[0]
    return int(hits[0]) if len(hits) else 0


def second_order_weights(
    p: float, q: float, prev: int,
    prev_cols: np.ndarray, curr_cols: np.ndarray, curr_weights: np.ndarray,
    dtype=np.float64,
) -> np.ndarray:
    """Biased (unnormalized) transition weights; dst==prev takes precedence over
    prev-membership, matching the reference's branch order (RandomSample.scala:36-39)."""
    w = curr_weights.astype(dtype)
    prev_set = set(int(c) for c in prev_cols)
    out = np.empty_like(w)
    for i, (dst, wi) in enumerate(zip(curr_cols, w)):
        if int(dst) == prev:
            out[i] = wi / dtype(p)
        elif int(dst) in prev_set:
            out[i] = wi
        else:
            out[i] = wi / dtype(q)
    return out


def second_order_pick(
    p: float, q: float, prev: int,
    prev_cols: np.ndarray, curr_cols: np.ndarray, curr_weights: np.ndarray,
    u: float, dtype=np.float64,
) -> int:
    b = second_order_weights(p, q, prev, prev_cols, curr_cols, curr_weights, dtype)
    return inverse_cdf_pick(b, u, dtype)


def oracle_walk(
    graph: CSRGraph, start: int, walk_length: int, p: float, q: float,
    uniforms: Sequence[float], dtype=np.float64,
) -> np.ndarray:
    """Serial second-order walk from dense vertex `start`, consuming one uniform per
    sample. Returns dense vertex ids, length in [1, walk_length+2]."""
    path = [start]
    cols0, w0 = graph.neighbors(start)
    if len(cols0) == 0:
        return np.asarray(path, dtype=np.int32)
    ui = iter(uniforms)
    path.append(int(cols0[inverse_cdf_pick(w0, next(ui), dtype)]))
    for _ in range(walk_length):
        curr, prev = path[-1], path[-2]
        curr_cols, curr_w = graph.neighbors(curr)
        if len(curr_cols) == 0:
            break
        prev_cols, _ = graph.neighbors(prev)
        k = second_order_pick(p, q, prev, prev_cols, curr_cols, curr_w, next(ui), dtype)
        path.append(int(curr_cols[k]))
    return np.asarray(path, dtype=np.int32)


def exact_transition_probs(
    graph: CSRGraph, prev: int, curr: int, p: float, q: float,
) -> dict[int, float]:
    """Exact node2vec next-step distribution from state (prev, curr) — the ground truth
    for distribution-parity tests (multi-edges contribute additively)."""
    curr_cols, curr_w = graph.neighbors(curr)
    if len(curr_cols) == 0:
        return {}
    prev_cols, _ = graph.neighbors(prev)
    b = second_order_weights(p, q, prev, prev_cols, curr_cols, curr_w)
    b = b / b.sum()
    out: dict[int, float] = {}
    for dst, pr in zip(curr_cols, b):
        out[int(dst)] = out.get(int(dst), 0.0) + float(pr)
    return out
