"""The node2vec pipeline: walks -> skip-gram embeddings.

TPU-native equivalent of the reference's task wiring (reference Main.scala:109-127):
`randomwalk` produces the corpus, `node2vec` additionally trains embeddings,
`embedding` trains from a walks file. Model artifacts land in <output>/bin, vectors in
<output>/vec, walks in <output>/path (reference Property.scala:5-7, Main.scala:36-44).
"""

from __future__ import annotations

import json
import logging
import os

import numpy as np

from ..graph.csr import CSRGraph
from ..graph import io as gio
from ..utils.config import MODEL_SUFFIX, Params
from ..walk import engine
from . import word2vec as w2v

logger = logging.getLogger("stellar_rw_tpu.node2vec")


def num_walk_shards(params: Params) -> int:
    """Resolve --shards: 0 = auto (single-chip unless --partitioned true, which
    mirrors the reference dispatching VCutRandomWalk across rddPartitions,
    Main.scala:54-57); always capped at the number of attached devices."""
    import jax

    ndev = len(jax.devices())
    if params.shards > 0:
        return max(1, min(params.shards, ndev))
    if params.partitioned:
        return max(1, min(ndev, params.rdd_partitions))
    return 1


def resolve_lanes(S: int, lanes: int) -> int:
    """Clamp --lanes to a divisor of the device count S.

    lanes must divide S (each graph shard is replicated across exactly `lanes`
    devices); a non-divisor falls back to the largest divisor <= lanes with a
    warning, so `--shards 6 --lanes 4` degrades gracefully (lanes=3) instead
    of crashing — and identically in every pipeline (run_walks, streaming,
    checkpointed; round-3 advisor finding)."""
    L = max(1, min(lanes, S))
    while S % L:
        L -= 1
    if L != lanes and lanes > 1:
        logger.warning("lanes=%d does not divide device count %d; using "
                       "lanes=%d", lanes, S, L)
    return L


def run_walks(graph: CSRGraph, params: Params,
              home: np.ndarray | None = None) -> np.ndarray:
    """Dispatch the walk engine — the analog of the reference choosing
    UniformRandomWalk vs VCutRandomWalk on --partitioned (Main.scala:54-57).

    home: per-vertex home partition from the VCut loader (VCutRandomWalk.scala:
    92-97); when sharded, walkers route by home % shards; otherwise the uniform
    hash policy applies. Both engines produce bitwise-identical corpora.
    """
    if params.checkpoint_every and params.output:
        # round-granular checkpoint/resume for long walk runs (SURVEY.md §5.3):
        # per-round dispatches instead of the all-rounds batch, persisted every
        # --checkpointEvery rounds, bitwise identical corpus either way
        walks, resumed = checkpointed_random_walks(graph, params, home)
        if resumed:
            print(f"resumed {resumed} completed walk rounds from checkpoint")
        return walks
    kw = dict(
        walk_length=params.walk_length,
        num_walks=params.num_walks,
        p=params.p,
        q=params.q,
        seed=params.seed,
        sampler=params.sampler,
        rng_impl=params.rng_impl,
    )
    S = num_walk_shards(params)
    if S <= 1:
        # device-resident corpus: the node2vec command hands this straight to
        # train_skipgram with no host round-trip (a single np.asarray view is
        # taken by the caller for /path output and stats)
        return engine.random_walks(graph, as_numpy=False, **kw)
    from ..parallel import distributed

    lanes = resolve_lanes(S, params.lanes)
    route = None
    if params.partitioned and home is not None:
        # route targets GRAPH shards: S devices / lanes-per-shard
        route = (home.astype(np.int64) % max(S // lanes, 1)).astype(np.int32)
    walks, stats = distributed.distributed_random_walks(
        graph, num_shards=S, route=route, verbose=True, return_stats=True,
        lanes=lanes, streamed=params.streamed, **kw)
    print(f"shards: {stats['num_shards']} x {stats['lanes']} lanes "
          f"({'vcut' if route is not None else 'hash'} routing), "
          f"replication factor: {stats['replication_factor']:.3f}, "
          f"boundary walkers: {stats['boundary_walkers']}, "
          f"a2a capacity: {stats['capacity']}, "
          f"overflow supersteps: {stats['overflow_steps']}")
    logger.info("shard stats: %s",
                {k: v for k, v in stats.items() if k != "diag"})
    return walks


def run_walks_multihost(graph: CSRGraph, params: Params,
                        home: np.ndarray | None = None):
    """Multi-host walk dispatch (jax.process_count() > 1): the global-mesh
    sharded engine with per-process corpus blocks — the reference's cluster
    execution where each executor computes and keeps its own partitions
    (Main.scala:53-62, RandomWalk.scala:234-241). Every process calls with
    identical params (SPMD).

    Returns (local_blocks [(global_row_start, rows)], diag, padded_rows,
    devices_used): blocks tile the padded global corpus
    [num_walks * W_pad, L+2] across processes; rows whose start slot was
    padding are all -1."""
    import jax

    from ..parallel import multihost

    # multi-host always spans ALL global devices: a sub-mesh would leave some
    # processes with no addressable shards — their empty uploads / divergent
    # shapes crash or deadlock the SPMD program. --shards therefore only
    # rescales DOWN the graph-shard count via --lanes; a mismatched value is
    # honored as closely as possible and logged.
    D = jax.device_count()
    if params.shards > 0 and params.shards != D:
        logger.warning(
            "multi-host runs use all %d global devices; --shards %d is "
            "ignored (use --lanes to reduce the graph-shard count)",
            D, params.shards)
    lanes = resolve_lanes(D, params.lanes)
    route = None
    if params.partitioned and home is not None:
        route = (home.astype(np.int64) % max(D // lanes, 1)).astype(np.int32)
    blocks, diag = multihost.multihost_random_walks(
        graph, walk_length=params.walk_length, num_walks=params.num_walks,
        p=params.p, q=params.q, seed=params.seed, sampler=params.sampler,
        num_shards=D, route=route, rng_impl=params.rng_impl, lanes=lanes)
    W_pad = -(-graph.num_vertices // D) * D
    return blocks, diag, params.num_walks * W_pad, D


def train_multiproc_with_ckpt(blocks, num_rows: int, vocab_size: int,
                              params: Params,
                              num_devices: int | None = None,
                              row_width: int | None = None):
    """Multi-process trainer with epoch checkpoint/resume, shared by the
    node2vec and embedding multi-host paths. Checkpoints are written by
    process 0 only; on --resume, process 0 reads the file and broadcasts the
    state to every process (per-host filesystems may not share <output>), so
    all replicas restart bit-identical. Returns (w_in, w_out)."""
    import jax

    cfg = sgns_config(params)
    me = jax.process_index()
    init = None
    start_epoch = 0
    ckpt = _checkpoint_path(params.output) if params.output else None
    if params.resume and ckpt:
        found = me == 0 and os.path.exists(ckpt)
        V, dim = vocab_size, params.w2v_dim
        if found:
            z = np.load(ckpt)
            payload = (np.float32(1), np.float32(int(z["epoch"]) + 1),
                       z["w_in"].astype(np.float32),
                       z["w_out"].astype(np.float32))
        else:
            payload = (np.float32(0), np.float32(0),
                       np.zeros((V, dim), np.float32),
                       np.zeros((V, dim), np.float32))
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            payload = multihost_utils.broadcast_one_to_all(payload)
        if float(payload[0]):
            init = (np.asarray(payload[2]), np.asarray(payload[3]))
            start_epoch = int(payload[1])

    on_epoch = None
    if params.checkpoint_every and ckpt and me == 0:
        os.makedirs(os.path.dirname(ckpt), exist_ok=True)

        def on_epoch(ep, w_in, w_out):
            if (ep + 1) % params.checkpoint_every == 0:
                np.savez(ckpt, w_in=w_in, w_out=w_out, epoch=ep)

    return w2v.train_skipgram_multiproc(
        blocks, num_rows, vocab_size, cfg,
        init=init, start_epoch=start_epoch, on_epoch=on_epoch,
        num_devices=num_devices, row_width=row_width)


def embed_walk_blocks(blocks, num_rows: int, graph: CSRGraph, params: Params,
                      num_devices: int | None = None,
                      row_width: int | None = None):
    """Multi-process trainer entry for the node2vec path: SGNS over
    per-process corpus blocks. Returns (tokens, w_in, w_out)."""
    w_in, w_out = train_multiproc_with_ckpt(
        blocks, num_rows, graph.num_vertices, params,
        num_devices=num_devices, row_width=row_width)
    return [int(i) for i in graph.ids], w_in, w_out


def _round_maker(graph: CSRGraph, params: Params,
                 home: np.ndarray | None = None):
    """Per-round corpus generation setup shared by the streaming pipeline and
    the checkpointed walk loop: make_round(r) -> device [V, L+2] block, round r
    of the full corpus, bitwise identical to the batched engines (counter-based
    round-addressed streams). Single-chip or sharded per --shards/--partitioned
    (same routing rules as run_walks)."""
    import jax
    import jax.numpy as jnp

    from ..ops import sampling

    sampler, max_rounds = sampling.plan_sampler(
        params.sampler, params.p, params.q)
    V = graph.num_vertices
    S = num_walk_shards(params)
    spec = engine.WalkSpec(
        walk_length=params.walk_length, p=float(params.p), q=float(params.q),
        sampler=sampler, max_degree=max(graph.max_degree, 1),
        n_search_iters=sampling.search_iters(graph.max_degree),
        max_rounds=max_rounds,
        n_stream=V,
        rng_impl=params.rng_impl,
        cdf_chunk=(sampling.plan_cdf_chunk_corpus(
            params.num_walks, V, graph.max_degree)
            if sampler == "cdf" else 0),
    )
    base = sampling.make_key(params.seed, params.rng_impl)

    if S > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..graph.partition import partition_graph
        from ..parallel import distributed

        L = resolve_lanes(S, params.lanes)
        SH = S // L     # graph shards (each replicated across its L lanes)
        mesh = distributed.make_mesh(SH, L)
        route = None
        if params.partitioned and home is not None:
            route = (home.astype(np.int64) % SH).astype(np.int32)
        if params.streamed:
            # memory-lean build: one shard resident at a time (peak host =
            # graph + one shard) — previously unavailable exactly on the
            # long-run streaming/checkpointed pipelines (round-4 verdict
            # weak item 4 / advisor finding)
            arrays, route_dev, plan = \
                distributed.device_put_sharded_graph_streamed(
                    graph, mesh, route)
            logger.info("graph sharded (streamed): S=%d, replication "
                        "factor=%.3f", SH, plan.replication_factor)
            route_host = plan.route
        else:
            hsg = partition_graph(graph, SH, route)
            distributed.log_shard_stats(hsg)
            arrays, route_dev = distributed.device_put_sharded_graph(hsg, mesh)
            route_host = hsg.route
        W_pad = -(-V // S) * S
        starts_pad = np.full(W_pad, -1, dtype=np.int32)
        starts_pad[:V] = np.arange(V, dtype=np.int32)
        starts_dev = jax.device_put(
            jnp.asarray(starts_pad),
            NamedSharding(mesh, P((distributed.AXIS, distributed.LANE))))
        C = distributed.auto_capacity(graph, route_host, S, W_pad // S)
        C = max(1, min(C, W_pad // S))

        def make_round(r: int):
            paths, diag = distributed.distributed_walk_corpus(
                arrays, route_dev, starts_dev, base, np.int32(r), spec,
                num_walks=1, S=SH, C=C, mesh=mesh, L=L)
            if int(np.asarray(diag)[:, 3].sum()):
                # static-cascade overflow: re-run this round dynamically
                paths, _ = distributed.distributed_walk_corpus(
                    arrays, route_dev, starts_dev, base, np.int32(r),
                    spec._replace(schedule="dynamic"),
                    num_walks=1, S=SH, C=C, mesh=mesh, L=L)
            return paths[:V]
    else:
        dg = sampling.device_put_graph(graph)
        starts = jnp.arange(V, dtype=jnp.int32)

        def make_round(r: int):
            paths, ovf = engine.walk_corpus(dg, starts, base, spec, 1,
                                            np.int32(r))
            if int(np.asarray(ovf)):
                # static-cascade capacity exceeded: this round must re-run on
                # the dynamic schedule (full trial budget; see engine docs)
                paths, _ = engine.walk_corpus(
                    dg, starts, base, spec._replace(schedule="dynamic"), 1,
                    np.int32(r))
            return paths

    return make_round, V


WALK_CKPT_DIR = "walk_rounds"
WALK_CKPT_MARKER = "marker.json"


def _round_file(ckpt_dir: str, r: int) -> str:
    return os.path.join(ckpt_dir, f"round-{r:05d}.npy")


def _save_round_atomic(ckpt_dir: str, r: int, block: np.ndarray) -> None:
    tmp = _round_file(ckpt_dir, r) + ".tmp"
    with open(tmp, "wb") as f:
        np.save(f, block)
    os.replace(tmp, _round_file(ckpt_dir, r))


def checkpointed_random_walks(graph: CSRGraph, params: Params,
                              home: np.ndarray | None = None
                              ) -> tuple[np.ndarray, int]:
    """Round-granular walk checkpoint/resume (SURVEY.md §5.3; round-2 verdict
    item 8 — the reference has only stage-level resume via the walks file,
    RandomWalk.scala:234-241 / Main.scala:119-124).

    Rounds are generated one at a time (each round is deterministically
    addressed by its round index, so regeneration order is irrelevant). Each
    completed round is persisted as its own atomic file
    <output>/bin/walk_rounds/round-NNNNN.npy, and every --checkpointEvery
    rounds the completed-marker (round count + config fingerprint) is
    atomically refreshed — checkpoint cost is O(one round) in I/O and host
    memory, never the O(R^2) rewrite-everything of the round-4 design
    (round-4 verdict weak item 3). With --resume, completed rounds load from
    their files and only the remainder is generated — the final corpus is
    bitwise identical to an uninterrupted run. (The returned dense corpus is
    the caller's contract; the checkpoint loop itself holds one round.)

    Returns (walks [num_walks*V, L+2], resumed_rounds)."""
    make_round, V = _round_maker(graph, params, home)
    R = params.num_walks
    T = params.walk_length + 2
    ckpt_dir = os.path.join(params.output, MODEL_SUFFIX, WALK_CKPT_DIR)
    marker = os.path.join(ckpt_dir, WALK_CKPT_MARKER)
    # walk-config fingerprint: resuming after a change to anything that alters
    # the realized rounds (seed, p/q, sampler, rng stream, shard layout) must
    # regenerate from scratch, not splice two configurations into one corpus
    # (round-3 advisor finding). Stored alongside the shape marker.
    fp = json.dumps([params.seed, params.p, params.q, params.sampler,
                     params.rng_impl, params.shards, params.lanes,
                     params.partitioned, params.walk_length])
    start = 0
    if params.resume and os.path.exists(marker):
        try:
            with open(marker) as f:
                m = json.load(f)
        except (json.JSONDecodeError, OSError):
            m = {}
        done = int(m.get("completed", 0))
        if m.get("fingerprint") != fp:
            logger.warning("walk checkpoint fingerprint %s does not match "
                           "current params %s — regenerating from scratch",
                           m.get("fingerprint"), fp)
        elif m.get("rows") != V or m.get("cols") != T or done > R:
            logger.warning("walk checkpoint shape %s does not match params "
                           "(expected rows=%d cols=%d, completed<=%d) — "
                           "regenerating from scratch",
                           (m.get("rows"), m.get("cols"), done), V, T, R)
        elif not all(os.path.exists(_round_file(ckpt_dir, r))
                     for r in range(done)):
            logger.warning("walk checkpoint round files missing — "
                           "regenerating from scratch")
        else:
            start = done
            logger.info("walk checkpoint: resuming after %d completed rounds",
                        done)
    every = max(1, params.checkpoint_every)
    os.makedirs(ckpt_dir, exist_ok=True)
    out = np.empty((R * V, T), dtype=np.int32)
    for r in range(start):
        out[r * V:(r + 1) * V] = np.load(_round_file(ckpt_dir, r))

    def write_marker(done: int) -> None:
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"completed": done, "fingerprint": fp,
                       "rows": V, "cols": T}, f)
        os.replace(tmp, marker)  # atomic: a kill never corrupts the marker

    if start == 0:
        write_marker(0)  # invalidate any stale marker before overwriting files
    for r in range(start, R):
        block = np.asarray(make_round(r))
        out[r * V:(r + 1) * V] = block
        _save_round_atomic(ckpt_dir, r, block)
        done = r + 1
        if done % every == 0 or done == R:
            write_marker(done)
    return out, start


def run_node2vec_streaming(graph: CSRGraph, params: Params,
                           home: np.ndarray | None = None):
    """Memory-bounded node2vec: one walk ROUND resident at a time.

    The reference materializes the full corpus before Word2Vec.fit
    (Main.scala:112-116) — 10·|V|·82·4B ≈ 13 GB at LiveJournal defaults, more
    than a chip's spare HBM next to the graph tables. Here the counter-based
    streams make every round exactly regenerable, so the pipeline is:

      pre-pass (once): generate each round on device, stream /path to disk,
        accumulate token counts + walk stats;
      training: per epoch, regenerate each round and train on it — the realized
        corpus is bitwise identical to the stored-corpus path.

    Returns (tokens, w_in, w_out, stats). With --shards > 1 (or --partitioned
    true) each round is generated by the sharded engine (same routing rules as
    run_walks, bitwise-identical rounds), so corpus memory stays one round per
    device set."""
    import jax
    import jax.numpy as jnp

    from ..utils.stats import WalkStats

    V = graph.num_vertices
    R = params.num_walks
    make_round, _ = _round_maker(graph, params, home)

    # pre-pass: /path + token counts + stats in one sweep of the corpus
    counts_dev = jnp.zeros(V, jnp.float32)

    @jax.jit
    def add_counts(acc, block):
        flat = block.reshape(-1)
        ok = (flat >= 0).astype(jnp.float32)
        return acc.at[jnp.maximum(flat, 0)].add(ok)

    lengths = np.zeros(0, dtype=np.int64)

    def rounds_for_save():
        nonlocal counts_dev, lengths
        for r in range(R):
            block = make_round(r)
            counts_dev = add_counts(counts_dev, block)
            block_np = np.asarray(block)
            lengths = np.concatenate([lengths, (block_np >= 0).sum(axis=1)])
            yield block_np

    gio.save_walks_stream(rounds_for_save(), R * V, graph, params.output,
                          output_partitions(params))
    counts = np.asarray(counts_dev).astype(np.float64)
    full = params.walk_length + 2
    stats = WalkStats(
        num_paths=int(len(lengths)),
        num_steps=int(lengths.sum() - len(lengths)),
        full_paths=int((lengths == full).sum()),
        dead_ends=int(((lengths < full) & (lengths > 1)).sum()),
        isolated_starts=int((lengths == 1).sum()),
        mean_length=float(lengths.mean()) if len(lengths) else 0.0,
    )

    w_in, w_out = w2v.train_skipgram_streaming(
        make_round, R, (V, full), V, sgns_config(params), counts)
    return [int(i) for i in graph.ids], w_in, w_out, stats


def sgns_config(params: Params) -> w2v.SGNSConfig:
    return w2v.SGNSConfig(
        dim=params.w2v_dim,
        window=params.w2v_window,
        negatives=params.w2v_negatives,
        lr=params.w2v_lr,
        iters=params.w2v_iter,
        seed=params.seed,
        shared_negatives=params.shared_negatives,
        model_shards=params.w2v_model_shards,
    )


def save_model(output: str, tokens: list, w_in: np.ndarray, w_out: np.ndarray,
               params: Params) -> str:
    """Persist trainable state + metadata to <output>/bin (the reference saves the
    MLlib model there, Main.scala:38)."""
    out_dir = os.path.join(output, MODEL_SUFFIX)
    os.makedirs(out_dir, exist_ok=True)
    np.savez(os.path.join(out_dir, "model.npz"),
             w_in=w_in, w_out=w_out, tokens=np.asarray(tokens))
    meta = {
        "dim": params.w2v_dim, "window": params.w2v_window,
        "negatives": params.w2v_negatives, "lr": params.w2v_lr,
        "iters": params.w2v_iter, "vocab_size": len(tokens),
    }
    with open(os.path.join(out_dir, "metadata.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return out_dir


def load_model(output_or_bin: str):
    d = output_or_bin
    if os.path.isdir(os.path.join(d, MODEL_SUFFIX)):
        d = os.path.join(d, MODEL_SUFFIX)
    z = np.load(os.path.join(d, "model.npz"), allow_pickle=False)
    return z["tokens"], z["w_in"], z["w_out"]


def _checkpoint_path(output: str) -> str:
    return os.path.join(output, MODEL_SUFFIX, "checkpoint.npz")


def _train(corpus: np.ndarray, vocab_size: int, params: Params):
    """Trainer with step-level checkpoint/resume (SURVEY.md §5.4: the reference only
    has stage-level resume via the walks file; this adds epoch-grained checkpoints of
    the trainer state, replayed deterministically thanks to counter-based keys)."""
    init = None
    start_epoch = 0
    ckpt = _checkpoint_path(params.output) if params.output else None
    if params.resume and ckpt and os.path.exists(ckpt):
        z = np.load(ckpt)
        init = (z["w_in"], z["w_out"])
        start_epoch = int(z["epoch"]) + 1

    on_epoch = None
    if params.checkpoint_every and ckpt:
        os.makedirs(os.path.dirname(ckpt), exist_ok=True)

        def on_epoch(ep, w_in, w_out):
            if (ep + 1) % params.checkpoint_every == 0:
                np.savez(ckpt, w_in=w_in, w_out=w_out, epoch=ep)

    return w2v.train_skipgram(
        corpus, vocab_size, sgns_config(params),
        num_partitions=params.w2v_partitions,
        init=init, start_epoch=start_epoch, on_epoch=on_epoch)


def embed_walks(walks: np.ndarray, graph: CSRGraph, params: Params):
    """Train SGNS directly on the dense walk corpus (vocab = graph vertices).
    Returns (tokens = original ids, w_in, w_out)."""
    w_in, w_out = _train(walks, graph.num_vertices, params)
    return [int(i) for i in graph.ids], w_in, w_out


def embed_token_corpus(token_lists, params: Params):
    """Train SGNS from arbitrary token sequences (the `embedding` command re-reading
    walks from disk, reference Main.scala:119-124)."""
    corpus, vocab = w2v.corpus_from_token_lists(token_lists)
    w_in, w_out = _train(corpus, len(vocab), params)
    return vocab, w_in, w_out


def embed_ragged_corpus(values: np.ndarray, offsets: np.ndarray,
                        params: Params):
    """embed_token_corpus on the vectorized ragged walks representation
    (graph/io.load_walks_ragged) — the production `embedding` command path."""
    corpus, vocab = w2v.corpus_from_ragged(values, offsets)
    w_in, w_out = _train(corpus, len(vocab), params)
    return vocab, w_in, w_out


def output_partitions(params: Params) -> int:
    """singleOutput -> 1 file else rddPartitions files (reference Main.scala:64-69)."""
    return 1 if params.single_output else params.rdd_partitions
