"""CLI entry point: the TPU-native `Main` (reference Main.scala:18-27,109-127).

Same three subcommands dispatched on --cmd:
  node2vec   : walks + skip-gram, writes /path, /vec, /bin
  randomwalk : walks only, writes /path
  embedding  : reads a walks file from --input, trains skip-gram, writes /vec, /bin

Usage example (flag surface identical to the reference spark-submit app):
  python -m stellar_rw_tpu --cmd node2vec --input graph.txt --output out \
      --walkLength 80 --numWalks 10 --p 1.0 --q 1.0 --dim 128 --window 10
"""

from __future__ import annotations

import logging
import sys
import time

import numpy as np

from .graph import io as gio
from .models import node2vec as n2v
from .utils.config import Params, TaskName, parse

logger = logging.getLogger("stellar_rw_tpu")


def _load_graph(params: Params):
    """-> (graph, home): home = per-vertex home partition for VCut routing
    (reference VCutRandomWalk.scala:92-97), None on the uniform path."""
    if params.partitioned:
        return gio.load_edge_list_partitioned(
            params.input, weighted=params.weighted, directed=params.directed,
            partitioned=True, num_partitions=params.rdd_partitions, seed=params.seed)
    g = gio.load_edge_list(
        params.input, weighted=params.weighted, directed=params.directed)
    return g, None


def do_random_walk(params: Params) -> tuple[np.ndarray, "gio.csr.CSRGraph"]:
    """Load graph, run walks, save corpus (reference Main.doRandomWalk:53-62)."""
    t0 = time.time()
    graph, home = _load_graph(params)
    # graph stats logging, the reference's V/E accumulators (UniformRandomWalk.scala:67-79)
    logger.info("vertices: %d", graph.num_vertices)
    logger.info("edges: %d", graph.num_edges)
    print(f"vertices: {graph.num_vertices}")
    print(f"edges: {graph.num_edges}")
    walks = n2v.run_walks(graph, params, home)
    dt = time.time() - t0
    walks_np = np.asarray(walks)  # one D2H view for stats + /path output; the
    #                               device buffer (if any) flows to the trainer
    from .utils.stats import walk_stats
    ws = walk_stats(walks_np)
    print(f"walks: {ws.num_paths} paths, {ws.num_steps} steps in {dt:.2f}s "
          f"({ws.num_steps / max(dt, 1e-9):,.0f} steps/s)")
    # the reference's per-run diagnostics (Zero Neighbors dead-end counter,
    # RandomWalk.scala:155-160); Wrong Transports cannot occur by construction
    print(f"Zero Neighbors: {ws.dead_ends}  (isolated starts: {ws.isolated_starts}, "
          f"full paths: {ws.full_paths}, mean length: {ws.mean_length:.1f})")
    logger.info("walk stats: %s", ws.as_dict())
    # corpus-size invariant, warned (not failed) like the reference's per-round
    # path-count check (RandomWalk.scala:164-167)
    expect = params.num_walks * graph.num_vertices
    if ws.num_paths != expect:
        logger.warning("corpus has %d paths, expected numWalks*|V| = %d",
                       ws.num_paths, expect)
    if params.validate:
        from .utils.stats import validate_walks
        validate_walks(walks_np, graph)
        print("walk invariants: ok")
    gio.save_walks(walks_np, graph, params.output, n2v.output_partitions(params))
    return walks, graph


def run_job(params: Params) -> str:
    if params.cmd == TaskName.node2vec and params.streaming:
        # memory-bounded pipeline: one walk round resident at a time
        graph, home = _load_graph(params)
        print(f"vertices: {graph.num_vertices}")
        print(f"edges: {graph.num_edges}")
        tokens, w_in, w_out, ws = n2v.run_node2vec_streaming(graph, params, home)
        print(f"walks (streamed): {ws.num_paths} paths, {ws.num_steps} steps")
        print(f"Zero Neighbors: {ws.dead_ends}  (isolated starts: "
              f"{ws.isolated_starts}, full paths: {ws.full_paths}, "
              f"mean length: {ws.mean_length:.1f})")
        n2v.save_model(params.output, tokens, w_in, w_out, params)
        gio.save_vectors(np.asarray(tokens), w_in, params.output,
                         n2v.output_partitions(params))
    elif params.cmd == TaskName.node2vec:
        walks, graph = do_random_walk(params)
        tokens, w_in, w_out = n2v.embed_walks(walks, graph, params)
        n2v.save_model(params.output, tokens, w_in, w_out, params)
        gio.save_vectors(np.asarray(tokens), w_in, params.output,
                         n2v.output_partitions(params))
    elif params.cmd == TaskName.randomwalk:
        do_random_walk(params)
    elif params.cmd == TaskName.embedding:
        # vectorized walks-file ingest (ragged arrays): the per-token Python
        # reader costs hours at the reference-default corpus (Main.scala:119-121)
        values, offsets = gio.load_walks_ragged(params.input)
        tokens, w_in, w_out = n2v.embed_ragged_corpus(values, offsets, params)
        n2v.save_model(params.output, tokens, w_in, w_out, params)
        gio.save_vectors(np.asarray(tokens), w_in, params.output,
                         n2v.output_partitions(params))
    return params.output


def main(argv: list[str] | None = None) -> int:
    params = parse(sys.argv[1:] if argv is None else argv)
    if params is None:
        return 1
    # console + optional rolling-file logging (the reference's log4j appenders,
    # src/main/resources/log4j.properties; SURVEY.md §5.5)
    from .utils.logging import configure
    configure(params.log_dir)
    # multi-host: join the jax.distributed process group when SRW_COORDINATOR /
    # SRW_NUM_PROCESSES are set (one process per host; see parallel/multihost.py)
    from .parallel.multihost import maybe_initialize_from_env
    maybe_initialize_from_env()
    print(params)
    if params.profile_dir:
        import jax
        with jax.profiler.trace(params.profile_dir):
            run_job(params)
    else:
        run_job(params)
    return 0


if __name__ == "__main__":
    sys.exit(main())
