"""Multi-host (multi-process) execution: 2 real processes x 4 CPU devices each
form one 8-device global mesh over jax.distributed (Gloo), run the sharded walk
engine, and each process keeps exactly its own corpus rows — the closest
one-machine analog of the reference running on a real Spark cluster (no
multi-JVM test exists in the reference at all, SURVEY.md §4 "Not tested").

The corpus reassembled from the two processes' local blocks must be bitwise
identical to the single-chip engine."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from stellar_rw_tpu.graph import io
from stellar_rw_tpu.walk import engine

WORKER = r"""
import json, os, sys
sys.path = [p for p in sys.path if '.axon_site' not in p]
os.environ['JAX_PLATFORMS'] = 'cpu'
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 4)
# match the parent test process (tests/conftest.py): with x64 the counter-based
# uniform streams are float64, and walk parity is bit-exact only at equal dtypes
jax.config.update('jax_enable_x64', True)
pid, nproc, port, karate = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
lanes = int(sys.argv[5])
from stellar_rw_tpu.parallel import multihost
ok = multihost.initialize(coordinator=f'127.0.0.1:{port}',
                          num_processes=nproc, process_id=pid)
assert ok and jax.process_count() == nproc
from stellar_rw_tpu.graph import io
g = io.load_edge_list(karate, weighted=False, directed=False)
blocks, diag = multihost.multihost_random_walks(
    g, walk_length=8, num_walks=2, p=0.5, q=2.0, seed=13, num_shards=8,
    lanes=lanes)
out = [[start, rows.tolist()] for start, rows in blocks]
print('RESULT ' + json.dumps({'pid': pid, 'blocks': out,
                              'diag_rows': int(diag.shape[0])}), flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.parametrize("lanes", [1, 2])
def test_two_process_corpus_matches_single_chip(karate_path, tmp_path, lanes):
    # lanes=2: 4 graph shards x 2 lanes; consecutive-device lane groups keep
    # each replicated shard inside one process (the per-host sharing domain)
    port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=os.getcwd())
    procs = [subprocess.Popen(
        [sys.executable, "-c", WORKER, str(i), "2", str(port), karate_path,
         str(lanes)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        if p.returncode != 0:
            if "distributed" in err.lower() and "initialize" in err.lower():
                pytest.skip(f"jax.distributed unavailable: {err[-300:]}")
            pytest.fail(f"worker failed:\n{err[-2000:]}")
        outs.append(out)

    g = io.load_edge_list(karate_path, weighted=False, directed=False)
    single = engine.random_walks(
        g, walk_length=8, num_walks=2, p=0.5, q=2.0, seed=13,
        sampler="rejection")
    W, S, R = g.num_vertices, 8, 2
    W_pad = -(-W // S) * S
    L2 = single.shape[1]
    # padded global corpus the shards slice into
    expect = np.full((R, W_pad, L2), -1, dtype=single.dtype)
    expect[:, :W] = single.reshape(R, W, L2)
    expect = expect.reshape(R * W_pad, L2)

    got = np.full_like(expect, -2)
    rows_seen = 0
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("RESULT ")][0]
        rec = json.loads(line[len("RESULT "):])
        for start, rows in rec["blocks"]:
            rows = np.asarray(rows, dtype=expect.dtype)
            got[start:start + len(rows)] = rows
            rows_seen += len(rows)
    assert rows_seen == R * W_pad  # the two processes exactly tile the corpus
    np.testing.assert_array_equal(got, expect)
