"""CLI / config / pipeline dispatch tests — covering what the reference suite never
did (Main/CLI dispatch, save formats; SURVEY.md §4 "Not tested")."""

import os

import numpy as np

from stellar_rw_tpu import cli
from stellar_rw_tpu.models import node2vec as n2v
from stellar_rw_tpu.utils import config


def test_parse_defaults_and_required(karate_path):
    p = config.parse(["--cmd", "node2vec", "--input", karate_path, "--output", "/tmp/o"])
    assert p is not None
    # defaults mirror reference Params.scala:7-23
    assert (p.w2v_iter, p.w2v_lr, p.w2v_partitions, p.w2v_dim, p.w2v_window) == \
        (10, 0.025, 1, 128, 10)
    assert (p.walk_length, p.num_walks, p.p, p.q) == (80, 10, 1.0, 1.0)
    assert p.weighted and not p.directed and p.single_output and not p.partitioned
    assert p.rdd_partitions == 200
    # missing required flags -> parse failure (None), like scopt
    assert config.parse(["--cmd", "node2vec"]) is None
    assert config.parse(["--cmd", "bogus", "--input", "x", "--output", "y"]) is None


def test_parse_all_flags(karate_path):
    p = config.parse([
        "--cmd", "randomwalk", "--input", karate_path, "--output", "/tmp/o",
        "--walkLength", "5", "--numWalks", "2", "--p", "0.25", "--q", "4.0",
        "--rddPartitions", "8", "--weighted", "false", "--directed", "true",
        "--singleOutput", "false", "--w2vPartitions", "2", "--partitioned", "true",
        "--lr", "0.1", "--iter", "3", "--dim", "16", "--window", "4",
    ])
    assert p.walk_length == 5 and p.num_walks == 2 and p.p == 0.25 and p.q == 4.0
    assert p.rdd_partitions == 8 and not p.weighted and p.directed
    assert not p.single_output and p.w2v_partitions == 2 and p.partitioned
    assert p.w2v_lr == 0.1 and p.w2v_iter == 3 and p.w2v_dim == 16 and p.w2v_window == 4


def test_randomwalk_cmd(tmp_path, karate_path):
    p = config.parse([
        "--cmd", "randomwalk", "--input", karate_path, "--output", str(tmp_path),
        "--walkLength", "5", "--numWalks", "2", "--weighted", "false",
    ])
    cli.run_job(p)
    lines = open(tmp_path / "path" / "part-00000").read().splitlines()
    assert len(lines) == 2 * 34  # numWalks * |V| (reference README.md:146)
    for ln in lines:
        assert 1 <= len(ln.split("\t")) <= 7


def test_node2vec_cmd_and_model_roundtrip(tmp_path, karate_path):
    p = config.parse([
        "--cmd", "node2vec", "--input", karate_path, "--output", str(tmp_path),
        "--walkLength", "5", "--numWalks", "2", "--weighted", "false",
        "--dim", "8", "--iter", "2", "--window", "3",
    ])
    cli.run_job(p)
    assert os.path.isdir(tmp_path / "path")
    vec_lines = open(tmp_path / "vec" / "part-00000").read().splitlines()
    assert len(vec_lines) == 34
    assert all(len(l.split("\t")) == 9 for l in vec_lines)  # id + 8 dims
    tokens, w_in, w_out = n2v.load_model(str(tmp_path))
    assert w_in.shape == (34, 8) and w_out.shape == (34, 8)
    assert sorted(int(t) for t in tokens) == list(range(1, 35))


def test_embedding_cmd(tmp_path, karate_path):
    # first produce walks, then retrain from the corpus on disk
    p1 = config.parse([
        "--cmd", "randomwalk", "--input", karate_path, "--output", str(tmp_path),
        "--walkLength", "5", "--numWalks", "2", "--weighted", "false",
    ])
    cli.run_job(p1)
    out2 = tmp_path / "stage2"
    p2 = config.parse([
        "--cmd", "embedding", "--input", str(tmp_path / "path"),
        "--output", str(out2), "--dim", "8", "--iter", "2", "--window", "3",
    ])
    cli.run_job(p2)
    vec_lines = open(out2 / "vec" / "part-00000").read().splitlines()
    assert len(vec_lines) == 34


def test_sharded_cli_matches_single_chip(tmp_path, karate_path):
    """--shards > 1 runs the shard_map engine from the CLI and the written corpus
    is bitwise identical to the single-chip run (reference dispatches across
    rddPartitions in every run, RandomWalk.scala:186-192)."""
    args = ["--cmd", "randomwalk", "--input", karate_path,
            "--walkLength", "6", "--numWalks", "2", "--weighted", "false"]
    out1, out4 = tmp_path / "s1", tmp_path / "s4"
    cli.run_job(config.parse(args + ["--output", str(out1), "--shards", "1"]))
    cli.run_job(config.parse(args + ["--output", str(out4), "--shards", "4"]))
    a = open(out1 / "path" / "part-00000").read()
    b = open(out4 / "path" / "part-00000").read()
    assert a == b


def test_partitioned_cli_uses_vcut_home_routing(tmp_path, karate_path):
    """--partitioned true loads the explicit partition column, routes walkers by
    their home partition (reference VCutRandomWalk.scala:92-134), and still
    produces the single-chip corpus bitwise (routing never changes the walks)."""
    # karate with an explicit partition id column: pid = src % 3
    part_file = tmp_path / "karate_part.txt"
    with open(karate_path) as f, open(part_file, "w") as g:
        for line in f:
            toks = line.split()
            if len(toks) >= 2:
                g.write(f"{toks[0]} {toks[1]} {int(toks[0]) % 3}\n")
    base = ["--cmd", "randomwalk", "--walkLength", "5", "--numWalks", "1",
            "--weighted", "false", "--seed", "9"]
    out_u = tmp_path / "uni"
    out_p = tmp_path / "part"
    cli.run_job(config.parse(
        base + ["--input", karate_path, "--output", str(out_u)]))
    # partitioned + rddPartitions=3 -> auto shards = min(devices, 3) = 3
    p = config.parse(base + ["--input", str(part_file), "--output", str(out_p),
                             "--partitioned", "true", "--rddPartitions", "3"])
    assert n2v.num_walk_shards(p) == 3
    cli.run_job(p)
    a = open(out_u / "path" / "part-00000").read()
    b = open(out_p / "path" / "part-00000").read()
    assert a == b


def test_streaming_node2vec_matches_stored(tmp_path, karate_path):
    """--streaming true: one walk round in memory at a time, rounds regenerated
    per epoch from the counter-based streams. The /path output must be bitwise
    identical to the stored-corpus pipeline, and the embeddings must pass the
    same quality gates."""
    import numpy as np

    from stellar_rw_tpu.models import eval as ev
    from stellar_rw_tpu.graph import io as gio

    args = ["--cmd", "node2vec", "--input", karate_path,
            "--walkLength", "20", "--numWalks", "10", "--weighted", "false",
            "--dim", "32", "--window", "5", "--iter", "20", "--lr", "0.2",
            "--seed", "2"]
    out_a = tmp_path / "stored"
    out_b = tmp_path / "stream"
    cli.run_job(config.parse(args + ["--output", str(out_a)]))
    cli.run_job(config.parse(args + ["--output", str(out_b),
                                     "--streaming", "true"]))
    pa = open(out_a / "path" / "part-00000").read()
    pb = open(out_b / "path" / "part-00000").read()
    assert pa == pb
    tokens, w_in, _ = n2v.load_model(str(out_b))
    g = gio.load_edge_list(karate_path, weighted=False, directed=False)
    edges = [(v, int(d)) for v in range(g.num_vertices)
             for d in g.neighbors(v)[0] if v < int(d)]
    auc = ev.link_prediction_auc(w_in, np.asarray(edges), g.num_vertices, seed=0)
    acc = ev.node_classification_accuracy(w_in, ev.karate_labels(g.ids), seed=0)
    assert auc > 0.7 and acc >= 0.85, (auc, acc)


def test_multi_file_output(tmp_path, karate_path):
    p = config.parse([
        "--cmd", "randomwalk", "--input", karate_path, "--output", str(tmp_path),
        "--walkLength", "3", "--numWalks", "1", "--weighted", "false",
        "--singleOutput", "false", "--rddPartitions", "4",
    ])
    cli.run_job(p)
    files = sorted(os.listdir(tmp_path / "path"))
    assert files == [f"part-{i:05d}" for i in range(4)]


def test_sharded_streaming_matches_single_chip_streaming(tmp_path, karate_path):
    """--streaming true --shards 4: rounds come from the sharded engine; the
    /path output and the trained vectors must be bitwise identical to
    single-chip streaming (rounds are bitwise equal, trainer is identical)."""
    import numpy as np

    args = ["--cmd", "node2vec", "--input", karate_path,
            "--walkLength", "15", "--numWalks", "4", "--weighted", "false",
            "--dim", "16", "--window", "4", "--iter", "3", "--seed", "6",
            "--streaming", "true"]
    out_a = tmp_path / "s1"
    out_b = tmp_path / "s4"
    out_c = tmp_path / "s4streamed"
    cli.run_job(config.parse(args + ["--output", str(out_a)]))
    cli.run_job(config.parse(args + ["--output", str(out_b), "--shards", "4"]))
    # --streaming combined with --streamed: the memory-bounded pipeline uses
    # the shard-at-a-time builder (round-4 verdict weak item 4)
    cli.run_job(config.parse(args + ["--output", str(out_c), "--shards", "4",
                                     "--streamed", "true"]))
    pa = open(out_a / "path" / "part-00000").read()
    pb = open(out_b / "path" / "part-00000").read()
    pc = open(out_c / "path" / "part-00000").read()
    assert pa == pb
    assert pa == pc
    _, wa, _ = n2v.load_model(str(out_a))
    _, wb, _ = n2v.load_model(str(out_b))
    _, wc, _ = n2v.load_model(str(out_c))
    np.testing.assert_allclose(wa, wb, rtol=0, atol=0)
    np.testing.assert_allclose(wa, wc, rtol=0, atol=0)


def test_cli_lanes_corpus_identical(tmp_path, karate_path):
    """--lanes through the CLI: same corpus, fewer graph shards (per-executor
    GraphMap sharing analog) — including the streaming round-maker path."""
    outs = []
    for i, extra in enumerate((["--shards", "1"], ["--shards", "8", "--lanes", "2"])):
        out = str(tmp_path / f"o{i}")
        cli.run_job(config.parse([
            "--cmd", "randomwalk", "--input", karate_path, "--output", out,
            "--walkLength", "7", "--numWalks", "2", "--weighted", "false",
        ] + extra))
        outs.append(open(os.path.join(out, "path", "part-00000")).read())
    assert outs[0] == outs[1]


def test_streamed_flag_cli(tmp_path, karate_path):
    """--streamed true routes the sharded engine through the shard-at-a-time
    builder with an identical corpus."""
    from stellar_rw_tpu import cli
    from stellar_rw_tpu.utils import config

    outs = []
    for out, flag in [(tmp_path / "a", "false"), (tmp_path / "b", "true")]:
        cli.run_job(config.parse(
            ["--cmd", "randomwalk", "--input", karate_path, "--output",
             str(out), "--walkLength", "6", "--numWalks", "2",
             "--weighted", "false", "--shards", "4", "--streamed", flag]))
        outs.append((out / "path" / "part-00000").read_text())
    assert outs[0] == outs[1]


def test_checkpointed_streamed_walks(tmp_path, karate_path):
    """--checkpointEvery combined with --streamed: the checkpointed round-maker
    uses the shard-at-a-time builder with an identical corpus (round-4 advisor
    finding: --streamed was silently ignored on the checkpointed path)."""
    outs = []
    for out, flag in [(tmp_path / "a", "false"), (tmp_path / "b", "true")]:
        cli.run_job(config.parse(
            ["--cmd", "randomwalk", "--input", karate_path, "--output",
             str(out), "--walkLength", "6", "--numWalks", "3",
             "--weighted", "false", "--shards", "4", "--streamed", flag,
             "--checkpointEvery", "2"]))
        assert (out / "bin" / "walk_rounds" / "round-00002.npy").exists()
        outs.append((out / "path" / "part-00000").read_text())
    assert outs[0] == outs[1]
