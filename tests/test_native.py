"""Native C++ graph builder: bit-identical to the pure-Python loaders."""

import numpy as np
import pytest

from stellar_rw_tpu.graph import io

native = pytest.importorskip("stellar_rw_tpu.native")
if not native.available():
    pytest.skip("no C++ toolchain", allow_module_level=True)

FIELDS = ["ids", "offsets", "cols", "weights", "alias_prob", "alias_pos",
          "hash_offsets", "hash_mask", "hash_table"]


def _python_graph(path, **kw):
    g = io.load_edge_list(path, use_native=False, **kw)
    g.build_alias_tables()
    g.build_hash_tables()
    return g


@pytest.mark.parametrize("directed", [False, True])
def test_native_matches_python(karate_path, directed):
    gn, _ = native.build_graph(karate_path, weighted=False, directed=directed)
    gp = _python_graph(karate_path, weighted=False, directed=directed)
    for f in FIELDS:
        np.testing.assert_array_equal(getattr(gn, f), getattr(gp, f), err_msg=f)


def test_native_weight_and_junk_parsing(tmp_path):
    f = tmp_path / "g.txt"
    f.write_text("1 2 0.5\n2 3 junk\n3 4\n")
    gn, _ = native.build_graph(str(f), weighted=True, directed=True)
    gp = _python_graph(str(f), weighted=True, directed=True)
    for fl in FIELDS:
        np.testing.assert_array_equal(getattr(gn, fl), getattr(gp, fl), err_msg=fl)


def test_native_partitioned_home(tmp_path):
    f = tmp_path / "g.txt"
    f.write_text("1 2 0 2.0\n2 3 1 3.0\n4 1 1\n")
    gn, home = native.build_graph(str(f), weighted=True, directed=False,
                                  partitioned=True, num_partitions=4)
    idx = {int(o): i for i, o in enumerate(gn.ids)}
    assert home[idx[1]] == 0 and home[idx[2]] == 0
    assert home[idx[3]] == 1 and home[idx[4]] == 1
    # weight needs >3 cols when partitioned
    cols, w = gn.neighbors(idx[4])
    assert w[0] == 1.0


def test_loader_auto_uses_native(karate_path):
    g = io.load_edge_list(karate_path, weighted=False, directed=False)
    # native path pre-populates alias + hash tables
    assert g.alias_prob is not None and g.hash_table is not None
    assert g.num_vertices == 34 and g.num_edges == 156
