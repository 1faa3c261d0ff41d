"""Native C++ kernel vs numpy-reference parity."""

import numpy as np
import pytest

from geobignn_tpu import graphs, meshio, native
from geobignn_tpu.data import synth
from geobignn_tpu.pool import hierarchy as H

pytestmark = pytest.mark.skipif(not native.HAS_NATIVE, reason="no native lib")


def test_permutation_is_permutation():
    p = native.permutation(1000, seed=3)
    assert sorted(p.tolist()) == list(range(1000))
    p2 = native.permutation(1000, seed=3)
    np.testing.assert_array_equal(p, p2)  # deterministic
    assert not np.array_equal(p, native.permutation(1000, seed=4))


def test_greedy_matching_native_matches_python():
    m = synth.add_noise(synth.icosphere(3), 0.2, seed=0)
    ei = graphs.build_vertex_graph_1ring(m.ev_indices, m.n_vertices)
    _, w = graphs.weighted_graph(ei, m.n_vertices, m.points,
                                 np.ones_like(m.points))
    order = native.permutation(m.n_vertices, seed=1)
    ptr, col, perm = H._csr(ei, m.n_vertices)
    got = native.greedy_matching_csr(ptr, col, w[perm], order)
    want = H._greedy_matching_py(ptr, col, w[perm], order, m.n_vertices, 0)
    np.testing.assert_array_equal(got, want)
    # every cluster has size 1 or 2 (it is a matching)
    _, counts = np.unique(got, return_counts=True)
    assert counts.max() <= 2
    # most nodes matched on a mesh graph
    assert (counts == 2).sum() * 2 > 0.8 * m.n_vertices


def test_grow_patch_native_matches_numpy():
    m = synth.icosphere(3)
    for seed_face, cap in [(0, 100), (5, 1000), (17, 10**9)]:
        a = native.grow_patch(m.fv_indices, m.vf_indices, seed_face, cap, None)
        # numpy reference path (bypass dispatch)
        import geobignn_tpu.native as nat

        saved = nat.HAS_NATIVE
        nat.HAS_NATIVE = False
        try:
            b = graphs.grow_patch(m.fv_indices, m.vf_indices, seed_face, cap)
        finally:
            nat.HAS_NATIVE = saved
        np.testing.assert_array_equal(a, b)


def test_native_obj_parser_matches_python(tmp_path):
    m = synth.icosphere(2)
    p = tmp_path / "m.obj"
    meshio.write_obj(str(p), m.points, m.fv_indices)
    got = native.read_obj_arrays(str(p))
    assert got is not None
    np.testing.assert_allclose(got[0], m.points, atol=1e-6)
    np.testing.assert_array_equal(got[1], m.fv_indices)
    # slash syntax + quads + negative indices
    q = tmp_path / "q.obj"
    q.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "f 1/1/1 2/1/1 3/1/1 4/1/1\nf -1 -2 -3\n"
    )
    verts, tris = native.read_obj_arrays(str(q))
    assert verts.shape == (4, 3)
    assert tris.tolist() == [[0, 1, 2], [0, 2, 3], [3, 2, 1]]
