import numpy as np

from geobignn_tpu import graphs
from geobignn_tpu.data import synth


def _edge_set(ei):
    return set(map(tuple, ei.T.tolist()))


def test_vertex_graph_symmetric_no_loops():
    m = synth.icosphere(2)
    ei = graphs.build_vertex_graph_1ring(m.ev_indices, m.n_vertices)
    es = _edge_set(ei)
    assert all((j, i) in es for i, j in es)
    assert all(i != j for i, j in es)
    assert ei.shape[1] == 2 * m.ev_indices.shape[0]


def test_facet_graph_octahedron():
    m = synth.octahedron()
    ei = graphs.build_facet_graph(m.fv_indices, m.vf_indices)
    es = _edge_set(ei)
    assert all((j, i) in es for i, j in es)
    assert all(i != j for i, j in es)
    # octahedron: every face shares a vertex with 6 of the other 7 faces
    # (only the antipodal face is not adjacent)
    deg = np.bincount(ei[0], minlength=8)
    assert deg.tolist() == [6] * 8


def test_vertex_graph_2ring_superset_of_1ring():
    m = synth.icosphere(1)
    e1 = _edge_set(graphs.build_vertex_graph_1ring(m.ev_indices, m.n_vertices))
    e2 = _edge_set(graphs.build_vertex_graph_2ring(m.ev_indices, m.vv_indices))
    assert e1 <= e2
    assert len(e2) > len(e1)


def test_edge_fv_vf():
    m = synth.octahedron()
    fv = graphs.build_edge_fv(m.fv_indices)
    assert fv.shape == (2, 3 * m.n_faces)
    vf = graphs.build_edge_vf(m.vf_indices)
    assert vf.shape == (2, 3 * m.n_faces)  # same incidences, transposed roles
    assert set(zip(fv[0], fv[1])) == set(zip(vf[1], vf[0]))


def test_grow_patch_full_and_capped():
    m = synth.icosphere(3)
    patch = graphs.grow_patch(m.fv_indices, m.vf_indices, 0, max_faces=100)
    assert len(patch) == 100
    assert len(set(patch.tolist())) == 100
    full = graphs.grow_patch(m.fv_indices, m.vf_indices, 0, max_faces=10**9)
    assert len(full) == m.n_faces  # connected mesh fully visited
    ring1 = graphs.grow_patch(m.fv_indices, m.vf_indices, 0, max_rings=1)
    assert 0 in ring1 and len(ring1) > 1


def test_extract_submesh_roundtrip():
    m = synth.icosphere(3)
    sel = graphs.grow_patch(m.fv_indices, m.vf_indices, 5, max_faces=200)
    v_idx, f_new = graphs.extract_submesh(m.fv_indices, sel)
    # new faces reference the same geometry
    np.testing.assert_allclose(
        m.points[v_idx][f_new], m.points[m.fv_indices[sel].astype(np.int64)]
    )
    # v_idx has no duplicates and f_new is dense 0..len(v_idx)-1
    assert len(set(v_idx.tolist())) == len(v_idx)
    assert f_new.max() == len(v_idx) - 1 and f_new.min() == 0
    # first-occurrence order: first face's corners come first
    np.testing.assert_array_equal(v_idx[:3], m.fv_indices[sel[0]])


def test_partition_covers_mesh_with_overlap():
    m = synth.icosphere(4)  # 5120 faces
    sub = 1000
    covered = np.zeros(m.n_faces, dtype=bool)
    cent = m.points[m.fv_indices].mean(1)
    centroid = m.points.mean(0)
    seed = int(np.argmax(((cent - centroid) ** 2).sum(1)))
    n_patches = 0
    while True:
        sel = graphs.grow_patch(m.fv_indices, m.vf_indices, seed, max_faces=sub)
        covered[sel] = True
        n_patches += 1
        left = np.where(~covered)[0]
        if left.size == 0:
            break
        seed = int(left[np.argmax(((cent[left] - centroid) ** 2).sum(1))])
    assert covered.all()
    assert n_patches >= m.n_faces // sub
