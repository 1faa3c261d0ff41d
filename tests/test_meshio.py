import numpy as np
import pytest

from geobignn_tpu import geometry, meshio
from geobignn_tpu.data import synth


def test_octahedron_counts():
    m = synth.octahedron()
    assert m.n_vertices == 6 and m.n_faces == 8
    assert m.ev_indices.shape == (12, 2)  # V - E + F = 2
    # every vertex touches 4 faces and 4 vertices
    assert (m.vf_indices >= 0).sum(1).tolist() == [4] * 6
    assert (m.vv_indices >= 0).sum(1).tolist() == [4] * 6


def test_icosphere_euler():
    m = synth.icosphere(3)
    v, e, f = m.n_vertices, m.ev_indices.shape[0], m.n_faces
    assert v - e + f == 2
    assert f == 20 * 4**3


def test_grid_boundary_ragged():
    m = synth.grid_patch(4, 4)
    deg = (m.vf_indices >= 0).sum(1)
    assert deg.min() >= 1 and deg.max() <= 6
    assert m.vf_indices.min() == -1  # corners have fewer faces -> padding


def test_obj_roundtrip(tmp_path):
    m = synth.icosphere(1)
    p = tmp_path / "mesh.obj"
    meshio.write_obj(str(p), m.points, m.fv_indices)
    m2 = meshio.read_obj(str(p))
    np.testing.assert_allclose(m2.points, m.points, atol=1e-6)
    np.testing.assert_array_equal(m2.fv_indices, m.fv_indices)


def test_obj_parser_slash_and_quads(tmp_path):
    p = tmp_path / "q.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vt 0 0\nvn 0 0 1\n"
        "f 1/1/1 2/1/1 3/1/1 4/1/1\n"
    )
    m = meshio.read_obj(str(p))
    assert m.n_faces == 2  # quad fan-triangulated
    assert m.n_vertices == 4


def test_face_normals_octahedron():
    m = synth.octahedron()
    n = geometry.face_normals_np(m.points, m.fv_indices)
    expected0 = np.array([1, 1, 1], dtype=np.float32) / np.sqrt(3)
    np.testing.assert_allclose(n[0], expected0, atol=1e-6)
    # all normals point outward (positive dot with face centroid)
    cent = m.points[m.fv_indices].mean(1)
    assert ((n * cent).sum(1) > 0).all()


def test_vertex_normals_sphere():
    m = synth.icosphere(4)
    vn = geometry.vertex_normals_np(m.points, m.fv_indices)
    # on a sphere, vertex normal ~ radial direction
    radial = m.points / np.linalg.norm(m.points, axis=1, keepdims=True)
    cos = (vn * radial).sum(1)
    assert cos.min() > 0.999


def test_center_and_scale_modes():
    m = synth.icosphere(2, radius=3.0)
    pts = m.points + np.float32([5.0, -2.0, 1.0])
    for s_type in range(4):
        scaled, centroid, scale = geometry.center_and_scale_np(
            pts, m.ev_indices, s_type
        )
        np.testing.assert_allclose(centroid.ravel(), [5, -2, 1], atol=1e-3)
        # round trip
        np.testing.assert_allclose(scaled / scale + centroid, pts, atol=1e-4)
    # s_type 0: unit mean edge length after scaling
    scaled, _, _ = geometry.center_and_scale_np(pts, m.ev_indices, 0)
    assert geometry.mean_edge_length_np(scaled, m.ev_indices) == pytest.approx(
        1.0, abs=1e-4
    )


def test_bilateral_weights_range():
    m = synth.add_noise(synth.icosphere(2), 0.1)
    from geobignn_tpu import graphs

    ei = graphs.build_vertex_graph_1ring(m.ev_indices, m.n_vertices)
    vn = geometry.vertex_normals_np(m.points, m.fv_indices)
    ei_sl = graphs.with_self_loops(ei, m.n_vertices)
    w = geometry.bilateral_edge_weights_np(m.points, vn, ei_sl)
    assert w.shape == (ei_sl.shape[1],)
    assert (w > 0).all() and (w <= 1.0 + 1e-6).all()
    # self-loop entries: dn=1, dp=exp(0)=1
    np.testing.assert_allclose(w[ei.shape[1]:], 1.0, atol=1e-6)
