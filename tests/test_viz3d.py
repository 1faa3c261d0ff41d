"""Self-contained HTML viewer export."""

import json
import re

import numpy as np

from geobignn_tpu import viz3d
from geobignn_tpu.data import synth
from geobignn_tpu.graphs import build_vertex_graph_1ring, weighted_graph
from geobignn_tpu.geometry import vertex_normals_np
from geobignn_tpu.pool.hierarchy import build_hierarchy


def _data_of(path):
    html = open(path).read()
    m = re.search(r"const DATA = (\{.*?\});\n", html, re.S)
    return html, json.loads(m.group(1))


def test_mesh_viewer(tmp_path):
    m = synth.icosphere(2)
    err = np.linalg.norm(m.points, axis=1)
    out = viz3d.write_html_viewer(
        str(tmp_path / "mesh.html"), m.points, m.fv_indices, vertex_values=err
    )
    html, data = _data_of(out)
    assert "<canvas" in html
    assert len(data["points"]) == m.n_vertices
    assert len(data["faces"]) == m.n_faces
    assert len(data["vert_vals"]) == m.n_vertices
    assert max(data["vert_vals"]) <= 1.0 and min(data["vert_vals"]) >= 0.0


def test_pool_hierarchy_export(tmp_path):
    m = synth.icosphere(3)
    ei = build_vertex_graph_1ring(m.ev_indices, m.n_vertices)
    vn = vertex_normals_np(m.points, m.fv_indices)
    _, w = weighted_graph(ei, m.n_vertices, m.points, vn)
    x = np.concatenate([m.points, vn], axis=1).astype(np.float32)
    specs = build_hierarchy(ei, w, x, m.n_vertices)
    out = viz3d.export_pool_hierarchy(
        str(tmp_path / "pool.html"), m.points, m.fv_indices, ei, specs
    )
    _, data = _data_of(out)
    names = [g["name"] for g in data["graphs"]]
    assert names == ["graph L1", "graph L2", "graph L3"]
    # coarse levels shrink
    sizes = [len(g["points"]) for g in data["graphs"]]
    assert sizes[0] > sizes[1] > sizes[2]
    # every edge endpoint is a valid node id
    for g in data["graphs"]:
        n = len(g["points"])
        assert all(0 <= a < n and 0 <= b < n for a, b in g["edges"])
