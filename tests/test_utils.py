import math

import jax.numpy as jnp
import numpy as np
import pytest

from geobignn_tpu.models import losses
from geobignn_tpu.utils import batch_quat_to_rotmat, icp_align


def test_quat_identity_and_rotation():
    r = batch_quat_to_rotmat(jnp.array([[1.0, 0, 0, 0]]))
    np.testing.assert_allclose(np.asarray(r[0]), np.eye(3), atol=1e-6)
    q = jnp.array([[math.cos(math.pi / 4), 0, 0, math.sin(math.pi / 4)]])
    r = np.asarray(batch_quat_to_rotmat(q)[0])
    np.testing.assert_allclose(r @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-6)
    # unnormalized quaternion normalizes
    r2 = np.asarray(batch_quat_to_rotmat(q * 3.0)[0])
    np.testing.assert_allclose(r, r2, atol=1e-6)


def test_icp_recovers_rigid_transform():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(400, 3)).astype(np.float32)
    a = math.radians(12)
    rot = np.array(
        [[math.cos(a), -math.sin(a), 0], [math.sin(a), math.cos(a), 0], [0, 0, 1]],
        dtype=np.float32,
    )
    dst = pts @ rot.T + np.float32([0.1, -0.05, 0.2])
    aligned, r_est, t_est = icp_align(jnp.asarray(pts), jnp.asarray(dst))
    assert float(np.abs(np.asarray(aligned) - dst).max()) < 1e-4
    np.testing.assert_allclose(np.asarray(r_est), rot, atol=1e-4)


def test_loss_v_with_icp_ignores_rigid_motion():
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.normal(size=(300, 3)).astype(np.float32))
    a = math.radians(5)
    rot = jnp.asarray(
        np.array(
            [[math.cos(a), -math.sin(a), 0], [math.sin(a), math.cos(a), 0], [0, 0, 1]],
            dtype=np.float32,
        )
    )
    vp = v @ rot.T + jnp.asarray([0.05, 0.0, -0.02])
    mask = jnp.ones(300)
    plain = losses.loss_v(vp, v, mask, "L1")
    aligned = losses.loss_v(vp, v, mask, "L1", apply_icp=True)
    assert float(aligned) < 0.01 * float(plain)


@pytest.mark.parametrize("metric", ["euclidean", "manhattan", "chebyshev", "cosine"])
def test_nearest_distance_metrics(metric):
    a = jnp.array([[1.0, 0.0, 0.0]])
    b = jnp.array([[0.0, 2.0, 0.0], [2.0, 0.0, 0.0]])
    d = float(losses.nearest_distance(a, b, block=1, metric=metric)[0])
    expected = {
        "euclidean": 1.0,
        "manhattan": 1.0,
        "chebyshev": 1.0,
        "cosine": 0.0,  # (1,0,0) vs (2,0,0) are colinear
    }[metric]
    assert d == pytest.approx(expected, abs=1e-5)


def test_gt_transfer(tmp_path):
    from geobignn_tpu import meshio
    from geobignn_tpu.data import synth
    from geobignn_tpu.infer.gt_transfer import process_gt_transfer

    m = synth.icosphere(1)
    nd, od, fd = tmp_path / "n", tmp_path / "o", tmp_path / "f"
    for d in (nd, od, fd):
        d.mkdir()
    meshio.write_obj(str(od / "M.obj"), m.points, m.fv_indices)
    noisy = synth.add_noise(m, 0.1, seed=0)
    meshio.write_obj(str(nd / "M_n1.obj"), noisy.points, noisy.fv_indices)
    meshio.write_obj(str(fd / "M_n1.obj"), m.points, m.fv_indices)  # "filtered"
    out = process_gt_transfer(str(nd), str(od), str(fd))
    assert len(out) == 3
    for p in out:
        assert open(p).readline().strip() == "OFF"


def test_plot_pool_levels(tmp_path):
    """Pooled-graph debug plots: one PNG per hierarchy level."""
    import numpy as np

    from geobignn_tpu import graphs, viz
    from geobignn_tpu.data import synth
    from geobignn_tpu.pool.hierarchy import build_hierarchy

    m = synth.icosphere(1)
    ei = graphs.build_vertex_graph_1ring(m.ev_indices, m.n_vertices)
    _, w = graphs.weighted_graph(ei, m.n_vertices, m.points,
                                 np.ones_like(m.points))
    x = np.concatenate([m.points, np.ones_like(m.points)], axis=1).astype(np.float32)
    specs = build_hierarchy(ei, w, x, m.n_vertices)
    paths = viz.plot_pool_levels(m.points, ei, specs,
                                 path_prefix=str(tmp_path / "pool"))
    assert len(paths) == len(specs) + 1
    for p in paths:
        assert (tmp_path / p.split("/")[-1]).stat().st_size > 0
