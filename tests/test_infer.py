import numpy as np
import jax.numpy as jnp
import pytest

from geobignn_tpu import geometry, meshio
from geobignn_tpu.config import Config
from geobignn_tpu.data import synth
from geobignn_tpu.data.builder import BuildConfig
from geobignn_tpu.data.dataset import InMemoryDataset
from geobignn_tpu.infer.predict import Predictor, update_positions
from geobignn_tpu.train import Trainer

pytestmark = pytest.mark.slow



def test_update_positions_oracle():
    """The reference's own oracle (code/data_util.py:973): integrating the
    GROUND-TRUTH normal field must pull noisy vertices toward the clean
    surface."""
    m_o = synth.icosphere(3)
    m_n = synth.add_noise(m_o, 0.25, seed=2)
    gt_normals = geometry.face_normals_np(m_o.points, m_o.fv_indices)
    v = update_positions(
        jnp.asarray(m_n.points),
        jnp.asarray(m_n.fv_indices),
        jnp.asarray(m_n.vf_indices),
        jnp.asarray(gt_normals),
        n_iter=60,
    )
    before = np.abs(np.linalg.norm(m_n.points, axis=1) - 1.0).mean()
    after = np.abs(np.linalg.norm(np.asarray(v), axis=1) - 1.0).mean()
    assert after < 0.35 * before


def test_update_positions_depth_constrained():
    m_n = synth.add_noise(synth.icosphere(2), 0.2, seed=1)
    fn = geometry.face_normals_np(m_n.points, m_n.fv_indices)
    d = m_n.points / np.linalg.norm(m_n.points, axis=1, keepdims=True)
    v = update_positions(
        jnp.asarray(m_n.points), jnp.asarray(m_n.fv_indices),
        jnp.asarray(m_n.vf_indices), jnp.asarray(fn),
        n_iter=10, depth_direction=jnp.asarray(d), use_depth=True,
    )
    disp = np.asarray(v) - m_n.points
    cross = np.linalg.norm(np.cross(disp, d), axis=1)
    assert cross.max() < 1e-4  # movement only along depth rays


@pytest.fixture(scope="module")
def trained():
    m_o = synth.icosphere(2)
    m_n = synth.add_noise(m_o, 0.25, seed=5)
    ds = InMemoryDataset([(m_n, m_o)], BuildConfig(granularity=64))
    cfg = Config(max_epoch=25, lr=1e-3, seed=1, granularity=64)
    tr = Trainer(cfg, ds, ds)
    tr.fit()
    return cfg, tr.params, m_n, m_o


def test_predictor_whole_mesh(trained):
    cfg, params, m_n, m_o = trained
    pred = Predictor(cfg, params)
    v, np_arr = pred.denoise(m_n, n_update_iters=20)
    assert v.shape == m_n.points.shape and np_arr.shape == m_n.fv_indices.shape
    # denoised radius error improves over noisy input
    before = np.abs(np.linalg.norm(m_n.points, axis=1) - 1.0).mean()
    after = np.abs(np.linalg.norm(v, axis=1) - 1.0).mean()
    assert after < before


def test_predictor_stitched_matches_structure(trained):
    """Multi-patch path: overlap-averaged predictions cover every vertex."""
    cfg, params, m_n, m_o = trained
    pred = Predictor(cfg, params, sub_size=100)  # forces ~4+ patches
    vp, np_arr = pred.predict_mesh(m_n)
    assert np.isfinite(vp).all() and np.isfinite(np_arr).all()
    norms = np.linalg.norm(np_arr, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_pinned_inference_uses_snapshot(tmp_path, trained):
    """from_run (pinned, the default) must run the run's code_bak snapshot,
    not the live package — reference parity with test_dual.py:127-128.
    Proof: a marker edit to the SNAPSHOT's model shows up in predictions,
    while pinned=False (live code) is unaffected."""
    import os
    import shutil
    import sys
    import inspect

    import geobignn_tpu
    from geobignn_tpu.train.checkpoint import save_checkpoint

    cfg, params, m_n, m_o = trained
    run_dir = tmp_path / "run_pinned"
    run_dir.mkdir()
    cfg.to_json(str(run_dir / "params.json"))
    save_checkpoint(str(run_dir / "ckpt_best.pkl"), params)

    pkg_dir = os.path.dirname(os.path.abspath(geobignn_tpu.__file__))
    bak_pkg = run_dir / "code_bak" / "geobignn_tpu"
    shutil.copytree(
        pkg_dir, bak_pkg, ignore=shutil.ignore_patterns("__pycache__", "*.pyc")
    )
    # marker edit in the SNAPSHOT only: DualGNN returns constant positions
    snap_model = bak_pkg / "models" / "dual_gnn.py"
    src = snap_model.read_text()
    assert "return vert_p, norm_p" in src
    snap_model.write_text(
        src.replace("return vert_p, norm_p", "return vert_p * 0.0 + 7.25, norm_p")
    )

    saved_mods = {
        m: sys.modules[m]
        for m in list(sys.modules)
        if m == "geobignn_tpu" or m.startswith("geobignn_tpu.")
    }
    saved_path = list(sys.path)
    try:
        pred = Predictor.from_run(str(run_dir))  # pinned by default
        assert str(bak_pkg) in inspect.getfile(type(pred))
        vp, _ = pred.predict_mesh(m_n)
        # pre-denormalize positions are the constant 7.25 -> all rows equal
        assert np.abs(vp - vp[:1]).max() < 1e-5
    finally:
        for m in [m for m in sys.modules if m.startswith("geobignn_tpu")]:
            del sys.modules[m]
        sys.modules.update(saved_mods)
        sys.path[:] = saved_path

    live = Predictor.from_run(str(run_dir), pinned=False)
    assert type(live) is Predictor
    vp_live, _ = live.predict_mesh(m_n)
    assert np.abs(vp_live - vp_live[:1]).max() > 1e-3  # real predictions vary


def test_predict_dir_and_eval(tmp_path, trained):
    cfg, params, m_n, m_o = trained
    # fabricate a run dir + test corpus
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    cfg2 = cfg.with_updates(dataset_dir=str(tmp_path / "data"), flag="t")
    cfg2.to_json(str(run_dir / "params.json"))
    from geobignn_tpu.train.checkpoint import save_checkpoint

    save_checkpoint(str(run_dir / "ckpt_best.pkl"), params)

    nd = tmp_path / "data" / "Synthetic" / "test" / "noisy"
    od = tmp_path / "data" / "Synthetic" / "test" / "original"
    nd.mkdir(parents=True), od.mkdir(parents=True)
    meshio.write_obj(str(od / "S.obj"), m_o.points, m_o.fv_indices)
    meshio.write_obj(str(nd / "S_n1.obj"), m_n.points, m_n.fv_indices)

    from geobignn_tpu.infer.predict import predict_dir

    res = predict_dir(str(run_dir), n_update_iters=10)
    assert res["angle_mean1"] > 0 and len(res["rows"]) == 1
    import os

    out_files = os.listdir(res["result_dir"])
    assert any(f.endswith("-10.obj") for f in out_files)

    # offline evaluator over the result dir
    from geobignn_tpu.infer.evaluate import eval_denoising_result

    r = eval_denoising_result(res["result_dir"], str(od))
    assert r is not None and r["corpus"]["angle"] > 0
    assert os.path.exists(os.path.join(res["result_dir"], "ErrorInfo_h.txt"))


def test_predict_dir_restores_live_package(tmp_path):
    """Pinned batch inference must not leave the snapshot hijacking
    sys.modules for the rest of the process (a campaign run used to make
    every later geobignn_tpu import resolve to the run's code_bak)."""
    import sys

    from geobignn_tpu.config import Config
    from geobignn_tpu.data import synth
    from geobignn_tpu.train.trainer import train

    root = tmp_path / "dataset" / "Synthetic"
    for split in ("train", "test"):
        (root / split / "noisy").mkdir(parents=True)
        (root / split / "original").mkdir(parents=True)
        m_o = synth.icosphere(2)
        meshio.write_obj(str(root / split / "original" / "s.obj"),
                         m_o.points, m_o.fv_indices)
        m_n = synth.add_noise(m_o, 0.15, seed=0)
        meshio.write_obj(str(root / split / "noisy" / "s_n1.obj"),
                         m_n.points, m_n.fv_indices)
        (root / f"{split}_list.txt").write_text("s\n")
    cfg = Config(max_epoch=1, seed=0, augment=False, granularity=16,
                 dataset_dir=str(tmp_path / "dataset"), sub_size=10 ** 6,
                 log_dir=str(tmp_path / "log"))
    run_dir = train(cfg)
    live_before = sys.modules["geobignn_tpu.data.builder"]

    from geobignn_tpu.infer.predict import predict_dir

    rep = predict_dir(run_dir, dataset_root=cfg.dataset_dir)
    assert rep["rows"]
    import geobignn_tpu.data.builder as b_after

    assert sys.modules["geobignn_tpu.data.builder"] is live_before
    assert b_after is live_before
