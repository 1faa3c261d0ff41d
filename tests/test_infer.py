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
