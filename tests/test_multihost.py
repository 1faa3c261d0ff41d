"""Multi-host (DCN axis) mesh + fault-tolerant auto-resume."""

from __future__ import annotations

import os

import jax
import numpy as np
import optax
import pytest

from geobignn_tpu import parallel
from geobignn_tpu.config import Config
from geobignn_tpu.data import synth
from geobignn_tpu.data.builder import BuildConfig, build_dual_sample, build_raw, plan_for
from geobignn_tpu.models import DualGNN
from geobignn_tpu.parallel.api import dual_loss_and_metrics

pytestmark = pytest.mark.slow



@pytest.fixture(scope="module")
def samples4():
    cfg = BuildConfig(granularity=64)
    meshes = [
        (synth.add_noise(synth.icosphere(2), 0.2, seed=s), synth.icosphere(2))
        for s in (1, 2, 3, 4)
    ]
    plan = None
    for m_n, m_o in meshes:
        bv, bf, _ = build_raw(m_n, m_o, cfg)
        p = plan_for(bv, bf, cfg.granularity)
        plan = p if plan is None else plan.merge(p)
    return [build_dual_sample(m_n, m_o, cfg, plan)[0] for m_n, m_o in meshes]


def test_dcn_mesh_shape():
    mesh = parallel.make_mesh(2, 2, dcn=2)
    assert mesh.shape == {"dcn": 2, "dp": 2, "gp": 2}


def test_dcn_step_matches_single_device(samples4):
    """dcn x dp x gp (2x2x2) step == single-device accumulation: the DCN
    gradient pmean composes exactly with the ICI one."""
    mesh = parallel.make_mesh(2, 2, dcn=2)
    stacked = parallel.stack_samples(samples4)

    model_sh = DualGNN(gp_axis="gp")
    model_ref = DualGNN()
    params = model_ref.init(jax.random.PRNGKey(0), samples4[0])
    tx = optax.sgd(1e-3)
    opt_state = tx.init(params)

    step = parallel.make_sharded_train_step(model_sh, tx, mesh, stacked)
    p_sh, _, metrics = step(params, opt_state, stacked, jax.random.PRNGKey(0))

    def loss_fn(p, s):
        return dual_loss_and_metrics(model_ref, p, s, {})[0]

    g = None
    for s in samples4:
        gi = jax.grad(loss_fn)(params, s)
        g = gi if g is None else jax.tree.map(lambda a, b: a + b, g, gi)
    g = jax.tree.map(lambda a: a / len(samples4), g)
    upd, _ = tx.update(g, opt_state, params)
    p_ref = optax.apply_updates(params, upd)

    for a, b in zip(jax.tree.leaves(p_sh), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    assert np.isfinite(float(metrics["loss"]))


def test_auto_resume_continues_latest_run(tmp_path):
    """Preemption recovery: rerunning train() with auto_resume picks up the
    latest run's ckpt_last, continues at the next epoch, and does not start
    a fresh run dir."""
    from geobignn_tpu.meshio import write_obj
    from geobignn_tpu.train import trainer as T

    root = tmp_path / "ds"
    for split in ("train", "test"):
        (root / "Synthetic" / split / "noisy").mkdir(parents=True)
        (root / "Synthetic" / split / "original").mkdir(parents=True)
    m_o = synth.icosphere(1)
    m_n = synth.add_noise(m_o, 0.15, seed=0)
    for split in ("train", "test"):
        write_obj(str(root / "Synthetic" / split / "original" / "s.obj"),
                  m_o.points, m_o.fv_indices)
        write_obj(str(root / "Synthetic" / split / "noisy" / "s_n1.obj"),
                  m_n.points, m_n.fv_indices)
    (root / "Synthetic" / "train_list.txt").write_text("s\n")
    (root / "Synthetic" / "test_list.txt").write_text("s\n")

    cfg = Config(
        max_epoch=2, lr=1e-3, seed=3, augment=False, granularity=16,
        log_dir=str(tmp_path / "log"), flag="ar", auto_resume=True,
        filter_patch_count=0,
    )
    run1 = T.train(cfg, str(root))
    assert os.path.exists(os.path.join(run1, "ckpt_last.pkl"))

    cfg2 = cfg.with_updates(max_epoch=4)
    run2 = T.train(cfg2, str(root))
    assert run2 == run1  # resumed in place, no new run dir

    from geobignn_tpu.train import checkpoint as ckpt
    _, _, scalars = ckpt.load_checkpoint(os.path.join(run1, "ckpt_last.pkl"))
    assert int(scalars["epoch"]) == 3  # epochs 2,3 ran in the second call
