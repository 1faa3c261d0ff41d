"""Regression tests for the round-1 code-review findings."""

import numpy as np
import pytest

from geobignn_tpu.config import Config
from geobignn_tpu.data import synth
from geobignn_tpu.data.builder import BuildConfig, build_dual_sample
from geobignn_tpu.data.dataset import InMemoryDataset, _config_key
from geobignn_tpu.train import Trainer
from geobignn_tpu.train.optim import PlateauState, make_optimizer, set_lr


def _tiny_ds():
    m_o = synth.icosphere(2)
    m_n = synth.add_noise(m_o, 0.2, seed=1)
    return InMemoryDataset([(m_n, m_o)], BuildConfig(granularity=64))


def test_set_lr_with_weight_decay():
    """optax.chain states are plain tuples — set_lr must rebuild them."""
    import jax.numpy as jnp

    cfg = Config(weight_decay=1e-4, granularity=64)
    tx = make_optimizer(cfg)
    params = {"w": jnp.ones((3, 3))}
    state = tx.init(params)
    state = set_lr(state, 5e-4)  # crashed with TypeError before the fix
    import jax

    g = jax.tree.map(jnp.ones_like, params)
    tx.update(g, state, params)


def test_weight_decay_training_step():
    ds = _tiny_ds()
    cfg = Config(max_epoch=1, weight_decay=1e-4, seed=1, granularity=64)
    tr = Trainer(cfg, ds, ds)
    tr.fit()  # one epoch end-to-end


def test_tiny_mesh_builds():
    """Octahedron (6 verts) coarsens to singletons before pool_step rounds
    complete; identity-padded clusters must keep the sample buildable."""
    m = synth.octahedron()
    noisy = synth.add_noise(m, 0.1, seed=0)
    sample, plan = build_dual_sample(noisy, m, BuildConfig(granularity=8))
    assert sample.v.x.shape[0] == plan.v.n1
    # and it must run through the model
    import jax

    from geobignn_tpu.models import DualGNN

    model = DualGNN()
    p = model.init(jax.random.PRNGKey(0), sample)
    v, n = model.apply(p, sample)
    assert bool(np.isfinite(np.asarray(v)).all())


def test_sided_loss_trains():
    ds = _tiny_ds()
    cfg = Config(max_epoch=1, loss_n="sided", seed=1, granularity=64)
    tr = Trainer(cfg, ds, ds)
    m = tr.run_epoch(np.random.default_rng(0))
    assert np.isfinite(m["loss"])


def test_cache_key_independent_of_training_seed():
    a = Config(seed=123, granularity=64).build_config()
    b = Config(seed=9999, granularity=64).build_config()
    assert _config_key(a) == _config_key(b)


def test_cli_rejects_unknown_key():
    from geobignn_tpu.cli import _apply_extras

    with pytest.raises(SystemExit, match="lr_decy"):
        _apply_extras({}, ["--lr_decy=0.5"])
    d = _apply_extras({}, ["--lr_decay=0.5"])
    assert d["lr_decay"] == 0.5


def test_plateau_state_checkpointed(tmp_path):
    ds = _tiny_ds()
    cfg = Config(max_epoch=2, lr_sch="auto", lr=1e-3, lr_decay=0.1,
                 lr_step=(0,), seed=1, granularity=64)
    tr = Trainer(cfg, ds, ds, run_dir=str(tmp_path))
    tr.fit()
    tr2 = Trainer(cfg.with_updates(max_epoch=3), ds, ds)
    tr2.restore(str(tmp_path / "ckpt_last.pkl"))
    assert tr2._restored_plateau is not None
    assert "lr" in tr2._restored_plateau
