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


@pytest.mark.slow
def test_weight_decay_training_step():
    ds = _tiny_ds()
    cfg = Config(max_epoch=1, weight_decay=1e-4, seed=1, granularity=64)
    tr = Trainer(cfg, ds, ds)
    tr.fit()  # one epoch end-to-end


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


# ---------------------------------------------------------------------------
# round-2 review fixes (VERDICT r1 weak #7/#8, missing #8/#9)
# ---------------------------------------------------------------------------

def test_tablewidths_merge_logs_band_drop(capsys):
    from geobignn_tpu.data import builder

    builder._BAND_DROPS_WARNED.clear()
    a = builder.TableWidths(
        k_v=(8, 8, 8), k_f=(8, 8, 8), mem_v=(2, 2, 2, 2), mem_f=(2, 2, 2, 2),
        up_v=(1, 1), up_f=(1, 1), fv_r=8,
        tile_v=(128, 128, 0), tile_f=(256, 0, 0),
    )
    b = builder.TableWidths(
        k_v=(8, 8, 8), k_f=(8, 8, 8), mem_v=(2, 2, 2, 2), mem_f=(2, 2, 2, 2),
        up_v=(1, 1), up_f=(1, 1), fv_r=8,
        tile_v=(128, 0, 0), tile_f=(256, 0, 0),  # v level-2 band drops
    )
    m = a.merge(b)
    assert m.tile_v == (128, 0, 0) and m.tile_f == (256, 0, 0)
    out = capsys.readouterr().out
    assert "banded conv dropped at vertex level 2" in out
    # warned once only
    a.merge(b)
    assert "dropped" not in capsys.readouterr().out


@pytest.mark.slow
def test_evaluate_empty_masks_no_nan(capsys):
    """All-padded eval samples must not produce inf/NaN in the plateau key."""
    import jax

    ds = _tiny_ds()
    cfg = Config(max_epoch=1, seed=1, granularity=64)
    tr = Trainer(cfg, ds, ds)
    # zero out the masks of the cached eval sample to simulate all-padding
    s = ds.get(0, tr.plan)
    z = s.replace(
        v=s.v.replace(levels=(s.v.levels[0].replace(
            node_mask=np.zeros_like(np.asarray(s.v.levels[0].node_mask))),)
            + s.v.levels[1:]),
        f=s.f.replace(levels=(s.f.levels[0].replace(
            node_mask=np.zeros_like(np.asarray(s.f.levels[0].node_mask))),)
            + s.f.levels[1:]),
    )
    tr._cache[("e", 0)] = jax.device_put(z)
    out = tr.evaluate()
    assert np.isfinite(out["error_f"]) and np.isfinite(out["loss_v"])
    assert "zero valid nodes" in capsys.readouterr().out


def test_vertex_colored_off_export(tmp_path):
    from geobignn_tpu import viz
    from geobignn_tpu.data import synth

    m_o = synth.icosphere(1)
    m_n = synth.add_noise(m_o, 0.05, seed=0)
    p = viz.hausdorff_heatmap(str(tmp_path / "h.off"), m_n, m_o)
    lines = open(p).read().splitlines()
    assert lines[0] == "COFF"
    nv, nf, _ = map(int, lines[1].split())
    assert nv == m_n.n_vertices and nf == m_n.n_faces
    assert len(lines[2].split()) == 7  # xyz + rgba


def test_vertex_normals_area_weighting():
    from geobignn_tpu import geometry
    from geobignn_tpu.data import synth

    m = synth.icosphere(2)
    vn_u = geometry.vertex_normals_np(m.points, m.fv_indices)
    vn_a = geometry.vertex_normals_np(m.points, m.fv_indices, weighting="area")
    # on a near-uniform sphere both agree closely and are unit
    assert np.allclose(np.linalg.norm(vn_u, axis=1), 1.0, atol=1e-5)
    assert np.allclose(np.linalg.norm(vn_a, axis=1), 1.0, atol=1e-5)
    assert (vn_u * vn_a).sum(1).min() > 0.99


def test_config_validate_mode_matrix():
    """Contradictory mode combinations fail FAST with clear messages
    (VERDICT r1 weak #6: they used to fail late and far from the cause)."""
    ok = Config(seed=1)
    assert ok.validate() is ok

    cases = [
        (dict(buckets_growth=1.5, preload=True), "preload=False"),
        (dict(buckets_growth=1.5, preload=False, dp=2), "single-chip"),
        (dict(halo_parts=2, dp=2), "exclusive"),
        (dict(halo_parts=2, dynamic_pool=True), "dynamic pooling"),
        (dict(halo_parts=2, edge_weight_type=4), "dynamic pooling"),
        (dict(dynamic_pool=True, gp=2), "graph-partitioned"),
        (dict(precision="fp8"), "precision"),
        (dict(precision="bfloat16", dynamic_pool=True), "bfloat16"),
        (dict(lr_sch="cosine"), "lr_sch"),
        (dict(optimizer="lion"), "optimizer"),
        (dict(pool_type="sum"), "pool_type"),
        (dict(fusion_features=8, gp=2), "fusion"),
        (dict(fusion_features=8, halo_parts=2), "fusion"),
    ]
    for kw, msg in cases:
        with pytest.raises(ValueError, match=msg):
            Config(seed=1, **kw).validate()

    # round-4 capability closures: these combinations are now SUPPORTED
    # (halo force_depth head, halo bf16) — they must validate cleanly
    Config(seed=1, halo_parts=2, data_type="Kinect_v1").validate()
    Config(seed=1, precision="bfloat16", halo_parts=2).validate()


def test_checkpoint_msgpack_format_and_pickle_backcompat(tmp_path):
    """Checkpoints are msgpack (no arbitrary-code-execution on load);
    round-1 pickle checkpoints still load (VERDICT r1 weak #5)."""
    import pickle

    import jax.numpy as jnp

    from geobignn_tpu.train import checkpoint as ckpt

    params = {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}
    opt = ({"m": np.ones((2, 3), np.float32)},)
    p = str(tmp_path / "c.pkl")
    ckpt.save_checkpoint(p, params, opt, epoch=4, best_error=0.5)
    with open(p, "rb") as f:
        assert f.read(8) == b"GBNCKPT1"  # not a pickle
    pr, orr, sc = ckpt.load_checkpoint(p, params, opt)
    np.testing.assert_array_equal(pr["w"], params["w"])
    np.testing.assert_array_equal(orr[0]["m"], opt[0]["m"])
    assert sc["epoch"] == 4 and sc["best_error"] == 0.5
    # template-free load (Predictor.from_run path)
    pr2, _, _ = ckpt.load_checkpoint(p)
    np.testing.assert_array_equal(np.asarray(pr2["w"]), params["w"])

    # legacy pickle file loads through the back-compat path
    legacy = str(tmp_path / "legacy.pkl")
    with open(legacy, "wb") as f:
        pickle.dump({"params": params, "opt_state": None,
                     "scalars": {"epoch": 1}}, f)
    pl, ol, sl = ckpt.load_checkpoint(legacy, params)
    np.testing.assert_array_equal(pl["w"], params["w"])
    assert sl["epoch"] == 1


def test_discover_mesh_pairs_missing_list_raises(tmp_path):
    """An explicitly requested split list that does not exist must raise,
    not silently glob a different split composition."""
    from geobignn_tpu.data.dataset import discover_mesh_pairs

    d = tmp_path / "Synthetic" / "train" / "original"
    d.mkdir(parents=True)
    with pytest.raises(FileNotFoundError):
        discover_mesh_pairs(str(tmp_path), "Synthetic", "train", "train_list.txt")
    # no list requested: glob discovery still works (empty here)
    assert discover_mesh_pairs(str(tmp_path), "Synthetic", "train", None) == []
