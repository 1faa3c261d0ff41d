import os

import numpy as np
import pytest

from geobignn_tpu import meshio
from geobignn_tpu.config import Config
from geobignn_tpu.data import synth
from geobignn_tpu.data.builder import BuildConfig
from geobignn_tpu.data.dataset import DualDataset, InMemoryDataset
from geobignn_tpu.train import Trainer, lr_at_epoch
from geobignn_tpu.train.optim import PlateauState

pytestmark = pytest.mark.slow



def _mini_corpus(tmp_path, n_train=2, n_noise=2):
    """Write a tiny Synthetic-style corpus to disk."""
    for split, names in [("train", ["A", "B"][:n_train]), ("test", ["C"])]:
        nd = tmp_path / "Synthetic" / split / "noisy"
        od = tmp_path / "Synthetic" / split / "original"
        nd.mkdir(parents=True), od.mkdir(parents=True)
        for i, name in enumerate(names):
            m = synth.icosphere(2, radius=1.0 + 0.1 * i)
            meshio.write_obj(str(od / f"{name}.obj"), m.points, m.fv_indices)
            for k in range(1, n_noise + 1):
                noisy = synth.add_noise(m, 0.1 * k, seed=10 * i + k)
                meshio.write_obj(
                    str(nd / f"{name}_n{k}.obj"), noisy.points, noisy.fv_indices
                )
        lst = tmp_path / "Synthetic" / f"{split}_list.txt"
        lst.write_text("\n".join(names) + "\n")
    return str(tmp_path)


def test_dual_dataset_discovery_and_cache(tmp_path):
    root = _mini_corpus(tmp_path)
    cfg = BuildConfig(granularity=64)
    ds = DualDataset(root, "Synthetic", "train", "train_list.txt", build_cfg=cfg)
    assert len(ds) == 4  # 2 meshes x 2 noise levels
    s = ds.get(0)
    assert s.v.y is not None and s.f.y is not None
    cache = os.path.join(root, "Synthetic", "train", "processed_cache")
    n_files = len(os.listdir(cache))
    assert n_files == 4
    # second construction hits the cache and produces identical samples
    ds2 = DualDataset(root, "Synthetic", "train", "train_list.txt", build_cfg=cfg)
    s2 = ds2.get(0)
    np.testing.assert_array_equal(np.asarray(s.v.x), np.asarray(s2.v.x))
    np.testing.assert_array_equal(
        np.asarray(s.v.levels[1].edge_index), np.asarray(s2.v.levels[1].edge_index)
    )


def test_submesh_split_dataset(tmp_path):
    root = _mini_corpus(tmp_path, n_train=1, n_noise=1)
    cfg = BuildConfig(granularity=64)
    ds = DualDataset(
        root, "Synthetic", "train", "train_list.txt",
        filter_patch_count=10, submesh_size=100, build_cfg=cfg,
    )
    # 320-face mesh split into >=4 patches of <=100 faces
    assert len(ds) >= 4
    s = ds.get(0)
    assert int(s.f.levels[0].node_mask.sum()) <= 100


def test_overfit_single_mesh():
    """Convergence smoke: loss and errors must drop sharply when overfitting
    one mesh (the end-to-end learning signal works)."""
    m_o = synth.icosphere(2)
    m_n = synth.add_noise(m_o, 0.3, seed=5)
    ds = InMemoryDataset([(m_n, m_o)], BuildConfig(granularity=64))
    # augmentation off: overfitting one mesh under random SO(3) rotation
    # needs far more than a smoke test's step budget
    cfg = Config(max_epoch=40, lr=2e-3, seed=1, granularity=64, augment=False)
    tr = Trainer(cfg, ds, ds)
    first = tr.evaluate()
    best = tr.fit()
    last = tr.evaluate()
    # normals converge hard; positions move slowly (1 update/epoch) but must
    # strictly improve
    assert last["error_f"] < 0.25 * first["error_f"]
    assert last["error_v"] < 0.99 * first["error_v"]
    assert best <= first["error_f"]


def test_edges_per_s_logged(tmp_path):
    """Production runs must record the edges/s north-star metric per epoch
    (not just bench.py), using REAL unpadded message counts that match the
    bench accounting."""
    import json

    from geobignn_tpu.data.dataset import branch_messages
    from geobignn_tpu.train.logging import MetricLogger

    m_o = synth.icosphere(2)
    m_n = synth.add_noise(m_o, 0.3, seed=5)
    ds = InMemoryDataset([(m_n, m_o)], BuildConfig(granularity=64))

    # same accounting as bench_baseline_torch.messages_per_step: 3/3/2
    # convs per level x real edge counts
    bv, bf = ds.entries[0][0], ds.entries[0][1]
    for b in (bv, bf):
        want = (
            3 * b.edge_index.shape[1]
            + 3 * b.specs[0].edge_index.shape[1]
            + 2 * b.specs[1].edge_index.shape[1]
        )
        assert branch_messages(b) == want
    assert ds.messages_per_sample()[0] == branch_messages(bv) + branch_messages(bf)

    cfg = Config(max_epoch=2, lr=1e-3, seed=1, granularity=64, augment=False)
    tr = Trainer(cfg, ds, ds)
    logger = MetricLogger(str(tmp_path / "metrics.jsonl"))
    tr.fit(logger)
    logger.close()
    rows = [
        json.loads(line)
        for line in (tmp_path / "metrics.jsonl").read_text().splitlines()
    ]
    train_rows = [r for r in rows if r["split"] == "train"]
    assert train_rows and all(r["edges_per_s"] > 0 for r in train_rows)


def test_fusion_mode_trains_and_converges():
    """Opt-in DualFusionLayer mode (Config.fusion_features > 0): the fused
    model trains end-to-end and the eval error drops — the reference keeps
    the layer importable but dead (net_util.py:248-278); here it is a
    usable mode."""
    m_o = synth.icosphere(2)
    m_n = synth.add_noise(m_o, 0.3, seed=9)
    ds = InMemoryDataset([(m_n, m_o)], BuildConfig(granularity=64))
    cfg = Config(max_epoch=25, lr=2e-3, seed=1, granularity=64, augment=False,
                 fusion_features=16)
    tr = Trainer(cfg, ds, ds)
    assert "fusion" in tr.params["params"], list(tr.params["params"])
    first = tr.evaluate()
    tr.fit()
    last = tr.evaluate()
    assert last["error_f"] < 0.5 * first["error_f"]

    # rejected where the incidence is not partition-aware
    import pytest as _pytest

    with _pytest.raises(ValueError, match="fusion"):
        Config(fusion_features=8, gp=2).validate()
    with _pytest.raises(ValueError, match="fusion"):
        Config(fusion_features=8, halo_parts=2).validate()


def test_lr_schedules():
    cfg = Config(lr=1.0, lr_decay=0.5, lr_step=(10,), lr_sch="lmd")
    assert lr_at_epoch(cfg, 0) == 1.0
    assert lr_at_epoch(cfg, 10) == pytest.approx(0.5)
    assert lr_at_epoch(cfg, 5) == pytest.approx(0.5**0.5)
    cfg = cfg.with_updates(lr_sch="step")
    assert lr_at_epoch(cfg, 9) == 1.0 and lr_at_epoch(cfg, 10) == 0.5
    cfg = cfg.with_updates(lr_sch="multi_step", lr_step=(5, 8))
    assert lr_at_epoch(cfg, 6) == 0.5 and lr_at_epoch(cfg, 9) == 0.25
    cfg = cfg.with_updates(lr_sch="exp")
    assert lr_at_epoch(cfg, 2) == 0.25


def test_plateau():
    p = PlateauState(lr=1.0, factor=0.1, patience=2)
    lrs = [p.step(v) for v in [1.0, 0.9, 0.9, 0.9, 0.9]]
    assert lrs[-1] == pytest.approx(0.1)  # reduced after patience exceeded
    assert p.step(0.5) == pytest.approx(0.1)  # improvement resets counter


def test_checkpoint_resume(tmp_path):
    m_o = synth.icosphere(2)
    m_n = synth.add_noise(m_o, 0.3, seed=5)
    ds = InMemoryDataset([(m_n, m_o)], BuildConfig(granularity=64))
    cfg = Config(max_epoch=2, seed=1, granularity=64)
    tr = Trainer(cfg, ds, ds, run_dir=str(tmp_path))
    tr.fit()
    assert os.path.exists(tmp_path / "ckpt_last.pkl")
    import jax

    tr2 = Trainer(cfg.with_updates(max_epoch=3), ds, ds)
    tr2.restore(str(tmp_path / "ckpt_last.pkl"))
    assert tr2.epoch == 2
    for a, b in zip(jax.tree.leaves(tr.params), jax.tree.leaves(tr2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    tr2.fit()  # continues one more epoch without error


def test_config_json_roundtrip(tmp_path):
    cfg = Config(data_type="Kinect_v1", lr=5e-4, lr_step=(3, 7))
    assert cfg.force_depth
    p = tmp_path / "cfg.json"
    cfg.to_json(str(p))
    cfg2 = Config.from_json(str(p))
    assert cfg2.data_type == "Kinect_v1" and cfg2.lr == 5e-4
    assert tuple(cfg2.lr_step) == (3, 7) and cfg2.force_depth


@pytest.mark.slow
def test_resume_is_trajectory_exact(tmp_path):
    """Crash-and-resume reproduces the uninterrupted run EXACTLY: the
    epoch-keyed rng replays the same shuffle/augmentation stream, and the
    checkpoint restores params+opt+plateau, so params after (2 epochs +
    resume + 2 epochs) == params after 4 straight epochs."""
    import jax

    from geobignn_tpu.data.builder import BuildConfig
    from geobignn_tpu.data.dataset import InMemoryDataset
    from geobignn_tpu.data import synth

    m_o = synth.icosphere(2)
    pairs = [(synth.add_noise(m_o, 0.2, seed=i), m_o) for i in range(3)]
    ds = InMemoryDataset(pairs, BuildConfig(granularity=16))
    base = dict(seed=5, granularity=16, augment=True, lr=2e-3)

    tr_a = Trainer(Config(max_epoch=4, **base), ds, ds)
    tr_a.fit()

    d1 = tmp_path / "r1"
    d1.mkdir()
    tr_b = Trainer(Config(max_epoch=2, **base), ds, ds, run_dir=str(d1))
    tr_b.fit()  # "crash" after epoch 2 (ckpt_last written)
    tr_c = Trainer(Config(max_epoch=4, **base), ds, ds)
    tr_c.restore(str(d1 / "ckpt_last.pkl"))
    assert tr_c.epoch == 2
    tr_c.fit()

    for a, c in zip(jax.tree.leaves(tr_a.params), jax.tree.leaves(tr_c.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-6)
