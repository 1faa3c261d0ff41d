"""Halo-mode training CONVERGES like the single-chip path (slow tier).

Gradient parity per step is pinned in tests/test_halo_train.py, but halo
pooling is partition-constrained (a different member of the model family),
so convergence must be shown, not assumed: a short run of both trainers on
the same tiny corpus, same seed/protocol, must land within a loose
tolerance of each other.  The long-form evidence (60 epochs, 4-class
corpus) lives in docs/halo_conv/ (examples/halo_convergence.py).
"""

import numpy as np
import pytest

from geobignn_tpu.config import Config
from geobignn_tpu.data import synth

pytestmark = pytest.mark.slow

EPOCHS = 10


def _corpus():
    m1 = synth.icosphere(3)
    m2 = synth.torus(24, 12)
    train = [
        (synth.add_noise(m1, 0.2, seed=1), m1),
        (synth.add_noise(m2, 0.2, seed=2), m2),
    ]
    evals = [(synth.add_noise(m1, 0.15, seed=9), m1)]
    return train, evals


def _cfg(mode: str) -> Config:
    return Config(
        data_type="HaloConvT", flag=mode, seed=3, max_epoch=EPOCHS,
        lr=1e-3, lr_sch="lmd", lr_decay=0.98, lr_step=(20,),
        augment=False, preload=True, granularity=64, batch_size=1,
        halo_parts=4 if mode == "halo" else 0,
    )


def test_halo_curve_tracks_single_chip(tmp_path):
    train, evals = _corpus()

    from geobignn_tpu.data.dataset import InMemoryDataset
    from geobignn_tpu.train.trainer import Trainer

    (tmp_path / "s").mkdir()
    (tmp_path / "h").mkdir()
    cfg_s = _cfg("single")
    bc = cfg_s.build_config()
    tr_s = Trainer(cfg_s, InMemoryDataset(train, bc),
                   InMemoryDataset(evals, bc), str(tmp_path / "s"))
    best_s = tr_s.fit()

    from geobignn_tpu.train.halo_trainer import HaloTrainer

    tr_h = HaloTrainer(_cfg("halo"), train, evals, str(tmp_path / "h"))
    best_h = tr_h.fit()

    # both must have improved massively over the ~30 deg noisy start, and
    # land in the same ballpark (different pooling family members + init
    # order -> loose tolerance)
    assert best_s < 15.0 and best_h < 15.0
    assert abs(best_h - best_s) / best_s < 0.5, (best_s, best_h)
