"""Halo-sharded inference: the multi-chip predict path must match the
single-device Predictor on the same mesh (8-way CPU mesh)."""

from __future__ import annotations

import jax
import numpy as np

from geobignn_tpu.config import Config
from geobignn_tpu.data import synth
from geobignn_tpu.data.builder import build_dual_sample
from geobignn_tpu.infer.predict import Predictor
from geobignn_tpu.models import DualGNN

import pytest

pytestmark = pytest.mark.slow



def test_halo_predict_matches_single_device():
    m_o = synth.icosphere(2)
    m_n = synth.add_noise(m_o, 0.15, seed=0)
    cfg = Config(granularity=64, seed=0)
    model = DualGNN()
    s, _ = build_dual_sample(m_n, m_o, cfg.build_config())
    params = model.init(jax.random.PRNGKey(3), s)
    pred = Predictor(cfg, params)

    vp_ref, np_ref = pred.predict_mesh(m_n)
    vp_halo, np_halo = pred.predict_mesh_halo(m_n, n_parts=8)

    # The halo path builds OWNER-CONSTRAINED pooling hierarchies, so a few
    # clusters (and thus predictions) legitimately differ from the
    # single-device build; exact parity on a SHARED hierarchy is pinned in
    # tests/test_halo_model.py.  Here we pin the predict-path wiring:
    # same output order (un-permutation), same denormalization, and
    # near-identical predictions outside the differing clusters.
    dv = np.linalg.norm(vp_halo - vp_ref, axis=1)
    assert np.median(dv) < 1e-5
    assert dv.mean() < 1e-3
    # normals see every vertex delta smoothed through the facet U-Net, so
    # the floor is higher than for positions (0.002 ~ 0.1 deg here)
    dn = np.linalg.norm(np_halo - np_ref, axis=1)
    assert np.median(dn) < 1e-2
    assert (dn < 0.2).mean() > 0.95


def test_halo_denoise_runs_end_to_end():
    m_o = synth.icosphere(2)
    m_n = synth.add_noise(m_o, 0.15, seed=1)
    cfg = Config(granularity=64, seed=0)
    model = DualGNN()
    s, _ = build_dual_sample(m_n, m_o, cfg.build_config())
    params = model.init(jax.random.PRNGKey(4), s)
    pred = Predictor(cfg, params)
    v, np_arr = pred.denoise(m_n, n_update_iters=5, halo_parts=8)
    assert v.shape == (m_n.n_vertices, 3)
    assert np.isfinite(v).all() and np.isfinite(np_arr).all()


def test_halo_denoise_banded_matches_table_mode():
    """halo_banded end-to-end through Predictor.denoise: same predictions
    as the table-mode halo path (bf16 kernel tolerance; on the CPU test
    mesh the XLA twin of the kernel runs, see ops/banded_pallas.py)."""
    m_o = synth.icosphere(2)
    m_n = synth.add_noise(m_o, 0.15, seed=2)
    cfg = Config(granularity=64, seed=0)
    model = DualGNN()
    s, _ = build_dual_sample(m_n, m_o, cfg.build_config())
    params = model.init(jax.random.PRNGKey(5), s)
    pred = Predictor(cfg, params)
    v_b, n_b = pred.denoise(m_n, n_update_iters=3, halo_parts=4,
                            halo_banded=True)
    v_t, n_t = pred.denoise(m_n, n_update_iters=3, halo_parts=4)
    np.testing.assert_allclose(v_b, v_t, atol=2e-2)
    np.testing.assert_allclose(n_b, n_t, atol=5e-2)
