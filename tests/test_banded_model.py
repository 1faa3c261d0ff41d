"""End-to-end DualGNN parity: banded Pallas convs vs the table path, and
the RCM-reordered pipeline (builder/dataset/predict integration)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from geobignn_tpu.data import synth
from geobignn_tpu.data.builder import (
    BuildConfig,
    attach_tables,
    build_dual_sample,
    build_raw,
    widths_for,
)
from geobignn_tpu.models import DualGNN

import pytest

pytestmark = pytest.mark.slow



def _sample(reorder: bool, bands: bool, seed=0):
    m_o = synth.icosphere(2)
    m_n = synth.add_noise(m_o, 0.2, seed=seed)
    bc = BuildConfig(granularity=64, reorder=reorder)
    bv, bf, meta = build_raw(m_n, m_o, bc)
    s, _ = build_dual_sample(m_n, m_o, bc)
    w = widths_for(bv, bf, meta["fv_indices"], with_bands=bands)
    return attach_tables(s, w), meta


def test_banded_model_matches_table_path():
    """Same RCM-ordered sample, with and without level-1 band masks: the
    model must produce identical predictions and gradients (the banded
    Pallas kernels replace only the aggregation implementation)."""
    s_band, _ = _sample(reorder=True, bands=True)
    s_tbl, _ = _sample(reorder=True, bands=False)
    assert s_band.v.levels[0].band is not None
    assert s_tbl.v.levels[0].band is None

    model = DualGNN()
    params = model.init(jax.random.PRNGKey(0), s_tbl)
    v_ref, n_ref = model.apply(params, s_tbl)
    v_b, n_b = jax.jit(model.apply)(params, s_band)
    # interpret-mode kernels run the same math; bf16 matmuls in the kernel
    # vs f32 XLA einsums bound the tolerance
    np.testing.assert_allclose(np.asarray(v_b), np.asarray(v_ref), atol=2e-2)
    err_n = np.abs(np.asarray(n_b) - np.asarray(n_ref)).max()
    assert err_n < 5e-2, err_n

    def loss(p, s):
        v, n = model.apply(p, s)
        return (v * v).sum() + (n * n).sum()

    g_ref = jax.grad(loss)(params, s_tbl)
    g_b = jax.jit(jax.grad(loss))(params, s_band)
    for a, b in zip(jax.tree.leaves(g_b), jax.tree.leaves(g_ref)):
        d = np.abs(np.asarray(a) - np.asarray(b)).max()
        scale = max(float(np.abs(np.asarray(b)).max()), 1.0)
        assert d / scale < 5e-2, (d, scale)


def test_reordered_sample_is_consistent():
    """Reordering must permute features and targets together: the permuted
    sample's x/y rows equal the unpermuted rows at perm positions."""
    s_r, meta_r = _sample(reorder=True, bands=False, seed=1)
    s_0, _ = _sample(reorder=False, bands=False, seed=1)
    pv = meta_r["perm_v"]
    n = pv.shape[0]
    np.testing.assert_allclose(
        np.asarray(s_r.v.x)[:n], np.asarray(s_0.v.x)[pv], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(s_r.v.y)[:n], np.asarray(s_0.v.y)[pv], atol=1e-6
    )
    pf = meta_r["perm_f"]
    nf = pf.shape[0]
    np.testing.assert_allclose(
        np.asarray(s_r.f.y)[:nf], np.asarray(s_0.f.y)[pf], atol=1e-6
    )


def test_predictor_unpermutes(tmp_path):
    """With reorder on, Predictor output must be in ORIGINAL vertex/face
    order: denoising a mesh with zero noise and an untrained residual model
    keeps outputs near the input positions, row-aligned."""
    from geobignn_tpu.config import Config
    from geobignn_tpu.infer.predict import Predictor

    m = synth.icosphere(2)
    cfg = Config(granularity=64, reorder=True, max_epoch=0, seed=0)
    model = DualGNN()
    bc = cfg.build_config()
    s, _ = build_dual_sample(synth.add_noise(m, 0.0, seed=0), m, bc)
    params = model.init(jax.random.PRNGKey(0), s)
    pred = Predictor(cfg, params)
    vp, np_arr = pred.predict_mesh(m)
    assert vp.shape == (m.n_vertices, 3)
    # the model adds a (small, random-init) residual to the input xyz; in
    # the ORIGINAL order the output must correlate row-wise with the input
    d = np.linalg.norm(vp - m.points, axis=1)
    shuffled = np.linalg.norm(vp - np.roll(m.points, 7, axis=0), axis=1)
    assert d.mean() < 0.5 * shuffled.mean()


def test_forced_blocksparse_matches_table_path(monkeypatch):
    """GBN_FORCE_BS + GBN_BS_TILE (the perf-sweep knobs) route every level
    through the block-sparse kernel; predictions must still match the
    table path exactly (same aggregation semantics, different schedule)."""
    import importlib

    from geobignn_tpu.data import builder as builder_mod
    from geobignn_tpu.ops import blocksparse

    monkeypatch.setenv("GBN_FORCE_BS", "1")
    monkeypatch.setenv("GBN_BS_TILE", "64")  # read at use time (ADVICE r2)
    s_bs, _ = _sample(reorder=True, bands=True)
    s_tbl, _ = _sample(reorder=True, bands=False)
    assert s_bs.v.levels[0].blk_idx is not None
    assert s_bs.f.levels[0].blk_idx is not None

    model = DualGNN()
    params = model.init(jax.random.PRNGKey(0), s_tbl)
    v_ref, n_ref = model.apply(params, s_tbl)
    v_b, n_b = jax.jit(model.apply)(params, s_bs)
    np.testing.assert_allclose(np.asarray(v_b), np.asarray(v_ref), atol=2e-2)
    assert np.abs(np.asarray(n_b) - np.asarray(n_ref)).max() < 5e-2
