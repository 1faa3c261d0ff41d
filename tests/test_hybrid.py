"""Band+boundary-table hybrid FeaStConv (slab-RCM order) — the
single-chip large-mesh formulation (VERDICT r3 next #3).

The hybrid engages when a level's RCM bandwidth exceeds MAX_BAND_TILE:
order_for_band switches to slab + per-slab RCM (small intra bandwidth),
in-window edges run the banded Pallas aggregate, the out-of-window
boundary runs a compact table correction.  Tests force the mode on small
meshes by monkeypatching MAX_BAND_TILE."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from geobignn_tpu import graphs
from geobignn_tpu.data import synth
from geobignn_tpu.ops import banded, banded_pallas
from geobignn_tpu.ops.feastconv import feast_conv, init_feast_params
from geobignn_tpu.structs import round_up


def _graph(subdiv=4):
    m = synth.add_noise(synth.icosphere(subdiv), 0.2, seed=0)
    ei = graphs.build_vertex_graph_1ring(m.ev_indices, m.n_vertices)
    return ei.astype(np.int32), m.n_vertices


def test_order_for_band_slab_mode():
    ei, n = _graph()
    perm, bw_plain = banded.order_for_band(ei, n)  # fits: plain RCM
    assert sorted(perm.tolist()) == list(range(n))

    perm_s, bw_intra = banded.order_for_band(ei, n, max_tile=48,
                                             target_tile=48)
    assert sorted(perm_s.tolist()) == list(range(n))
    assert bw_intra <= 48  # slabs re-RCM'd until the intra band fits


def test_hybrid_arrays_cover_all_edges_once():
    ei, n = _graph()
    perm, _ = banded.order_for_band(ei, n, max_tile=48, target_tile=48)
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    ei_r = inv[ei.astype(np.int64)].astype(np.int32)

    tile, mb, kb, rb, sb = banded.hybrid_widths(ei_r, n, tile=48)
    assert mb > 0  # boundary exists by construction
    n_band = round_up(n + 1, tile)
    arrs = banded.hybrid_arrays_np(ei_r, n_band, tile, mb, kb, rb, sb)

    # band edges
    b, t, w = np.nonzero(arrs["m"])
    band_edges = set(zip((b * tile + t).tolist(), ((b - 1) * tile + w).tolist()))
    # boundary edges
    rows_b, nbr_b, km = arrs["rows_b"], arrs["nbr_b"], arrs["kmask_b"]
    mrow, mk = np.nonzero(km)
    tab_edges = set(zip(rows_b[mrow].tolist(), nbr_b[mrow, mk].tolist()))

    real = ei_r[:, ei_r[0] != ei_r[1]]
    want = set(zip(real[0].tolist(), real[1].tolist()))
    assert band_edges | tab_edges == want
    assert not band_edges & tab_edges  # exactly-once split


def test_hybrid_conv_matches_coo_formulation():
    """feast_conv_hybrid (interpret-mode Pallas + table correction) ==
    sorted-COO feast_conv, forward AND input/param gradients."""
    rng = np.random.default_rng(3)
    c_in, c_out, heads = 6, 8, 9
    ei, n = _graph()
    perm, _ = banded.order_for_band(ei, n, max_tile=48, target_tile=48)
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    ei_r = inv[ei.astype(np.int64)].astype(np.int32)

    tile, mb, kb, rb, sb = banded.hybrid_widths(ei_r, n, tile=48)
    n_band = round_up(n + 1, tile)
    trash = n_band - 1
    ei_pad = np.full((2, ei_r.shape[1] + 4), trash, np.int32)
    ei_pad[:, : ei_r.shape[1]] = ei_r
    tile2, mb2, kb2, rb2, sb2 = banded.hybrid_widths(ei_pad, n_band, tile=tile)
    arrs = banded.hybrid_arrays_np(ei_pad, n_band, tile, mb2, kb2, rb2, sb2)

    x = np.zeros((n_band, c_in), np.float32)
    x[:n] = rng.normal(size=(n, c_in)).astype(np.float32)
    deg = np.zeros(n_band, np.float32)
    np.add.at(deg, ei_r[0], 1.0)
    params = init_feast_params(jax.random.PRNGKey(0), c_in, c_out, heads)

    order = np.argsort(ei_r[0], kind="stable")
    ref_fn = jax.jit(lambda p, x_: feast_conv(
        p, x_, jnp.asarray(ei_r[:, order]), rows_sorted=True))
    hyb_fn = jax.jit(lambda p, x_: banded_pallas.feast_conv_hybrid(
        p, x_, jnp.asarray(arrs["m"]), jnp.asarray(arrs["rows_b"]),
        jnp.asarray(arrs["nbr_b"]), jnp.asarray(arrs["kmask_b"]),
        jnp.asarray(arrs["src_b"]), jnp.asarray(arrs["rev_b"]),
        jnp.asarray(deg), compute_dtype=jnp.float32))

    ref = ref_fn(params, jnp.asarray(x[:n]))
    hyb = hyb_fn(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(hyb)[:n], np.asarray(ref),
                               rtol=3e-4, atol=3e-5)

    g = rng.normal(size=(n, c_out)).astype(np.float32)

    def loss_ref(p, x_):
        return (ref_fn(p, x_) * g).sum()

    def loss_hyb(p, x_):
        return (hyb_fn(p, x_)[:n] * g).sum()

    gr_p, gr_x = jax.grad(loss_ref, argnums=(0, 1))(params, jnp.asarray(x[:n]))
    gh_p, gh_x = jax.grad(loss_hyb, argnums=(0, 1))(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(gh_x)[:n], np.asarray(gr_x),
                               rtol=3e-4, atol=3e-4)
    for a, b in zip(gh_p, gr_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4)


@pytest.mark.slow
def test_full_model_with_hybrid_levels(monkeypatch):
    """End-to-end: with MAX_BAND_TILE forced tiny, build_dual_sample routes
    the L1 levels through the hybrid (slab order + band + boundary tables)
    and the full DualGNN forward/backward matches the dense-table path."""
    from geobignn_tpu.data.builder import (
        BuildConfig, attach_tables, build_dual_sample, build_raw, widths_for,
    )
    from geobignn_tpu.models import DualGNN

    monkeypatch.setattr(banded, "MAX_BAND_TILE", 64)

    m_o = synth.icosphere(3)
    m_n = synth.add_noise(m_o, 0.2, seed=1)
    bc = BuildConfig(granularity=64, reorder=True)
    bv, bf, meta = build_raw(m_n, m_o, bc)
    s, _ = build_dual_sample(m_n, m_o, bc)
    w_h = widths_for(bv, bf, meta["fv_indices"], with_bands=True)
    w_t = widths_for(bv, bf, meta["fv_indices"], with_bands=False)
    s_hyb = attach_tables(s, w_h)
    s_tbl = attach_tables(s, w_t)
    # at tile cap 64 the facet L1 (bw ~830) is over-wide -> hybrid with a
    # real boundary (banded sub-graph correction by default); the vertex
    # L1 (bw ~41) passes the window check whole and attaches as a plain
    # band at the hybrid tile
    assert (s_hyb.f.levels[0].jnodes is not None
            or s_hyb.f.levels[0].nbr_b is not None)
    assert s_hyb.f.levels[0].band is not None
    assert s_hyb.v.levels[0].band is not None
    assert s_tbl.v.levels[0].band is None

    model = DualGNN()
    params = model.init(jax.random.PRNGKey(0), s_tbl)
    v_ref, n_ref = model.apply(params, s_tbl)
    v_h, n_h = jax.jit(model.apply)(params, s_hyb)
    np.testing.assert_allclose(np.asarray(v_h), np.asarray(v_ref), atol=2e-2)
    assert np.abs(np.asarray(n_h) - np.asarray(n_ref)).max() < 5e-2

    def loss(p, s_):
        v, n = model.apply(p, s_)
        return (v * v).sum() + (n * n).sum()

    g_ref = jax.grad(loss)(params, s_tbl)
    g_h = jax.jit(jax.grad(loss))(params, s_hyb)
    for a, b in zip(jax.tree.leaves(g_h), jax.tree.leaves(g_ref)):
        d = np.abs(np.asarray(a) - np.asarray(b)).max()
        scale = max(float(np.abs(np.asarray(b)).max()), 1.0)
        assert d / scale < 5e-2, (d, scale)


def test_boundary_band_covers_all_edges_once():
    """band + banded-sub-graph split covers every real edge exactly once."""
    ei, n = _graph()
    perm, _ = banded.order_for_band(ei, n, max_tile=48, target_tile=48)
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    ei_r = inv[ei.astype(np.int64)].astype(np.int32)

    tile = 48
    n_band = round_up(n + 1, tile)
    jarrs = banded.boundary_band_np(ei_r, n_band, tile)
    assert jarrs is not None
    keep = ~banded.out_of_window(ei_r, tile)
    m = banded.band_mask_np(ei_r[:, keep], n_band, tile, check_bw=False)

    b, t, w = np.nonzero(m)
    band_edges = set(zip((b * tile + t).tolist(), ((b - 1) * tile + w).tolist()))

    jn = jarrs["jnodes"]
    jtile = jarrs["jband"].shape[1]
    bs, ts, ws = np.nonzero(jarrs["jband"])
    sub_edges = set(zip(
        jn[bs * jtile + ts].tolist(),
        jn[(bs - 1) * jtile + ws].tolist(),
    ))
    real = ei_r[:, ei_r[0] != ei_r[1]]
    want = set(zip(real[0].tolist(), real[1].tolist()))
    assert band_edges | sub_edges == want
    assert not band_edges & sub_edges


def test_hybrid_band_conv_matches_coo_formulation():
    """feast_conv_hybrid_band (banded sub-graph correction) == sorted-COO
    feast_conv, forward AND input/param gradients."""
    rng = np.random.default_rng(7)
    c_in, c_out, heads = 6, 8, 9
    ei, n = _graph()
    perm, _ = banded.order_for_band(ei, n, max_tile=48, target_tile=48)
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    ei_r = inv[ei.astype(np.int64)].astype(np.int32)

    tile = 48
    n_band = round_up(n + 1, tile)
    trash = n_band - 1
    ei_pad = np.full((2, ei_r.shape[1] + 4), trash, np.int32)
    ei_pad[:, : ei_r.shape[1]] = ei_r
    jarrs = banded.boundary_band_np(ei_pad, n_band, tile)
    keep = ~banded.out_of_window(ei_pad, tile)
    m = banded.band_mask_np(ei_pad[:, keep], n_band, tile, check_bw=False)

    x = np.zeros((n_band, c_in), np.float32)
    x[:n] = rng.normal(size=(n, c_in)).astype(np.float32)
    deg = np.zeros(n_band, np.float32)
    np.add.at(deg, ei_r[0], 1.0)
    params = init_feast_params(jax.random.PRNGKey(0), c_in, c_out, heads)

    order = np.argsort(ei_r[0], kind="stable")
    ref_fn = jax.jit(lambda p, x_: feast_conv(
        p, x_, jnp.asarray(ei_r[:, order]), rows_sorted=True))
    hyb_fn = jax.jit(lambda p, x_: banded_pallas.feast_conv_hybrid_band(
        p, x_, jnp.asarray(m), jnp.asarray(jarrs["jnodes"]),
        jnp.asarray(jarrs["jband"]), jnp.asarray(jarrs["jpos"]),
        jnp.asarray(deg), compute_dtype=jnp.float32))

    ref = ref_fn(params, jnp.asarray(x[:n]))
    hyb = hyb_fn(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(hyb)[:n], np.asarray(ref),
                               rtol=3e-4, atol=3e-5)

    g = rng.normal(size=(n, c_out)).astype(np.float32)

    def loss_ref(p, x_):
        return (ref_fn(p, x_) * g).sum()

    def loss_hyb(p, x_):
        return (hyb_fn(p, x_)[:n] * g).sum()

    gr_p, gr_x = jax.grad(loss_ref, argnums=(0, 1))(params, jnp.asarray(x[:n]))
    gh_p, gh_x = jax.grad(loss_hyb, argnums=(0, 1))(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(gh_x)[:n], np.asarray(gr_x),
                               rtol=3e-4, atol=3e-4)
    for a, b in zip(gh_p, gr_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4)


def test_boundary_band_merged_sizing_pins_shapes():
    """tile_out/pad_out (the dataset-merged TableWidths j_tile/j_pad,
    ADVICE r4 medium) pin the jband shapes across batches whose natural
    boundary sizes differ, and the padded correction stays exact."""
    rng = np.random.default_rng(11)
    c_in, c_out, heads = 5, 7, 4
    ei, n = _graph()
    perm, _ = banded.order_for_band(ei, n, max_tile=48, target_tile=48)
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    ei_r = inv[ei.astype(np.int64)].astype(np.int32)

    tile = 48
    n_band = round_up(n + 1, tile)
    nat = banded.boundary_band_np(ei_r, n_band, tile)
    assert nat is not None
    jt_nat = int(nat["jband"].shape[1])
    jp_nat = int(nat["jnodes"].size)

    # merged sizing strictly larger than this batch's natural need
    jt_m, jp_m = jt_nat * 2, jp_nat + 3 * jt_nat
    padded = banded.boundary_band_np(
        ei_r, n_band, tile, tile_out=jt_m, pad_out=jp_m)
    assert int(padded["jband"].shape[1]) == jt_m
    assert int(padded["jnodes"].size) == round_up(jp_m, jt_m)
    # deterministic: any batch with natural need <= merged gets THIS shape

    x = np.zeros((n_band, c_in), np.float32)
    x[:n] = rng.normal(size=(n, c_in)).astype(np.float32)
    deg = np.zeros(n_band, np.float32)
    np.add.at(deg, ei_r[0], 1.0)
    params = init_feast_params(jax.random.PRNGKey(3), c_in, c_out, heads)
    keep = ~banded.out_of_window(ei_r, tile)
    m = banded.band_mask_np(ei_r[:, keep], n_band, tile, check_bw=False)

    def run(jarrs):
        return banded_pallas.feast_conv_hybrid_band(
            params, jnp.asarray(x), jnp.asarray(m),
            jnp.asarray(jarrs["jnodes"]), jnp.asarray(jarrs["jband"]),
            jnp.asarray(jarrs["jpos"]), jnp.asarray(deg),
            compute_dtype=jnp.float32)

    np.testing.assert_allclose(
        np.asarray(run(padded))[:n], np.asarray(run(nat))[:n],
        rtol=1e-5, atol=1e-5)


def test_widths_for_records_and_merges_jband_sizing():
    """widths_for emits 7-slot hyb tuples; merge takes maxima when both
    operands have a jband and drops to 0 (table correction) otherwise."""
    from geobignn_tpu.data.builder import TableWidths, widths_for, _hyb7

    h_a = (64, 8, 8, 8, 8, 128, 256)
    h_b = (64, 16, 8, 8, 8, 128, 384)
    h_c = (64, 8, 8, 8, 8, 0, 0)  # jband-infeasible sample
    base = dict(k_v=(8,) * 3, k_f=(8,) * 3, mem_v=(4,) * 4, mem_f=(4,) * 4,
                up_v=(4,) * 2, up_f=(4,) * 2, fv_r=8)
    mk = lambda h: TableWidths(**base, hyb_f=(h, (0,) * 7, (0,) * 7))
    m_ab = mk(h_a).merge(mk(h_b))
    assert m_ab.hyb_f[0] == (64, 16, 8, 8, 8, 128, 384)
    m_ac = mk(h_a).merge(mk(h_c))
    assert m_ac.hyb_f[0] == (64, 8, 8, 8, 8, 0, 0)
    assert _hyb7((64, 8, 8, 8, 8)) == (64, 8, 8, 8, 8, 0, 0)
