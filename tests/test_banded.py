"""Banded block-dense FeaStConv: parity vs the COO/table formulations."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geobignn_tpu.ops import banded
from geobignn_tpu.ops.feastconv import FeastParams, feast_conv
from geobignn_tpu.structs import round_up


def _mesh_like_graph(seed=0):
    """Icosphere vertex graph: the real workload's structure."""
    from geobignn_tpu import graphs
    from geobignn_tpu.data import synth

    m = synth.icosphere(2)
    ei = graphs.build_vertex_graph_1ring(m.ev_indices, m.n_vertices)
    return ei.astype(np.int64), m.n_vertices


def _apply_rcm(ei, n):
    perm = banded.rcm_order(ei, n)  # new slot -> old id
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    return np.stack([inv[ei[0]], inv[ei[1]]]), perm, inv


def test_rcm_shrinks_bandwidth():
    ei, n = _mesh_like_graph()
    bw0 = banded.bandwidth_of(ei)
    ei_r, _, _ = _apply_rcm(ei, n)
    bw1 = banded.bandwidth_of(ei_r)
    assert bw1 < bw0
    assert bw1 <= 4 * int(np.sqrt(n))  # mesh graphs: O(sqrt N) bandwidth


def test_band_mask_roundtrip():
    ei, n = _mesh_like_graph()
    ei_r, _, _ = _apply_rcm(ei, n)
    tile = banded.pick_tile(banded.bandwidth_of(ei_r), granularity=64, min_tile=64)
    n_pad = round_up(n, tile)
    pad = np.full((2, 7), n_pad - 1, np.int64)  # trash-padded edges ignored
    m = banded.band_mask_np(np.concatenate([ei_r, pad], axis=1), n_pad, tile)
    # every real edge present exactly once
    assert int(m.sum()) == ei_r.shape[1]
    b, t, w = np.nonzero(m)
    rows = b * tile + t
    cols = (b - 1) * tile + w
    got = set(zip(rows.tolist(), cols.tolist()))
    want = set(zip(ei_r[0].tolist(), ei_r[1].tolist()))
    assert got == want


def test_banded_conv_matches_coo():
    ei, n = _mesh_like_graph()
    ei_r, _, _ = _apply_rcm(ei, n)
    tile = banded.pick_tile(banded.bandwidth_of(ei_r), granularity=64, min_tile=64)
    n_pad = round_up(n, tile)
    m = banded.band_mask_np(ei_r, n_pad, tile)

    rng = np.random.default_rng(0)
    c_in, c_out, heads = 6, 5, 9
    x = np.zeros((n_pad, c_in), np.float32)
    x[:n] = rng.normal(size=(n, c_in)).astype(np.float32)
    params = FeastParams(
        u=jnp.asarray(rng.normal(size=(c_in, heads)).astype(np.float32) * 0.5),
        c=jnp.asarray(rng.normal(size=(heads,)).astype(np.float32) * 0.3),
        w=jnp.asarray(rng.normal(size=(heads, c_in, c_out)).astype(np.float32) * 0.4),
        b=jnp.asarray(rng.normal(size=(c_out,)).astype(np.float32)),
    )
    deg = np.zeros(n_pad, np.float32)
    np.add.at(deg, ei_r[0], 1.0)

    ref = feast_conv(params, jnp.asarray(x), jnp.asarray(ei_r.astype(np.int32)))
    out = jax.jit(banded.feast_conv_banded)(
        params, jnp.asarray(x), jnp.asarray(m), jnp.asarray(deg)
    )
    np.testing.assert_allclose(np.asarray(out)[:n], np.asarray(ref)[:n],
                               rtol=2e-4, atol=2e-5)


def test_banded_conv_gradients_match_coo():
    ei, n = _mesh_like_graph()
    ei_r, _, _ = _apply_rcm(ei, n)
    tile = banded.pick_tile(banded.bandwidth_of(ei_r), granularity=64, min_tile=64)
    n_pad = round_up(n, tile)
    m = banded.band_mask_np(ei_r, n_pad, tile)

    rng = np.random.default_rng(1)
    c_in, c_out, heads = 6, 4, 5
    x = np.zeros((n_pad, c_in), np.float32)
    x[:n] = rng.normal(size=(n, c_in)).astype(np.float32)
    params = FeastParams(
        u=jnp.asarray(rng.normal(size=(c_in, heads)).astype(np.float32) * 0.5),
        c=jnp.asarray(rng.normal(size=(heads,)).astype(np.float32) * 0.3),
        w=jnp.asarray(rng.normal(size=(heads, c_in, c_out)).astype(np.float32) * 0.4),
        b=jnp.zeros((c_out,), jnp.float32),
    )
    deg = np.zeros(n_pad, np.float32)
    np.add.at(deg, ei_r[0], 1.0)
    g = rng.normal(size=(n_pad, c_out)).astype(np.float32)
    g[n:] = 0.0

    def loss_coo(p, x_):
        return (feast_conv(p, x_, jnp.asarray(ei_r.astype(np.int32))) * g).sum()

    def loss_band(p, x_):
        return (banded.feast_conv_banded(p, x_, jnp.asarray(m), jnp.asarray(deg)) * g).sum()

    gp_ref, gx_ref = jax.grad(loss_coo, argnums=(0, 1))(params, jnp.asarray(x))
    gp, gx = jax.grad(loss_band, argnums=(0, 1))(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(gx)[:n], np.asarray(gx_ref)[:n],
                               rtol=5e-4, atol=5e-5)
    for a, b_ in zip(jax.tree.leaves(gp), jax.tree.leaves(gp_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-4, atol=5e-5)


def test_banded_underflow_guard():
    """Extreme steering scores must not NaN (documented D clamp)."""
    ei, n = _mesh_like_graph()
    ei_r, _, _ = _apply_rcm(ei, n)
    tile = banded.pick_tile(banded.bandwidth_of(ei_r), granularity=64, min_tile=64)
    n_pad = round_up(n, tile)
    m = banded.band_mask_np(ei_r, n_pad, tile)
    rng = np.random.default_rng(2)
    x = np.zeros((n_pad, 6), np.float32)
    x[:n] = rng.normal(size=(n, 6)).astype(np.float32) * 100.0
    params = FeastParams(
        u=jnp.asarray(rng.normal(size=(6, 4)).astype(np.float32)),
        c=jnp.zeros((4,), jnp.float32),
        w=jnp.asarray(rng.normal(size=(4, 6, 3)).astype(np.float32) * 0.1),
        b=jnp.zeros((3,), jnp.float32),
    )
    deg = np.zeros(n_pad, np.float32)
    np.add.at(deg, ei_r[0], 1.0)
    out = banded.feast_conv_banded(params, jnp.asarray(x), jnp.asarray(m), jnp.asarray(deg))
    assert bool(jnp.isfinite(out).all())
