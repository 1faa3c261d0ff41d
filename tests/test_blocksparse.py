"""Block-sparse FeaStConv (ops/blocksparse.py) parity + builder tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from geobignn_tpu.data import synth
from geobignn_tpu.graphs import build_vertex_graph_1ring
from geobignn_tpu.ops import banded, blocksparse
from geobignn_tpu.ops.feastconv import feast_conv, init_feast_params
from geobignn_tpu.structs import round_up


def _rcm_graph(subdiv=3, tile=64):
    """RCM-ordered vertex graph of an icosphere, padded to a tile multiple."""
    m = synth.icosphere(subdiv)
    ei = build_vertex_graph_1ring(m.ev_indices, m.n_vertices)
    perm = banded.rcm_order(ei.astype(np.int64), m.n_vertices)
    inv = np.empty(m.n_vertices, np.int64)
    inv[perm] = np.arange(m.n_vertices)
    ei = inv[ei]
    n_pad = round_up(m.n_vertices + 1, tile)
    trash = n_pad - 1
    ei_pad = np.full((2, ei.shape[1] + 8), trash, np.int32)
    ei_pad[:, : ei.shape[1]] = ei
    return ei_pad, m.n_vertices, n_pad


def test_block_sparse_np_mask_matches_edges():
    ei, n, n_pad = _rcm_graph(tile=64)
    blk_idx, mask, k = blocksparse.block_sparse_np(ei, n_pad, 64)
    assert mask.shape == (n_pad // 64, 64, k * 64)
    # every real edge appears exactly once in the mask
    assert mask.sum() == (ei[0] != ei[1]).sum()
    # reconstruct the edge set from the mask
    b, t, w = np.nonzero(mask)
    rows = b * 64 + t
    cols = blk_idx[b, w // 64] * 64 + (w % 64)
    got = set(zip(rows.tolist(), cols.tolist()))
    real = ei[:, ei[0] != ei[1]]
    want = set(zip(real[0].tolist(), real[1].tolist()))
    assert got == want


def test_block_sparse_k_pad_and_overflow():
    ei, n, n_pad = _rcm_graph(tile=64)
    _, _, k = blocksparse.block_sparse_np(ei, n_pad, 64)
    blk_idx, mask, _ = blocksparse.block_sparse_np(ei, n_pad, 64, k_pad=k + 2)
    assert blk_idx.shape[1] == k + 2 and mask.shape[2] == (k + 2) * 64
    with pytest.raises(ValueError, match="column blocks"):
        blocksparse.block_sparse_np(ei, n_pad, 64, k_pad=max(k - 1, 1))
    assert blocksparse.blocks_needed(ei, n_pad, 64) == k


def test_feast_conv_blocksparse_forward_parity():
    """Kernel (interpret mode on CPU) == sorted-COO feast_conv on valid rows."""
    tile = 64
    ei, n, n_pad = _rcm_graph(tile=tile)
    blk_idx, mask, _ = blocksparse.block_sparse_np(ei, n_pad, tile)
    rng = np.random.default_rng(0)
    c_in, c_out, heads = 6, 8, 5
    x = np.zeros((n_pad, c_in), np.float32)
    x[:n] = rng.normal(size=(n, c_in)).astype(np.float32)
    deg = np.zeros(n_pad, np.float32)
    np.add.at(deg, ei[0][ei[0] != ei[1]], 1.0)
    params = init_feast_params(jax.random.PRNGKey(1), c_in, c_out, heads)

    ref = feast_conv(params, jnp.asarray(x), jnp.asarray(ei), deg=jnp.asarray(deg))
    got = blocksparse.feast_conv_blocksparse(
        params, jnp.asarray(x), jnp.asarray(mask), jnp.asarray(blk_idx),
        jnp.asarray(deg), compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(got)[:n], np.asarray(ref)[:n], rtol=1e-5, atol=1e-5
    )


def test_feast_conv_blocksparse_gradient_parity():
    tile = 64
    ei, n, n_pad = _rcm_graph(subdiv=2, tile=tile)
    blk_idx, mask, _ = blocksparse.block_sparse_np(ei, n_pad, tile)
    rng = np.random.default_rng(1)
    c_in, c_out, heads = 4, 6, 3
    x = np.zeros((n_pad, c_in), np.float32)
    x[:n] = rng.normal(size=(n, c_in)).astype(np.float32)
    deg = np.zeros(n_pad, np.float32)
    np.add.at(deg, ei[0][ei[0] != ei[1]], 1.0)
    params = init_feast_params(jax.random.PRNGKey(2), c_in, c_out, heads)
    tgt = rng.normal(size=(n_pad, c_out)).astype(np.float32)
    msk = (np.arange(n_pad) < n).astype(np.float32)[:, None]

    def loss_ref(p, xx):
        out = feast_conv(p, xx, jnp.asarray(ei), deg=jnp.asarray(deg))
        return ((out - tgt) ** 2 * msk).sum()

    def loss_bs(p, xx):
        out = blocksparse.feast_conv_blocksparse(
            p, xx, jnp.asarray(mask), jnp.asarray(blk_idx), jnp.asarray(deg),
            compute_dtype=jnp.float32,
        )
        return ((out - tgt) ** 2 * msk).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(params, jnp.asarray(x))
    g_bs = jax.grad(loss_bs, argnums=(0, 1))(params, jnp.asarray(x))
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_bs)):
        sc = max(float(jnp.abs(a).max()), 1e-6)
        np.testing.assert_allclose(
            np.asarray(a) / sc, np.asarray(b) / sc, rtol=2e-4, atol=2e-5
        )


def test_feast_conv_blocksparse_narrowing_parity():
    """c_in > c_out engages the transform-first schedule (_use_tf True:
    _fwd_kernel_tf/_bwd_kernel_tf, tf wbar specs, dw moveaxis) — forward
    AND gradient parity vs sorted-COO, mirroring the widening tests above
    which always take the aggregate-first path."""
    from geobignn_tpu.ops.banded_pallas import _use_tf

    tile = 64
    ei, n, n_pad = _rcm_graph(subdiv=2, tile=tile)
    blk_idx, mask, _ = blocksparse.block_sparse_np(ei, n_pad, tile)
    rng = np.random.default_rng(7)
    c_in, c_out, heads = 6, 4, 3
    assert _use_tf(c_in, c_out)
    x = np.zeros((n_pad, c_in), np.float32)
    x[:n] = rng.normal(size=(n, c_in)).astype(np.float32)
    deg = np.zeros(n_pad, np.float32)
    np.add.at(deg, ei[0][ei[0] != ei[1]], 1.0)
    params = init_feast_params(jax.random.PRNGKey(4), c_in, c_out, heads)
    tgt = rng.normal(size=(n_pad, c_out)).astype(np.float32)
    msk = (np.arange(n_pad) < n).astype(np.float32)[:, None]

    ref_out = feast_conv(
        params, jnp.asarray(x), jnp.asarray(ei), deg=jnp.asarray(deg))
    got_out = blocksparse.feast_conv_blocksparse(
        params, jnp.asarray(x), jnp.asarray(mask), jnp.asarray(blk_idx),
        jnp.asarray(deg), compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(got_out)[:n], np.asarray(ref_out)[:n], rtol=1e-5, atol=1e-5
    )

    def loss_ref(p, xx):
        out = feast_conv(p, xx, jnp.asarray(ei), deg=jnp.asarray(deg))
        return ((out - tgt) ** 2 * msk).sum()

    def loss_bs(p, xx):
        out = blocksparse.feast_conv_blocksparse(
            p, xx, jnp.asarray(mask), jnp.asarray(blk_idx), jnp.asarray(deg),
            compute_dtype=jnp.float32,
        )
        return ((out - tgt) ** 2 * msk).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(params, jnp.asarray(x))
    g_bs = jax.grad(loss_bs, argnums=(0, 1))(params, jnp.asarray(x))
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_bs)):
        sc = max(float(jnp.abs(a).max()), 1e-6)
        np.testing.assert_allclose(
            np.asarray(a) / sc, np.asarray(b) / sc, rtol=2e-4, atol=2e-5
        )


def test_xla_numerator_matches_kernel():
    """The pure-XLA twin (_xla_numerator) pins the kernel's numerator."""
    tile = 64
    ei, n, n_pad = _rcm_graph(subdiv=2, tile=tile)
    blk_idx, mask, _ = blocksparse.block_sparse_np(ei, n_pad, tile)
    rng = np.random.default_rng(3)
    heads, c_in, c_out = 3, 4, 6
    r = jnp.asarray(rng.uniform(0.1, 1, (n_pad, heads)).astype(np.float32))
    p = jnp.asarray(rng.uniform(0.1, 1, (n_pad, heads)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(n_pad, c_in)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(heads, c_in, c_out)).astype(np.float32))
    a = blocksparse.bs_aggregate(
        r, p, x, w, jnp.asarray(mask), jnp.asarray(blk_idx), jnp.float32
    )
    b = blocksparse._xla_numerator(
        r, p, x, w, jnp.asarray(mask), jnp.asarray(blk_idx), jnp.float32
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_model_blocksparse_level_parity():
    """Full DualGNN with one level forced onto the block-sparse path matches
    the plain (no-tables) model bit-for-bit-ish on valid rows."""
    import dataclasses

    from geobignn_tpu.data.builder import (
        BuildConfig, attach_tables, build_dual_sample, build_raw, widths_for,
    )
    from geobignn_tpu.models import DualGNN

    m_o = synth.icosphere(3)
    m_n = synth.add_noise(m_o, 0.15, seed=2)
    cfg = BuildConfig(granularity=64, reorder=True)
    bv, bf, meta = build_raw(m_n, m_o, cfg)
    sample, plan = build_dual_sample(m_n, m_o, cfg)
    w = widths_for(bv, bf, meta["fv_indices"], with_bands=True)
    # force vertex level 1 and facet level 1 onto the block-sparse path by
    # dropping their contiguous-band tiles (simulates an over-wide band)
    w = dataclasses.replace(
        w, tile_v=(0,) + w.tile_v[1:], tile_f=(0,) + w.tile_f[1:]
    )
    assert w.bsk_v[0] >= 1 and w.bsk_f[0] >= 1
    sp = attach_tables(sample, w)
    assert sp.v.levels[0].blk_idx is not None
    assert sp.f.levels[0].blk_idx is not None

    model = DualGNN()
    params = model.init(jax.random.PRNGKey(0), sample)
    v0, n0 = model.apply(params, sample)  # COO path
    v1, n1 = model.apply(params, sp)  # tables + block-sparse L1
    # kernel matmuls run bf16 (same default as the banded path, see
    # tests/test_banded_model.py atol=2e-2); positions/normals tolerance
    # accordingly
    mv = np.asarray(sample.v.levels[0].node_mask) > 0
    mf = np.asarray(sample.f.levels[0].node_mask) > 0
    np.testing.assert_allclose(np.asarray(v1)[mv], np.asarray(v0)[mv], atol=2e-2)
    np.testing.assert_allclose(np.asarray(n1)[mf], np.asarray(n0)[mf], atol=4e-2)

    # gradients flow end-to-end through the block-sparse levels
    def loss(p):
        v, n = model.apply(p, sp)
        return (jnp.abs(v - sp.v.y).sum(1) * sp.v.levels[0].node_mask).sum()

    g = jax.grad(loss)(params)
    gmax = max(float(jnp.abs(l).max()) for l in jax.tree.leaves(g))
    assert np.isfinite(gmax) and gmax > 0
