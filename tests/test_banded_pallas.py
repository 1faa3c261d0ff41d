"""Pallas banded FeaStConv kernels vs the XLA banded formulation.

On the CPU test mesh the kernels run in Pallas interpreter mode
(ops/banded_pallas._interpret); the same code compiles for TPU."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from geobignn_tpu import graphs
from geobignn_tpu.data import synth
from geobignn_tpu.ops import banded, banded_pallas
from geobignn_tpu.ops.feastconv import FeastParams
from geobignn_tpu.structs import round_up


def _setup(seed=0, c_in=6, c_out=5, heads=9):
    m_mesh = synth.icosphere(2)
    ei = graphs.build_vertex_graph_1ring(m_mesh.ev_indices, m_mesh.n_vertices)
    n = m_mesh.n_vertices
    perm = banded.rcm_order(ei.astype(np.int64), n)
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    ei_r = np.stack([inv[ei[0]], inv[ei[1]]])
    tile = banded.pick_tile(banded.bandwidth_of(ei_r), granularity=64, min_tile=64)
    n_pad = round_up(n, tile)
    mask = banded.band_mask_np(ei_r, n_pad, tile)

    rng = np.random.default_rng(seed)
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
    return params, x, mask, deg, n


def test_pallas_forward_matches_xla_banded():
    params, x, m, deg, n = _setup()
    ref = banded.feast_conv_banded(params, jnp.asarray(x), jnp.asarray(m), jnp.asarray(deg))
    out = jax.jit(
        lambda p, x_, m_, d_: banded_pallas.feast_conv_banded_pallas(
            p, x_, m_, d_, compute_dtype=jnp.float32
        )
    )(params, jnp.asarray(x), jnp.asarray(m), jnp.asarray(deg))
    np.testing.assert_allclose(np.asarray(out)[:n], np.asarray(ref)[:n],
                               rtol=2e-4, atol=2e-5)


def test_pallas_gradients_match_xla_banded():
    params, x, m, deg, n = _setup(seed=1, c_out=4, heads=5)
    g = np.random.default_rng(3).normal(size=(x.shape[0], 4)).astype(np.float32)
    g[n:] = 0.0

    def loss_ref(p, x_):
        return (banded.feast_conv_banded(p, x_, jnp.asarray(m), jnp.asarray(deg)) * g).sum()

    def loss_pl(p, x_):
        return (
            banded_pallas.feast_conv_banded_pallas(
                p, x_, jnp.asarray(m), jnp.asarray(deg), compute_dtype=jnp.float32
            )
            * g
        ).sum()

    gp_ref, gx_ref = jax.grad(loss_ref, argnums=(0, 1))(params, jnp.asarray(x))
    gp, gx = jax.jit(jax.grad(loss_pl, argnums=(0, 1)))(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(gx)[:n], np.asarray(gx_ref)[:n],
                               rtol=5e-4, atol=5e-5)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gp_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_transform_first_matches_aggregate_first(monkeypatch):
    """The C_out-space (transform-first) schedule and the C_in-space
    (aggregate-first) schedule are the same math on different matmul
    shapes — outputs and every gradient must agree.  c_out < c_in routes
    tf by default; GBN_NO_TF=1 forces the original schedule."""
    params, x, m, deg, n = _setup(seed=4, c_in=8, c_out=4, heads=5)
    g = np.random.default_rng(5).normal(size=(x.shape[0], 4)).astype(np.float32)
    g[n:] = 0.0

    def loss(p, x_):
        return (
            banded_pallas.feast_conv_banded_pallas(
                p, x_, jnp.asarray(m), jnp.asarray(deg),
                compute_dtype=jnp.float32,
            ) * g
        ).sum()

    monkeypatch.delenv("GBN_NO_TF", raising=False)
    out_tf = banded_pallas.feast_conv_banded_pallas(
        params, jnp.asarray(x), jnp.asarray(m), jnp.asarray(deg),
        compute_dtype=jnp.float32)
    gp_tf, gx_tf = jax.grad(loss, argnums=(0, 1))(params, jnp.asarray(x))

    monkeypatch.setenv("GBN_NO_TF", "1")
    out_af = banded_pallas.feast_conv_banded_pallas(
        params, jnp.asarray(x), jnp.asarray(m), jnp.asarray(deg),
        compute_dtype=jnp.float32)
    gp_af, gx_af = jax.grad(loss, argnums=(0, 1))(params, jnp.asarray(x))

    np.testing.assert_allclose(np.asarray(out_tf), np.asarray(out_af),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(gx_tf)[:n], np.asarray(gx_af)[:n],
                               rtol=5e-5, atol=5e-6)
    for a, b in zip(jax.tree.leaves(gp_tf), jax.tree.leaves(gp_af)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-6)


def test_aggregate_first_kept_for_widening_convs():
    """c_out >= c_in keeps the aggregate-first schedule (tf would widen
    the window matmuls); parity vs the XLA banded formulation."""
    params, x, m, deg, n = _setup(seed=6, c_in=4, c_out=8, heads=5)
    from geobignn_tpu.ops.banded_pallas import _use_tf

    assert not _use_tf(4, 8)
    ref = banded.feast_conv_banded(
        params, jnp.asarray(x), jnp.asarray(m), jnp.asarray(deg))
    out = banded_pallas.feast_conv_banded_pallas(
        params, jnp.asarray(x), jnp.asarray(m), jnp.asarray(deg),
        compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out)[:n], np.asarray(ref)[:n],
                               rtol=2e-4, atol=2e-5)
