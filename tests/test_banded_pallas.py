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
