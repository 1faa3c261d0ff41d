"""Literal transcription of the FeaStNet/PyG equation vs ALL production
FeaStConv formulations.

The production kernels (sorted-COO, dense-table, banded Pallas, block-
sparse Pallas) and the torch parity twin share one author; a shared
misreading of the equation would pass every cross-check between them.
This file pins them all against a scalar-loop transcription written
directly from the published equation (FeaStNet, CVPR'18; PyG FeaStConv
docs; reference usage code/network.py:258-268):

    q_h(i, j) = softmax_h( u_h . (x_j - x_i) + c_h )
    out_i     = (1 / |N(i) u {i}|) sum_{j in N(i) u {i}} sum_h q_h W_h x_j + b

with one EXPLICIT self-loop edge appended per node (PyG removes then
re-adds exactly one), float64, no vectorization — deliberately distinct
from every production formulation (which use an implicit softmax(c)
self-term and /(deg+1)).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from geobignn_tpu import graphs
from geobignn_tpu.data import synth
from geobignn_tpu.ops import banded, banded_pallas, blocksparse
from geobignn_tpu.ops import table as tbl
from geobignn_tpu.ops.feastconv import (
    FeastParams,
    feast_conv,
    feast_conv_dense_reference,
    feast_conv_table,
)
from geobignn_tpu.structs import round_up


def feast_equation(u, c, w, b, x, edges):
    """Scalar-loop transcription.  edges: (2, E) [dst, src], NO self-loops.
    Returns (out, q_edges) — q for the non-self edges, for property tests."""
    n, _ = x.shape
    heads, _, c_out = w.shape
    ei = np.concatenate(
        [edges, np.stack([np.arange(n), np.arange(n)])], axis=1
    )
    acc = np.zeros((n, c_out))
    cnt = np.zeros(n)
    q_edges = np.zeros((edges.shape[1], heads))
    for e in range(ei.shape[1]):
        i, j = int(ei[0, e]), int(ei[1, e])
        s = np.empty(heads)
        for h in range(heads):
            s[h] = np.dot(u[:, h], x[j] - x[i]) + c[h]
        q = np.exp(s - s.max())
        q = q / q.sum()
        if e < edges.shape[1]:
            q_edges[e] = q
        for h in range(heads):
            acc[i] += q[h] * (x[j] @ w[h])
        cnt[i] += 1
    out = acc / np.maximum(cnt, 1.0)[:, None] + b
    return out, q_edges


def _random_params(rng, c_in, c_out, heads):
    return FeastParams(
        u=jnp.asarray(rng.normal(size=(c_in, heads)) * 0.5, jnp.float32),
        c=jnp.asarray(rng.normal(size=(heads,)) * 0.3, jnp.float32),
        w=jnp.asarray(rng.normal(size=(heads, c_in, c_out)) * 0.4, jnp.float32),
        b=jnp.asarray(rng.normal(size=(c_out,)), jnp.float32),
    )


def _np_params(p: FeastParams):
    return tuple(np.asarray(a, np.float64) for a in p)


def _random_graph(rng, n, avg_deg=5):
    """Random undirected simple graph with every node connected (so the
    transcription's mean and the production /(deg+1) see the same counts)."""
    m = n * avg_deg // 2
    pairs = rng.integers(0, n, size=(m, 2))
    pairs = pairs[pairs[:, 0] != pairs[:, 1]]
    # ensure no isolated nodes: chain every node to its successor
    chain = np.stack([np.arange(n - 1), np.arange(1, n)], axis=1)
    pairs = np.concatenate([pairs, chain], axis=0)
    both = np.concatenate([pairs, pairs[:, ::-1]], axis=0)
    uniq = np.unique(both, axis=0)
    return np.ascontiguousarray(uniq.T.astype(np.int32))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_coo_and_table_match_equation_random_graphs(seed):
    rng = np.random.default_rng(seed)
    n, c_in, c_out, heads = 23, 5, 4, 3
    ei = _random_graph(rng, n)
    x = rng.normal(size=(n, c_in)).astype(np.float32)
    params = _random_params(rng, c_in, c_out, heads)
    want, _ = feast_equation(*_np_params(params), x.astype(np.float64),
                             ei.astype(np.int64))

    # sorted-COO formulation (rows must be sorted for the fast path; sort)
    order = np.argsort(ei[0], kind="stable")
    ei_s = ei[:, order]
    out_coo = jax.jit(feast_conv)(params, jnp.asarray(x), jnp.asarray(ei_s))
    np.testing.assert_allclose(np.asarray(out_coo), want, rtol=3e-4, atol=3e-5)

    # dense-table formulation
    nbr, kmask, _ = tbl.neighbor_table_np(ei_s, n, granularity=1)
    rev, _ = tbl.reverse_table_np(nbr, n, granularity=1)
    out_tab = jax.jit(feast_conv_table)(
        params, jnp.asarray(x), jnp.asarray(nbr), jnp.asarray(kmask),
        jnp.asarray(rev),
    )
    np.testing.assert_allclose(np.asarray(out_tab), want, rtol=3e-4, atol=3e-5)

    # the in-repo dense reference must ALSO match the outside transcription
    out_dense = feast_conv_dense_reference(params, jnp.asarray(x), jnp.asarray(ei_s))
    np.testing.assert_allclose(np.asarray(out_dense), want, rtol=3e-4, atol=3e-5)


def test_pallas_formulations_match_equation_mesh_graph():
    """Banded + block-sparse Pallas kernels vs the transcription on a real
    (RCM-ordered icosphere) graph — interpret mode on CPU."""
    rng = np.random.default_rng(7)
    c_in, c_out, heads = 6, 5, 9
    m = synth.icosphere(2)
    ei = graphs.build_vertex_graph_1ring(m.ev_indices, m.n_vertices)
    n = m.n_vertices
    perm = banded.rcm_order(ei.astype(np.int64), n)
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    ei = np.stack([inv[ei[0]], inv[ei[1]]]).astype(np.int32)
    x = rng.normal(size=(n, c_in)).astype(np.float32)
    params = _random_params(rng, c_in, c_out, heads)
    want, _ = feast_equation(*_np_params(params), x.astype(np.float64),
                             ei.astype(np.int64))

    tile = banded.pick_tile(banded.bandwidth_of(ei), granularity=64, min_tile=64)
    n_pad = round_up(n, tile)
    xp = np.zeros((n_pad, c_in), np.float32)
    xp[:n] = x
    deg = np.zeros(n_pad, np.float32)
    np.add.at(deg, ei[0], 1.0)

    mask = banded.band_mask_np(ei, n_pad, tile)
    out_band = jax.jit(
        lambda p, x_, m_, d_: banded_pallas.feast_conv_banded_pallas(
            p, x_, m_, d_, compute_dtype=jnp.float32
        )
    )(params, jnp.asarray(xp), jnp.asarray(mask), jnp.asarray(deg))
    np.testing.assert_allclose(np.asarray(out_band)[:n], want, rtol=3e-4, atol=3e-5)

    blk_idx, bmask, _ = blocksparse.block_sparse_np(ei, n_pad, tile)
    out_blk = jax.jit(
        lambda p, x_, m_, bi, d_: blocksparse.feast_conv_blocksparse(
            p, x_, m_, bi, d_, compute_dtype=jnp.float32
        )
    )(params, jnp.asarray(xp), jnp.asarray(bmask), jnp.asarray(blk_idx),
      jnp.asarray(deg))
    np.testing.assert_allclose(np.asarray(out_blk)[:n], want, rtol=3e-4, atol=3e-5)


def test_equation_properties():
    """Σ_h q_h = 1 per edge; q depends only on feature DIFFERENCES (global
    translation invariance); and the production conv inherits both (its
    translated-input output matches the translated-input transcription)."""
    rng = np.random.default_rng(11)
    n, c_in, c_out, heads = 17, 4, 3, 5
    ei = _random_graph(rng, n)
    x = rng.normal(size=(n, c_in))
    params = _random_params(rng, c_in, c_out, heads)
    pn = _np_params(params)

    _, q = feast_equation(*pn, x, ei.astype(np.int64))
    np.testing.assert_allclose(q.sum(axis=1), 1.0, atol=1e-12)

    t = rng.normal(size=(c_in,))
    want_t, q_t = feast_equation(*pn, x + t, ei.astype(np.int64))
    np.testing.assert_allclose(q_t, q, atol=1e-12)

    order = np.argsort(ei[0], kind="stable")
    out_t = jax.jit(feast_conv)(
        params, jnp.asarray((x + t).astype(np.float32)), jnp.asarray(ei[:, order])
    )
    np.testing.assert_allclose(np.asarray(out_t), want_t, rtol=3e-4, atol=3e-5)
