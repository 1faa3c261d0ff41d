import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geobignn_tpu import graphs
from geobignn_tpu.data import synth
from geobignn_tpu.ops import segment
from geobignn_tpu.ops.feastconv import (
    feast_conv,
    feast_conv_dense_reference,
    init_feast_params,
)


def test_segment_reductions():
    ids = jnp.array([0, 0, 2, 1, 2, 2])
    x = jnp.arange(6.0).reshape(6, 1)
    np.testing.assert_allclose(
        segment.segment_sum(x, ids, 4).ravel(), [1, 3, 11, 0]
    )
    np.testing.assert_allclose(
        segment.segment_mean(x, ids, 4).ravel(), [0.5, 3, 11 / 3, 0]
    )
    np.testing.assert_allclose(
        segment.segment_max(x, ids, 4).ravel(), [1, 3, 5, 0]
    )
    np.testing.assert_allclose(segment.segment_count(ids, 4), [2, 1, 3, 0])


def _mesh_graph():
    m = synth.add_noise(synth.icosphere(2), 0.2)
    ei = graphs.build_vertex_graph_1ring(m.ev_indices, m.n_vertices)
    return m, jnp.asarray(ei)


def test_feast_conv_matches_dense_reference():
    m, ei = _mesh_graph()
    key = jax.random.PRNGKey(0)
    params = init_feast_params(key, 6, 16, heads=9)
    x = jax.random.normal(jax.random.PRNGKey(1), (m.n_vertices, 6))
    out = feast_conv(params, x, ei)
    ref = feast_conv_dense_reference(params, x, ei)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_feast_conv_permutation_equivariance():
    m, ei = _mesh_graph()
    n = m.n_vertices
    params = init_feast_params(jax.random.PRNGKey(0), 6, 8, heads=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (n, 6))
    perm = np.random.default_rng(0).permutation(n)
    inv = np.argsort(perm)
    ei_p = jnp.asarray(inv)[ei]
    out = feast_conv(params, x, ei)
    out_p = feast_conv(params, x[perm], ei_p)
    np.testing.assert_allclose(np.asarray(out[perm]), np.asarray(out_p), atol=1e-5)


def test_feast_conv_isolated_node_gets_self_only():
    # node 3 has no edges -> output = softmax(c)-blended W x_3 + b
    params = init_feast_params(jax.random.PRNGKey(2), 4, 4, heads=3)
    x = jax.random.normal(jax.random.PRNGKey(3), (5, 4))
    ei = jnp.array([[0, 1], [1, 0]], dtype=jnp.int32)
    out = feast_conv(params, x, ei)
    s = jax.nn.softmax(params.c)
    expected = x[3] @ jnp.einsum("h,hio->io", s, params.w) + params.b
    np.testing.assert_allclose(np.asarray(out[3]), np.asarray(expected), atol=1e-6)


def test_feast_conv_padding_trash_row_invariance():
    """Padding edges routed to a zero trash row must not change real outputs."""
    m, ei = _mesh_graph()
    n = m.n_vertices
    params = init_feast_params(jax.random.PRNGKey(0), 6, 16, heads=9)
    x = jax.random.normal(jax.random.PRNGKey(1), (n, 6))
    out = feast_conv(params, x, ei)

    n_pad, e_pad = n + 7, ei.shape[1] + 13
    x_pad = jnp.zeros((n_pad, 6)).at[:n].set(x)
    trash = n_pad - 1
    ei_pad = jnp.full((2, e_pad), trash, dtype=ei.dtype).at[:, : ei.shape[1]].set(ei)
    out_pad = feast_conv(params, x_pad, ei_pad)
    np.testing.assert_allclose(np.asarray(out_pad[:n]), np.asarray(out), atol=1e-5)


def test_feast_conv_grads_flow():
    m, ei = _mesh_graph()
    params = init_feast_params(jax.random.PRNGKey(0), 6, 8, heads=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (m.n_vertices, 6))

    def loss(p, x):
        return (feast_conv(p, x, ei) ** 2).sum()

    gp, gx = jax.grad(loss, argnums=(0, 1))(params, x)
    for leaf in jax.tree.leaves(gp) + [gx]:
        assert jnp.isfinite(leaf).all()
        assert jnp.abs(leaf).max() > 0


def test_feast_conv_grad_matches_dense_reference():
    m, ei = _mesh_graph()
    params = init_feast_params(jax.random.PRNGKey(0), 6, 8, heads=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (m.n_vertices, 6))
    tang = jax.random.normal(jax.random.PRNGKey(2), (m.n_vertices, 8))

    g1 = jax.grad(lambda p: (feast_conv(p, x, ei) * tang).sum())(params)
    g2 = jax.grad(
        lambda p: (feast_conv_dense_reference(p, x, ei) * tang).sum()
    )(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_feast_conv_jits_and_dtypes(dtype):
    m, ei = _mesh_graph()
    params = jax.tree.map(lambda a: a.astype(dtype), init_feast_params(jax.random.PRNGKey(0), 6, 16, heads=9))
    x = jax.random.normal(jax.random.PRNGKey(1), (m.n_vertices, 6)).astype(dtype)
    out = jax.jit(feast_conv)(params, x, ei)
    assert out.dtype == dtype and out.shape == (m.n_vertices, 16)
