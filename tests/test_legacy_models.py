import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geobignn_tpu.data import synth
from geobignn_tpu.data.builder import BuildConfig, build_dual_sample
from geobignn_tpu.models.fusion import DualFusionLayer
from geobignn_tpu.models.legacy import (
    FacetAttentionGNN,
    FeaStGNNPrePool,
    FGCNet,
    GATGNN,
)
from geobignn_tpu.ops.gat import GATParams, gat_conv, segment_softmax
from geobignn_tpu.ops.gcn import GCNParams, gcn_conv

pytestmark = pytest.mark.slow



@pytest.fixture(scope="module")
def sample():
    m_o = synth.icosphere(2)
    m_n = synth.add_noise(m_o, 0.2, seed=1)
    s, _ = build_dual_sample(m_n, m_o, BuildConfig(granularity=64))
    return s


def test_segment_softmax_normalizes():
    s = jnp.array([[1.0], [2.0], [3.0], [0.0]])
    ids = jnp.array([0, 0, 1, 1])
    a = segment_softmax(s, ids, 3)
    np.testing.assert_allclose(float(a[0, 0] + a[1, 0]), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(a[2, 0] + a[3, 0]), 1.0, atol=1e-6)


def test_gcn_conv_constant_signal():
    """On a regular graph with constant features, GCN(x)=xW (+b)."""
    from geobignn_tpu import graphs

    m = synth.icosphere(1)  # regular: every vertex degree 5 or 6... use octa
    m = synth.octahedron()  # degree 4 everywhere
    ei = jnp.asarray(graphs.build_vertex_graph_1ring(m.ev_indices, m.n_vertices))
    x = jnp.ones((6, 3))
    p = GCNParams(w=jnp.eye(3), b=jnp.zeros(3))
    out = gcn_conv(p, x, ei)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)


def test_gat_conv_uniform_attention_is_mean():
    """With zero attention params, GAT reduces to mean aggregation of Wx."""
    from geobignn_tpu import graphs

    m = synth.octahedron()
    ei = jnp.asarray(graphs.build_vertex_graph_1ring(m.ev_indices, m.n_vertices))
    x = jax.random.normal(jax.random.PRNGKey(0), (6, 3))
    p = GATParams(
        w=jnp.eye(3)[:, None, :], a_l=jnp.zeros((1, 3)), a_r=jnp.zeros((1, 3)),
        b=jnp.zeros(3),
    )
    out = gat_conv(p, x, ei)
    # mean over neighbors + self
    from geobignn_tpu.ops import segment

    loops = jnp.arange(6)
    row = jnp.concatenate([ei[0], loops])
    col = jnp.concatenate([ei[1], loops])
    expect = segment.segment_mean(x[col], row, 6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=1e-5)


@pytest.mark.parametrize(
    "cls,in_slice",
    [
        (FacetAttentionGNN, slice(3, 6)),
        (FGCNet, slice(0, 6)),
        (FeaStGNNPrePool, slice(0, 6)),
        (GATGNN, slice(0, 6)),
    ],
)
def test_legacy_models_forward_and_grads(sample, cls, in_slice):
    x = sample.f.x[:, in_slice]
    model = cls()
    params = model.init(jax.random.PRNGKey(0), sample.f, x)
    out = jax.jit(model.apply)(params, sample.f, x)
    assert out.shape == (sample.f.x.shape[0], 3)
    mask = sample.f.levels[0].node_mask
    norms = jnp.linalg.norm(out, axis=1) * mask
    np.testing.assert_allclose(np.asarray(norms), np.asarray(mask), atol=1e-4)

    g = jax.grad(lambda p: ((model.apply(p, sample.f, x) - sample.f.y) ** 2).sum())(
        params
    )
    assert all(bool(jnp.isfinite(l).all()) for l in jax.tree.leaves(g))


def test_dual_fusion_layer_mixes_domains(sample):
    xv = jnp.ones((sample.v.x.shape[0], 8))
    xf = jnp.zeros((sample.f.x.shape[0], 8))
    fl = DualFusionLayer(8)
    p = fl.init(jax.random.PRNGKey(0), xv, xf, sample)
    hv, hf = fl.apply(p, xv, xf, sample)
    assert hv.shape == (xv.shape[0], 8) and hf.shape == (xf.shape[0], 8)
    # facet side must see the vertex ones through the incidence
    assert float(jnp.abs(hf).max()) > 0
