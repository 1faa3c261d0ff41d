import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geobignn_tpu import structs
from geobignn_tpu.data import synth
from geobignn_tpu.data.builder import BuildConfig, build_dual_sample
from geobignn_tpu.models import DualGNN, losses


@pytest.fixture(scope="module")
def sample_and_plan():
    m_o = synth.icosphere(3)  # 1280 faces, 642 verts
    m_n = synth.add_noise(m_o, 0.2, seed=3)
    return build_dual_sample(m_n, m_o, BuildConfig(granularity=64))


@pytest.fixture(scope="module")
def model_out(sample_and_plan):
    sample, plan = sample_and_plan
    model = DualGNN()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), sample)
    vert_p, norm_p = jax.jit(model.apply)(params, sample)
    return sample, plan, model, params, vert_p, norm_p


def test_sample_shapes(sample_and_plan):
    sample, plan = sample_and_plan
    assert sample.v.x.shape == (plan.v.n1, 6)
    assert sample.f.x.shape == (plan.f.n1, 6)
    assert sample.v.levels[0].edge_index.shape == (2, plan.v.e1)
    assert int(sample.v.levels[0].node_mask.sum()) == 642
    assert int(sample.f.levels[0].node_mask.sum()) == 1280
    # hierarchy coarsens
    n2 = int(sample.v.levels[1].node_mask.sum())
    n3 = int(sample.v.levels[2].node_mask.sum())
    assert n3 < n2 < 642
    # padded fv rows point at the vertex trash slot
    assert int(sample.fv_indices[-1, 0]) == plan.v.n1 - 1


def test_forward_shapes_and_finite(model_out):
    sample, plan, _, _, vert_p, norm_p = model_out
    assert vert_p.shape == (plan.v.n1, 3)
    assert norm_p.shape == (plan.f.n1, 3)
    assert bool(jnp.isfinite(vert_p).all()) and bool(jnp.isfinite(norm_p).all())
    # predicted normals are unit length on valid faces
    norms = jnp.linalg.norm(norm_p, axis=1)
    mask = sample.f.levels[0].node_mask
    np.testing.assert_allclose(
        np.asarray(norms * mask), np.asarray(mask), atol=1e-5
    )


@pytest.mark.slow
def test_padding_invariance(model_out):
    """Same mesh padded to a bigger plan must give identical valid outputs."""
    sample, plan, model, params, vert_p, norm_p = model_out
    m_o = synth.icosphere(3)
    m_n = synth.add_noise(m_o, 0.2, seed=3)
    big_plan = structs.SizePlan(
        v=dataclasses.replace(plan.v, n1=plan.v.n1 + 64, e1=plan.v.e1 + 128),
        f=dataclasses.replace(plan.f, n1=plan.f.n1 + 64, e3=plan.f.e3 + 64),
    )
    sample2, _ = build_dual_sample(m_n, m_o, BuildConfig(granularity=64), plan=big_plan)
    vert2, norm2 = jax.jit(model.apply)(params, sample2)
    nv, nf = 642, 1280
    np.testing.assert_allclose(
        np.asarray(vert2[:nv]), np.asarray(vert_p[:nv]), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(norm2[:nf]), np.asarray(norm_p[:nf]), atol=2e-5
    )


def test_losses_match_unpadded(model_out):
    sample, plan, _, _, vert_p, norm_p = model_out
    nv = 642
    mask = sample.v.levels[0].node_mask
    lv = losses.loss_v(vert_p, sample.v.y, mask, "L1")
    ref = np.abs(np.asarray(vert_p[:nv]) - np.asarray(sample.v.y[:nv])).sum(1).mean()
    assert float(lv) == pytest.approx(float(ref), rel=1e-5)
    ev = losses.error_v(vert_p, sample.v.y, mask)
    ref_e = np.sqrt(
        ((np.asarray(vert_p[:nv]) - np.asarray(sample.v.y[:nv])) ** 2).sum(1)
    ).mean()
    assert float(ev) == pytest.approx(float(ref_e), rel=1e-5)


def test_error_n_analytic():
    # 90-degree rotation of a unit normal -> 90 deg error
    a = jnp.array([[1.0, 0, 0], [0, 1.0, 0]])
    b = jnp.array([[0, 1.0, 0], [0, 1.0, 0]])
    e = losses.error_n(a, b, jnp.ones(2))
    assert float(e) == pytest.approx(45.0, abs=1e-4)  # mean(90, 0)


@pytest.mark.slow
def test_cross_domain_gradients(model_out):
    """Normal loss must backprop through the facet rebuild into the vertex
    branch (joint training property, reference network.py:334-337)."""
    sample, _, model, params, _, _ = model_out

    def norm_loss_only(p):
        _, norm_p = model.apply(p, sample)
        return losses.loss_n(norm_p, sample.f.y, sample.f.levels[0].node_mask)

    g = jax.grad(norm_loss_only)(params)
    gv = g["params"]["gnn_v"]["l_conv1"]["w"]
    assert float(jnp.abs(gv).max()) > 0.0
    for leaf in jax.tree.leaves(g):
        assert bool(jnp.isfinite(leaf).all())


@pytest.mark.slow
def test_fc_bf16_heads_close_to_f32(model_out):
    """The bf16 fc-head mode (production default, +4% measured on v5e):
    same param tree, outputs within bf16 tolerance of the f32 heads —
    everything outside the two head matmuls is bit-identical."""
    sample, plan, model, params, vert_p, norm_p = model_out
    m16 = DualGNN(fc_dtype=jnp.bfloat16)
    v16, n16 = jax.jit(m16.apply)(params, sample)
    assert jax.tree_util.tree_structure(
        m16.init(jax.random.PRNGKey(0), sample)
    ) == jax.tree_util.tree_structure(params)
    # head outputs feed a residual on ~unit-scale positions: bf16 has ~2-3
    # decimal digits, so 0.02 absolute is the expected regime
    assert np.abs(np.asarray(v16) - np.asarray(vert_p)).max() < 0.05
    assert np.abs(np.asarray(n16) - np.asarray(norm_p)).max() < 0.1
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(n16), axis=1)
        * np.asarray(sample.f.levels[0].node_mask)
        + (1 - np.asarray(sample.f.levels[0].node_mask)),
        1.0, atol=1e-2,
    )


def test_force_depth_head():
    m_o = synth.icosphere(2)
    m_n = synth.add_noise(m_o, 0.15, seed=1)
    sample, _ = build_dual_sample(
        m_n, m_o, BuildConfig(with_depth=True, granularity=64)
    )
    model = DualGNN(force_depth=True)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), sample)
    vert_p, _ = jax.jit(model.apply)(params, sample)
    # displacement is along depth_direction
    disp = vert_p - sample.v.x[:, :3]
    d = sample.v.depth_direction
    cross = jnp.linalg.norm(jnp.cross(disp, d), axis=1)
    assert float(cross.max()) < 1e-4


def test_chamfer_and_nearest():
    a = jnp.array([[0.0, 0, 0], [1, 0, 0]])
    b = jnp.array([[0.0, 0, 0.5], [1, 0, 0], [5, 5, 5]])
    d = losses.nearest_distance(a, b, block=2)
    np.testing.assert_allclose(np.asarray(d), [0.5, 0.0], atol=1e-6)
    cd = losses.chamfer_distance(
        a, b, jnp.ones(2), jnp.array([1.0, 1.0, 0.0]), block=2
    )
    assert float(cd) == pytest.approx(0.25 / 2 + 0.25 / 2, abs=1e-6)


def test_trash_lane_stays_zero(model_out):
    """Regression: padded lanes (incl. the trash slot) must come out of the
    U-Net as exact zeros — a nonzero trash feature gets amplified by the
    thousands of padded trash->trash edges (deg 0) and overflows f32 after
    a few training steps (the NaN-at-step-9 bug)."""
    sample, plan, model, params, vert_p, norm_p = model_out
    import flax.linen as fnn

    _, state = jax.jit(
        lambda p, s: model.apply(p, s, capture_intermediates=True)
    )(params, sample)
    inter = state["intermediates"]
    feat_v = inter["gnn_v"]["__call__"][0]
    mask = np.asarray(sample.v.levels[0].node_mask)
    assert np.abs(np.asarray(feat_v)[mask == 0]).max() == 0.0
    feat_f = inter["gnn_f"]["__call__"][0]
    mask_f = np.asarray(sample.f.levels[0].node_mask)
    assert np.abs(np.asarray(feat_f)[mask_f == 0]).max() == 0.0


@pytest.mark.slow
def test_bf16_compute_mode(sample_and_plan):
    """bf16 activations produce finite outputs close to the f32 path."""
    sample, plan = sample_and_plan
    f32 = DualGNN()
    bf16 = DualGNN(compute_dtype=jnp.bfloat16)
    params = f32.init(jax.random.PRNGKey(0), sample)
    v32, n32 = f32.apply(params, sample)
    v16, n16 = bf16.apply(params, sample)
    assert v16.dtype == jnp.float32  # outputs cast back
    assert bool(jnp.isfinite(v16).all() and jnp.isfinite(n16).all())
    mask = np.asarray(sample.v.levels[0].node_mask) > 0
    # positions are residual (input + small delta): absolute agreement
    np.testing.assert_allclose(
        np.asarray(v16)[mask], np.asarray(v32)[mask], atol=0.05
    )


def test_chunked_heads_match(model_out):
    """fc heads scanned over row chunks (the 1.31M-face memory fix) are
    numerically the identity transform: same params, same outputs."""
    sample, plan, model, params, vert_p, norm_p = model_out
    chunky = DualGNN(fc_chunk_rows=64)  # force several chunks at test size
    assert plan.v.n1 % 4 == 0 and plan.f.n1 % 4 == 0
    v2, n2 = jax.jit(chunky.apply)(params, sample)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(vert_p),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(n2), np.asarray(norm_p),
                               rtol=1e-6, atol=1e-6)
    # gradients flow identically through the scanned heads
    def loss(m, p):
        v, n = m.apply(p, sample)
        return (v * v).sum() + (n * n).sum()
    g1 = jax.grad(lambda p: loss(model, p))(params)
    g2 = jax.grad(lambda p: loss(chunky, p))(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        sc = max(float(jnp.abs(a).max()), 1e-6)  # scan changes reduction
        np.testing.assert_allclose(  # order; rel-to-leaf-scale tolerance
            np.asarray(a) / sc, np.asarray(b) / sc, rtol=5e-5, atol=5e-5)
