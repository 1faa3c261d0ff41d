"""Dense neighbor-table (scatter-free) path: parity vs the COO formulation.

The table path must be bit-compatible in semantics (same math, different
schedule) with the segment-reduce path on every component it replaces:
FeaStConv, pooling, unpooling, and the cross-domain fv gather — forward
AND gradients (the backward runs through reverse-table gathers instead of
XLA AD's scatter-add)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geobignn_tpu.data import synth
from geobignn_tpu.data.batching import union_batch
from geobignn_tpu.data.builder import (
    BuildConfig,
    attach_tables,
    build_dual_sample,
    build_raw,
    widths_for,
)
from geobignn_tpu.models import DualGNN
from geobignn_tpu.ops import segment
from geobignn_tpu.ops import table as tbl
from geobignn_tpu.ops.feastconv import feast_conv, feast_conv_table, init_feast_params


def _sample(subdiv=2, granularity=32, noise=0.3, seed=0):
    m_o = synth.icosphere(subdiv)
    m_n = synth.add_noise(m_o, noise, seed=seed)
    return build_dual_sample(m_n, m_o, BuildConfig(granularity=granularity))


# --------------------------------------------------------------------------
# the primitive
# --------------------------------------------------------------------------

def test_table_gather_forward_and_grad_match_scatter_reference():
    rng = np.random.default_rng(0)
    n, m, k, c = 37, 23, 5, 4
    nbr = rng.integers(0, n, (m, k)).astype(np.int32)
    rev, _ = tbl.reverse_table_np(nbr, n, src_mask=np.ones(n, bool))
    x = jnp.asarray(rng.standard_normal((n, c)), jnp.float32)

    out = tbl.table_gather(x, jnp.asarray(nbr), jnp.asarray(rev))
    assert np.allclose(out, np.asarray(x)[nbr])

    g = jnp.asarray(rng.standard_normal(out.shape), jnp.float32)
    dx = jax.grad(lambda x_: jnp.sum(tbl.table_gather(x_, nbr, rev) * g))(x)
    dx_ref = np.zeros((n, c), np.float32)
    np.add.at(dx_ref, nbr.reshape(-1), np.asarray(g).reshape(-1, c))
    assert np.allclose(dx, dx_ref, atol=1e-5)


def test_reverse_table_excludes_masked_sources():
    nbr = np.array([[0, 3], [3, 1], [3, 3]], np.int32)
    mask = np.array([True, True, False, False])  # 2,3 are trash-like
    rev, r = tbl.reverse_table_np(nbr, 4, src_mask=mask, granularity=1)
    assert r == 1
    assert rev[0, 0] == 0 and rev[1, 0] == 3
    assert (rev[2] == nbr.size).all() and (rev[3] == nbr.size).all()


def test_members_table_respects_fine_mask():
    cluster = np.array([0, 0, 1, 2, 2, 2], np.int32)  # slots 3.. are padding
    fine_mask = np.array([1, 1, 1, 0, 0, 0], bool)
    members, mmask, m = tbl.members_table_np(cluster, fine_mask, 3)
    assert m == 2
    assert set(members[0].tolist()) == {0, 1}
    assert members[1, 0] == 2 and mmask[1, 1] == 0
    assert mmask[2].sum() == 0  # trash cluster saw only masked slots


def test_gather_pool_max_keeps_negative_maxima():
    x = jnp.asarray([[-3.0], [-1.0], [0.0]])
    members = jnp.asarray([[0, 1], [2, 2]], jnp.int32)
    mmask = jnp.asarray([[1.0, 1.0], [0.0, 0.0]])
    rev, _ = tbl.reverse_table_np(
        np.asarray(members), 3, src_mask=np.array([1, 1, 0], bool), r_pad=1
    )
    out = tbl.gather_pool_max(x, members, jnp.asarray(rev), mmask)
    assert out[0, 0] == -1.0  # true negative max, not clipped to 0
    assert out[1, 0] == 0.0  # empty row falls back to segment_max fill


# --------------------------------------------------------------------------
# conv parity
# --------------------------------------------------------------------------

def test_feast_conv_table_matches_coo():
    sample, _ = _sample()
    sample = attach_tables(sample)
    lvl = sample.v.levels[0]
    params = init_feast_params(jax.random.PRNGKey(1), 6, 16, 9)
    x = jnp.asarray(sample.v.x)

    ref = feast_conv(params, x, jnp.asarray(lvl.edge_index))
    out = feast_conv_table(
        params, x, jnp.asarray(lvl.nbr), jnp.asarray(lvl.kmask), jnp.asarray(lvl.rev)
    )
    mask = np.asarray(lvl.node_mask) > 0
    assert np.allclose(np.asarray(ref)[mask], np.asarray(out)[mask], atol=1e-4)


def test_feast_conv_table_grads_match_coo():
    sample, _ = _sample()
    sample = attach_tables(sample)
    lvl = sample.v.levels[0]
    params = init_feast_params(jax.random.PRNGKey(1), 6, 8, 4)
    x = jnp.asarray(sample.v.x)
    mask = jnp.asarray(lvl.node_mask)[:, None]

    def loss_coo(p, x_):
        return jnp.sum((feast_conv(p, x_, jnp.asarray(lvl.edge_index)) * mask) ** 2)

    def loss_tbl(p, x_):
        out = feast_conv_table(
            p, x_, jnp.asarray(lvl.nbr), jnp.asarray(lvl.kmask), jnp.asarray(lvl.rev)
        )
        return jnp.sum((out * mask) ** 2)

    g_ref = jax.grad(loss_coo, argnums=(0, 1))(params, x)
    g_tbl = jax.grad(loss_tbl, argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_tbl)):
        assert np.allclose(a, b, atol=2e-3), float(jnp.abs(a - b).max())


# --------------------------------------------------------------------------
# whole-model parity (forward + gradients), single sample and union batch
# --------------------------------------------------------------------------

@pytest.mark.slow
@pytest.mark.parametrize("batch", [1, 3])
def test_dual_gnn_table_path_matches_coo(batch):
    samples = [_sample(seed=i)[0] for i in range(batch)]
    sample = union_batch(samples) if batch > 1 else samples[0]
    sample_t = attach_tables(sample)
    assert sample_t.v.levels[0].nbr is not None

    model = DualGNN()
    params = model.init(jax.random.PRNGKey(0), sample)
    v_ref, n_ref = model.apply(params, sample)
    v_tbl, n_tbl = model.apply(params, sample_t)
    mv = np.asarray(sample.v.levels[0].node_mask) > 0
    mf = np.asarray(sample.f.levels[0].node_mask) > 0
    assert np.allclose(np.asarray(v_ref)[mv], np.asarray(v_tbl)[mv], atol=1e-4)
    assert np.allclose(np.asarray(n_ref)[mf], np.asarray(n_tbl)[mf], atol=1e-4)

    def loss(p, s):
        v, n = model.apply(p, s)
        maskv = s.v.node_mask if hasattr(s.v, "node_mask") else None
        return (
            jnp.sum(jnp.abs(v - s.v.y) * s.v.levels[0].node_mask[:, None])
            + jnp.sum(jnp.abs(n - s.f.y) * s.f.levels[0].node_mask[:, None])
        )

    g_ref = jax.grad(loss)(params, sample)
    g_tbl = jax.grad(loss)(params, sample_t)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_tbl)):
        assert np.allclose(a, b, atol=5e-3), float(jnp.abs(a - b).max())


def test_widths_merge_gives_shared_shapes():
    from geobignn_tpu.data.builder import plan_for

    cfg = BuildConfig(granularity=32)
    widths, plan = None, None
    meshes = []
    for i in range(3):
        m_o = synth.icosphere(2)
        m_n = synth.add_noise(m_o, 0.2 + 0.1 * i, seed=i)
        bv, bf, meta = build_raw(m_n, m_o, cfg)
        w = widths_for(bv, bf, meta["fv_indices"])
        widths = w if widths is None else widths.merge(w)
        p = plan_for(bv, bf, cfg.granularity)
        plan = p if plan is None else plan.merge(p)
        meshes.append((m_n, m_o))
    samples = [build_dual_sample(m_n, m_o, cfg, plan)[0] for m_n, m_o in meshes]
    shapes = set()
    for s in samples:
        st = attach_tables(s, widths=widths)
        shapes.add(
            tuple(
                np.asarray(l).shape
                for l in jax.tree_util.tree_leaves(st)
                if hasattr(l, "shape")
            )
        )
    assert len(shapes) == 1  # identical pytree shapes -> one XLA compile
