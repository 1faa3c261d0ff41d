import jax
import numpy as np
import pytest

from geobignn_tpu.data import synth
from geobignn_tpu.data.batching import union_batch
from geobignn_tpu.data.builder import BuildConfig, build_dual_sample, build_raw, plan_for
from geobignn_tpu.models import DualGNN

pytestmark = pytest.mark.slow



def test_union_batch_matches_per_sample_forward():
    cfg = BuildConfig(granularity=64)
    meshes = [
        (synth.add_noise(synth.icosphere(2), 0.2, seed=s), synth.icosphere(2))
        for s in (1, 2, 3)
    ]
    plan = None
    for m_n, m_o in meshes:
        bv, bf, _ = build_raw(m_n, m_o, cfg)
        p = plan_for(bv, bf, cfg.granularity)
        plan = p if plan is None else plan.merge(p)
    samples = [build_dual_sample(m_n, m_o, cfg, plan)[0] for m_n, m_o in meshes]

    model = DualGNN()
    params = model.init(jax.random.PRNGKey(0), samples[0])
    singles = [jax.jit(model.apply)(params, s) for s in samples]

    batch = union_batch(samples)
    vert_b, norm_b = jax.jit(model.apply)(params, batch)

    nv = np.asarray(samples[0].v.x).shape[0]
    nf = np.asarray(samples[0].f.x).shape[0]
    for k, (v_s, n_s) in enumerate(singles):
        mask_v = np.asarray(samples[k].v.levels[0].node_mask) > 0
        mask_f = np.asarray(samples[k].f.levels[0].node_mask) > 0
        np.testing.assert_allclose(
            np.asarray(vert_b[k * nv : (k + 1) * nv])[mask_v],
            np.asarray(v_s)[mask_v],
            atol=3e-5,
        )
        np.testing.assert_allclose(
            np.asarray(norm_b[k * nf : (k + 1) * nf])[mask_f],
            np.asarray(n_s)[mask_f],
            atol=3e-5,
        )


def test_table_widths_merge_tiles_per_level():
    """A level that bands in both operands keeps its (max) tile; a level
    that fell back to tables (tile 0) in either operand stays 0 — merging
    must not collapse the whole tuple (regression: all-or-nothing merge
    reverted every level of every merged sample to the table path)."""
    import dataclasses

    from geobignn_tpu.data.builder import TableWidths

    base = dict(k_v=(8, 8, 8), k_f=(8, 8, 8), mem_v=(4, 4, 4, 4),
                mem_f=(4, 4, 4, 4), up_v=(2, 2), up_f=(2, 2), fv_r=8)
    a = TableWidths(**base, tile_v=(0, 128, 128), tile_f=(384, 256, 128))
    b = TableWidths(**base, tile_v=(768, 256, 128), tile_f=(384, 0, 256))
    m = a.merge(b)
    assert m.tile_v == (0, 256, 128)
    assert m.tile_f == (384, 0, 256)
