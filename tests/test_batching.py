import jax
import numpy as np
import pytest

from geobignn_tpu.data import synth
from geobignn_tpu.data.batching import union_batch
from geobignn_tpu.data.builder import BuildConfig, build_dual_sample, build_raw, plan_for
from geobignn_tpu.models import DualGNN


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
