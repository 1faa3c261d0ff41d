import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from geobignn_tpu import parallel
from geobignn_tpu.data import synth
from geobignn_tpu.data.builder import BuildConfig, build_dual_sample, build_raw, plan_for
from geobignn_tpu.models import DualGNN
from geobignn_tpu.parallel.api import dual_loss_and_metrics

pytestmark = pytest.mark.slow



@pytest.fixture(scope="module")
def batch():
    cfg = BuildConfig(granularity=64)
    meshes = [
        (synth.add_noise(synth.icosphere(2), 0.2, seed=s), synth.icosphere(2))
        for s in (1, 2)
    ]
    plans = []
    for m_n, m_o in meshes:
        bv, bf, _ = build_raw(m_n, m_o, cfg)
        plans.append(plan_for(bv, bf, cfg.granularity))
    plan = plans[0].merge(plans[1])
    samples = [build_dual_sample(m_n, m_o, cfg, plan)[0] for m_n, m_o in meshes]
    return samples, parallel.stack_samples(samples)


def test_mesh_and_specs(batch):
    samples, stacked = batch
    mesh = parallel.make_mesh(2, 4)
    assert mesh.shape == {"dp": 2, "gp": 4}
    specs = parallel.batch_pspecs(stacked)
    assert "gp" in str(jax.tree.leaves(specs)[3]) or True  # smoke
    # edge leaves got gp sharding
    ei_spec = specs.v.levels[0].edge_index
    assert ei_spec == jax.sharding.PartitionSpec("dp", None, "gp")


def test_sharded_step_matches_single_device(batch):
    """DP x GP sharded training step must produce the same params as the
    plain single-device step (collectives are exact sums)."""
    samples, stacked = batch
    mesh = parallel.make_mesh(2, 4)

    model_sh = DualGNN(gp_axis="gp")
    model_ref = DualGNN()
    params = model_ref.init(jax.random.PRNGKey(0), samples[0])
    tx = optax.sgd(1e-3)
    opt_state = tx.init(params)

    step = parallel.make_sharded_train_step(model_sh, tx, mesh, stacked)
    import jax as _jax
    p_sh, _, metrics = step(params, opt_state, stacked, _jax.random.PRNGKey(0))

    # reference: average grads over the 2 samples, one sgd update
    def loss_fn(p, s):
        return dual_loss_and_metrics(model_ref, p, s, {})[0]

    g = None
    for s in samples:
        gi = jax.grad(loss_fn)(params, s)
        g = gi if g is None else jax.tree.map(lambda a, b: a + b, g, gi)
    g = jax.tree.map(lambda a: a / len(samples), g)
    upd, _ = tx.update(g, opt_state, params)
    p_ref = optax.apply_updates(params, upd)

    for a, b in zip(jax.tree.leaves(p_sh), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    assert np.isfinite(float(metrics["loss"]))


def test_gp_only_forward_matches(batch):
    """Edge-partitioned forward (8-way) == unsharded forward."""
    samples, stacked = batch
    mesh = parallel.make_mesh(1, 8)
    model_sh = DualGNN(gp_axis="gp")
    model_ref = DualGNN()
    params = model_ref.init(jax.random.PRNGKey(1), samples[0])

    from jax.sharding import PartitionSpec as P

    specs = parallel.batch_pspecs(stacked)

    def fwd(p, batch):
        sample = jax.tree.map(lambda x: x[0], batch)
        out = model_sh.apply(p, sample)
        # batch leaves are dp-sharded (size 1) -> outputs carry a dp-varying
        # vma type; pmean is a numerical no-op that restores invariance
        return jax.lax.pmean(out, "dp")

    sharded = jax.jit(
        jax.shard_map(
            fwd, mesh=mesh, in_specs=(P(), specs), out_specs=P(), check_vma=True
        )
    )
    v_sh, n_sh = sharded(params, stacked)
    v_ref, n_ref = model_ref.apply(params, samples[0])
    np.testing.assert_allclose(np.asarray(v_sh), np.asarray(v_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(n_sh), np.asarray(n_ref), atol=2e-5)
