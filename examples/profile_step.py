"""Per-component timing of the bench.py training step (TPU).

Breaks the full fwd+bwd+Adam step into pieces with the chained-dispatch
methodology (train/profiling.measure_chained): forward only, forward+
backward, optimizer alone, per-branch U-Nets, and per-level conv stacks.
Use it to decide where the next kernel milliseconds are — results are
recorded in docs/RESULTS.md.

Run: PYTHONPATH=.:/root/.axon_site python examples/profile_step.py
Env: PROF_SUBDIV (default 5), PROF_BATCH (default 8).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def main():
    import optax

    from geobignn_tpu.config import Config
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
    from geobignn_tpu.models.dual_gnn import GNNModule
    from geobignn_tpu.train.profiling import measure_chained
    from geobignn_tpu.train.trainer import _metrics_of

    subdiv = int(os.environ.get("PROF_SUBDIV", "5"))
    batch = int(os.environ.get("PROF_BATCH", "8"))

    m_o = synth.icosphere(subdiv)
    m_n = synth.add_noise(m_o, 0.2, seed=0)
    bc = BuildConfig(granularity=256, reorder=True)
    bv, bf, meta = build_raw(m_n, m_o, bc)
    single, _ = build_dual_sample(m_n, m_o, bc)
    widths = widths_for(bv, bf, meta["fv_indices"], with_bands=True)
    sample = jax.device_put(
        attach_tables(union_batch([single] * batch), widths)
    )

    cfg = Config(granularity=256)
    model = DualGNN()
    params = model.init(jax.random.PRNGKey(0), single)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def loss_fn(p, smp):
        vert_p, norm_p = model.apply(p, smp)
        return _metrics_of(vert_p, norm_p, smp, cfg)

    def chain(body, init, *data):
        """fn(k): run `body(carry, *data)` k times.  `data` (the sample with
        its ~200 MB of int8 band masks) MUST ride as jit arguments — closure
        capture would inline it as constants and blow the remote-compile
        request size limit (HTTP 413 over the axon tunnel)."""

        @jax.jit
        def f(k, *d):
            def step(_, c):
                return body(c, *d)

            out = jax.lax.fori_loop(0, k, step, init)
            return jax.tree.leaves(out)[0].ravel()[:1]

        return lambda k: f(k, *data)

    rows = []

    def timeit(name, body, init, *data):
        dt = measure_chained(chain(body, init, *data), k_small=1, k_large=4)
        rows.append((name, dt))
        print(f"{name:34s} {dt * 1e3:8.2f} ms")

    # full step
    def full(c, smp):
        p, o = c
        (_, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, smp)
        u, o = tx.update(grads, o, p)
        return jax.tree.map(lambda a, b: a + b, p, u), o

    timeit("full step (fwd+bwd+adam)", full, (params, opt_state), sample)

    # forward only (loss)
    def fwd(c, smp):
        l, _ = loss_fn(c[0], smp)
        return (jax.tree.map(lambda a: a + l * 0, c[0]),)

    timeit("forward + loss", fwd, (params,), sample)

    # fwd+bwd (no optimizer)
    def fbwd(c, smp):
        (_, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(c[0], smp)
        return (jax.tree.map(lambda a, b: a + 0 * b, c[0], grads),)

    timeit("forward + backward", fbwd, (params,), sample)

    # adam update alone (grads = params as stand-in)
    def adam(c):
        p, o = c
        u, o = tx.update(p, o, p)
        return jax.tree.map(lambda a, b: a + 0 * b, p, u), o

    timeit("adam update only", adam, (params, opt_state))

    # per-branch U-Net fwd+bwd
    unet = GNNModule()
    for name, br, xdim in (("vertex", sample.v, 6), ("facet", sample.f, 12)):
        xb = jnp.zeros((br.levels[0].node_mask.shape[0], xdim), jnp.float32)
        pb = unet.init(jax.random.PRNGKey(1), br, xb)

        def ub(c, br_, xb_):
            (p_,) = c
            g = jax.grad(lambda q: unet.apply(q, br_, xb_).sum())(p_)
            return (jax.tree.map(lambda a, b: a + 0 * b, p_, g),)

        timeit(f"{name} U-Net fwd+bwd", ub, (pb,), br, xb)

    print()
    full_ms = rows[0][1] * 1e3
    for name, dt in rows[1:]:
        print(f"{name:34s} {dt * 1e3 / full_ms * 100:6.1f}% of step")


if __name__ == "__main__":
    main()
