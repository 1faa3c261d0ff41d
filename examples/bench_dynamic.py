"""Quantify the dynamic-pooling mode's overhead (VERDICT r2 #7).

pool/dynamic.py documents a ~4x/16x coarse-level overhead by construction
(every level keeps the padded level-1 size); this prints the MEASURED
number: a full training step of DualGNNDynamic vs the static-hierarchy
DualGNN on the SAME 20480-face sample (batch 1; the dynamic mode is
single-sample by design).

Run: PYTHONPATH=/root/repo:/root/.axon_site python examples/bench_dynamic.py
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp


def main():
    import optax

    from bench import _host_build
    from bench_baseline_torch import messages_per_step
    from geobignn_tpu.config import Config
    from geobignn_tpu.data.builder import attach_tables, widths_for
    from geobignn_tpu.models import DualGNN
    from geobignn_tpu.pool.dynamic import DualGNNDynamic
    from geobignn_tpu.train.profiling import measure_chained
    from geobignn_tpu.train.trainer import _metrics_of
    from geobignn_tpu.utils import enable_compile_cache

    enable_compile_cache()
    bv, bf, meta, single = _host_build(5, tables_only=False)
    msgs = messages_per_step(bv) + messages_per_step(bf)
    widths = widths_for(bv, bf, meta["fv_indices"], with_bands=True)
    sample = jax.device_put(attach_tables(single, widths))

    cfg = Config(granularity=256)
    tx = optax.adam(1e-3)
    results = {}
    for name, model in (
        ("static", DualGNN()),
        ("dynamic", DualGNNDynamic()),
    ):
        params = jax.jit(model.init)(jax.random.PRNGKey(0), sample)
        opt_state = tx.init(params)

        def train_step(params, opt_state, sample, model=model):
            def loss_fn(p):
                vert_p, norm_p = model.apply(p, sample)
                return _metrics_of(vert_p, norm_p, sample, cfg)

            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            return params, opt_state, metrics["loss"]

        @jax.jit
        def k_steps(params, opt_state, sample, k):
            def body(_, carry):
                p, o, _ = carry
                return train_step(p, o, sample)

            return jax.lax.fori_loop(
                0, k, body, (params, opt_state, jnp.float32(0.0))
            )[2]

        dt = measure_chained(
            lambda k: k_steps(params, opt_state, sample, k), 1, 4
        )
        results[name] = dict(
            step_ms=round(dt * 1e3, 2),
            edges_per_s=round(msgs / dt, 1),
        )
        print(f"{name:8s} step {dt * 1e3:8.2f} ms   "
              f"{msgs / dt:.3e} edges/s", flush=True)

    results["overhead_x"] = round(
        results["dynamic"]["step_ms"] / results["static"]["step_ms"], 2
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
