"""Device-op trace of the full train step — the ground-truth time map.

The chained-dispatch probes (profile_large.py) time COMPONENTS in
isolation; XLA CSE/overlap makes their sum undershoot the real step.
This captures a jax.profiler device trace of the actual jitted train step
and aggregates per-op device time from the chrome-trace JSON (readable
without tensorboard), attributing every microsecond.

Run: PYTHONPATH=.:/root/.axon_site PROF_SUBDIV=7 PROF_BATCH=1 \
     python examples/trace_step.py
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from bench import _host_build
    from geobignn_tpu.config import Config
    from geobignn_tpu.data.batching import union_batch
    from geobignn_tpu.data.builder import attach_tables, widths_for
    from geobignn_tpu.models import DualGNN
    from geobignn_tpu.train.trainer import _metrics_of
    from geobignn_tpu.utils import enable_compile_cache

    enable_compile_cache()
    subdiv = int(os.environ.get("PROF_SUBDIV", "7"))
    batch = int(os.environ.get("PROF_BATCH", "1"))

    bv, bf, meta, single = _host_build(subdiv, tables_only=False)
    widths = widths_for(bv, bf, meta["fv_indices"], with_bands=True)
    sample = jax.device_put(attach_tables(union_batch([single] * batch), widths))

    cfg = Config(granularity=256)
    fc_dt = None if os.environ.get("GBN_FC_BF16") == "0" else jnp.bfloat16
    model = DualGNN(fc_dtype=fc_dt)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), single)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, sample):
        def loss_fn(p):
            vert_p, norm_p = model.apply(p, sample)
            return _metrics_of(vert_p, norm_p, sample, cfg)

        (_, m), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, m["loss"]

    # warm/compile
    params, opt_state, l = step(params, opt_state, sample)
    l.block_until_ready()

    outdir = os.environ.get("TRACE_DIR", "/tmp/gbn_trace")
    jax.profiler.start_trace(outdir)
    for _ in range(2):
        params, opt_state, l = step(params, opt_state, sample)
    l.block_until_ready()
    jax.profiler.stop_trace()

    files = sorted(glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                             recursive=True))
    with gzip.open(files[-1]) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    tpu_pids = {e["pid"] for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    durs = collections.Counter()
    metas = {}
    total = 0
    for e in ev:
        if e.get("ph") == "X" and e["pid"] in tpu_pids:
            name = e["name"]
            if name.startswith("jit_"):  # enclosing program event
                continue
            durs[name] += e.get("dur", 0)
            total += e.get("dur", 0)
            a = e.get("args") or {}
            m = a.get("long_name") or a.get("hlo_op") or a.get("tf_op") or ""
            if m and name not in metas:
                metas[name] = str(m)
    print(f"total device op time: {total / 1e3:.2f} ms (2 steps)")
    groups = collections.Counter()
    for name, d in durs.items():
        g = re.sub(r"[.\d]+$", "", name)
        groups[g] += d
    for name, d in groups.most_common(25):
        print(f"{d / 1e3:9.2f} ms  {name[:90]}")
    print("\n--- top individual ops (2 steps) ---")
    for name, d in durs.most_common(45):
        print(f"{d / 1e3:9.2f} ms  {name[:60]:60s}  {metas.get(name, '')[:110]}")


if __name__ == "__main__":
    main()
