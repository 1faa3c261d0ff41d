"""Benchmark: bi-domain GNN training-step throughput on one chip.

Prints ONE JSON line:
  {"metric": "train_edges_per_s", "value": N, "unit": "edges/s/chip",
   "vs_baseline": R}

Workload: full DualGNN training step (forward + backward + Adam update,
jitted) on a disjoint-union batch (data/batching.py) of BENCH_BATCH=8
noisy icospheres with 20480 faces each — the reference's submesh scale
(sub_size=20000, code/train_dual.py:55); union batching is the shipped
batching path and raises chip utilization ~4x over single-sample steps.  "Edges" counts real
(unpadded) per-conv edge messages per forward: 3 convs touch level-1 edges,
3 level-2, 2 level-3, per branch (see bench_baseline_torch.messages_per_step).

vs_baseline divides by a measured reference-style PyTorch-CPU
implementation of identical semantics (bench_baseline_torch.py), cached in
BENCH_BASELINE.json — the reference repo publishes no numbers and its CUDA
stack is not installed here (BASELINE.md).

Timing is done by chaining k steps inside one jitted fori_loop and syncing
with a device->host transfer, differencing two chain lengths: on the
tunneled TPU platform `jax.block_until_ready` returns before the device
finishes, so naive per-dispatch wall-clock is off by orders of magnitude
(train/profiling.py:device_sync documents the measurement).
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def main():
    # persistent compilation cache: the Pallas kernel compiles dominate
    # cold-start wall time on the tunneled TPU (~3.5 min first compile);
    # repeat runs (and the driver's bench invocation) hit the disk cache
    from geobignn_tpu.utils import enable_compile_cache

    enable_compile_cache()

    import optax

    from bench_baseline_torch import messages_per_step
    from geobignn_tpu.config import Config
    from geobignn_tpu.data import synth
    from geobignn_tpu.data.builder import (
        BuildConfig,
        attach_tables,
        build_dual_sample,
        build_raw,
    )
    from geobignn_tpu.models import DualGNN
    from geobignn_tpu.train.trainer import _metrics_of

    subdiv = int(os.environ.get("BENCH_SUBDIV", "5"))  # 20480 faces
    steps = int(os.environ.get("BENCH_STEPS", "6"))
    batch_size = int(os.environ.get("BENCH_BATCH", "8"))

    from geobignn_tpu.data.batching import union_batch

    from geobignn_tpu.data.builder import widths_for

    # host-build cache (shared with examples/profile_large.py): the
    # subdiv-7 hierarchy build costs minutes; kernel-config sweeps and the
    # driver's bench run shouldn't repay it.  Keyed by subdiv only — the
    # build inputs (seed, noise, BuildConfig) are constants here.
    import pickle

    host_cache = f"/tmp/gbn_prof_{subdiv}.pkl"
    if os.path.exists(host_cache):
        with open(host_cache, "rb") as fh:
            bv, bf, meta, single = pickle.load(fh)
        n_faces = bf.n_nodes
    else:
        m_o = synth.icosphere(subdiv)
        m_n = synth.add_noise(m_o, 0.2, seed=0)
        bc = BuildConfig(granularity=256, reorder=True)
        bv, bf, meta = build_raw(m_n, m_o, bc)
        single, _ = build_dual_sample(m_n, m_o, bc)
        n_faces = m_n.n_faces
        with open(host_cache, "wb") as fh:
            pickle.dump((bv, bf, meta, single), fh)
    msgs = (messages_per_step(bv) + messages_per_step(bf)) * batch_size
    # after union: dense neighbor tables (levels 2-3) + level-1 band masks
    # for the gather-free banded Pallas convs (ops/banded_pallas.py)
    widths = widths_for(bv, bf, meta["fv_indices"], with_bands=True)
    sample = attach_tables(union_batch([single] * batch_size), widths)

    cfg = Config(granularity=256)
    model = DualGNN()
    params = model.init(jax.random.PRNGKey(0), single)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def train_step(params, opt_state, sample):
        def loss_fn(p):
            vert_p, norm_p = model.apply(p, sample)
            return _metrics_of(vert_p, norm_p, sample, cfg)

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, metrics["loss"]

    sample = jax.device_put(sample)

    # Timing methodology: k steps chained in ONE dispatch (fori_loop), synced
    # by a device->host transfer, two chain lengths differenced.  Plain
    # wall-clock around dispatches + block_until_ready is invalid on this
    # platform — see train/profiling.py:device_sync.
    @jax.jit
    def k_steps(params, opt_state, sample, k):
        def body(_, carry):
            p, o, _ = carry
            return train_step(p, o, sample)

        return jax.lax.fori_loop(
            0, k, body, (params, opt_state, jnp.float32(0.0))
        )[2]

    from geobignn_tpu.train.profiling import measure_chained

    k_pair = (1, 1 + max(steps, 2))
    dt = measure_chained(
        lambda k: k_steps(params, opt_state, sample, k),
        k_small=k_pair[0], k_large=k_pair[1],
    )

    edges_per_s = msgs / dt

    # MFU/roofline: executed vs useful matmul FLOPs against the chip peak
    # (BASELINE.md "speed-of-light" criterion; train/roofline.py)
    from geobignn_tpu.train.roofline import roofline

    roof = roofline(sample, dt)

    vs_baseline = 0.0
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
        if base.get("faces") == n_faces and base.get("edges_per_s", 0) > 0:
            # baseline measured per single mesh; msgs here counts the batch
            vs_baseline = edges_per_s / base["edges_per_s"]

    print(
        json.dumps(
            {
                "metric": "train_edges_per_s",
                "value": round(edges_per_s, 1),
                "unit": "edges/s/chip",
                "vs_baseline": round(vs_baseline, 3),
                **roof,
            }
        )
    )


if __name__ == "__main__":
    main()
