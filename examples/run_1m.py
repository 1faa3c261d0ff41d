"""BASELINE config-5 evidence: a >1M-edge mesh end to end (VERDICT r4 #2).

Two phases, selected by argv[1]:

  halo   (CPU, 8 virtual devices) — time + peak-RSS the halo partition
         build for the 1.31M-face icosphere (subdiv 8) and execute ONE
         8-way halo TRAIN step on the virtual mesh.  Run under the CPU
         env (JAX_PLATFORMS=cpu, xla_force_host_platform_device_count=8).

  chip   (TPU) — the full single-chip train step at 1.31M faces is
         bench.py's job (GBN_BENCH_BF16=1 BENCH_SUBDIV=8 BENCH_BATCH=1;
         f32 activations exceed HBM — see docs/results_1m.json).  This
         phase snapshots device memory stats, which return null on the
         axon platform: peak-HBM evidence comes from the f32 variant's
         compile-time "Program hbm requirement 13.63G" report instead.

Results append to docs/results_1m.json.
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time


OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "results_1m.json")


def _record(entry: dict):
    rows = []
    if os.path.exists(OUT):
        with open(OUT) as f:
            rows = json.load(f)
    rows.append(entry)
    with open(OUT, "w") as f:
        json.dump(rows, f, indent=2)
    print("->", OUT, json.dumps(entry)[:200])


def halo():
    import jax
    import numpy as np
    import optax

    from bench import _host_build
    from geobignn_tpu.data import synth
    from geobignn_tpu.data.builder import BuildConfig
    from geobignn_tpu.parallel import halo_train as ht
    from geobignn_tpu.parallel import accounting
    from geobignn_tpu.parallel.api import make_mesh

    n_parts = 8
    m_o = synth.icosphere(8)
    m_n = synth.add_noise(m_o, 0.2, seed=0)
    bc = BuildConfig(granularity=256, reorder=False)
    t0 = time.time()
    hs = ht.build_halo_train_sample(m_n, m_o, bc, n_parts=n_parts, seed=0)
    t_build = time.time() - t0
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    sh = hs.structure.v.levels[0]
    print(f"halo build: {t_build:.1f}s, peak RSS {rss_gb:.1f} GB, "
          f"n_loc={sh.n_loc}, h_total={sh.h_total}, "
          f"rounds={len(sh.rounds)}")

    rep = accounting.halo_comm_report(hs.structure,
                                      step_ms_single_chip=600.0)
    print(f"modeled P={n_parts} eff {rep['efficiency_no_overlap']:.3f} "
          f"(real-cut {rep['efficiency_real_cut']:.3f}), "
          f"payload {rep['step_payload_mb']:.1f} MB/step")

    # params from a SMALL single-device build (identical pytree; channel
    # widths don't depend on mesh size)
    from geobignn_tpu.data.builder import build_dual_sample
    from geobignn_tpu.models import DualGNN

    sm_o = synth.icosphere(3)
    sm_n = synth.add_noise(sm_o, 0.2, seed=1)
    small, _ = build_dual_sample(sm_n, sm_o, BuildConfig(granularity=16))
    params = jax.tree.map(
        np.asarray,
        jax.jit(DualGNN().init)(jax.random.PRNGKey(0), small)["params"],
    )
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    mesh = make_mesh(1, n_parts)
    step = ht.make_halo_train_step(tx, mesh, hs.arrays,
                                   static_d=hs.static)
    t0 = time.time()
    p1, o1, metrics = step(params, opt_state, hs.arrays,
                           jax.random.PRNGKey(0))
    loss = float(metrics["loss"])
    t_step = time.time() - t0  # compile + 1 step on CPU — a smoke number
    assert np.isfinite(loss)
    print(f"8-way halo train step executed: loss={loss:.4f} "
          f"({t_step:.1f}s incl. CPU compile)")
    _record(dict(
        phase="halo8_virtual", faces=int(m_n.n_faces),
        edges_v=int(3932160), msgs=int(hs.meta["messages"]),
        t_build_s=round(t_build, 1), peak_rss_gb=round(rss_gb, 2),
        n_loc=int(sh.n_loc), h_total=int(sh.h_total),
        rounds_L1v=len(sh.rounds),
        eff_no_overlap=rep["efficiency_no_overlap"],
        eff_real_cut=rep["efficiency_real_cut"],
        payload_mb=rep["step_payload_mb"],
        loss=round(loss, 4), t_step_s=round(t_step, 1),
    ))


def chip():
    # the measured single-chip number comes from bench.py --worker
    # (BENCH_SUBDIV=8); here we only snapshot device memory after a step
    import jax

    stats = jax.devices()[0].memory_stats() or {}
    _record(dict(
        phase="chip_mem",
        bytes_in_use=stats.get("bytes_in_use"),
        peak_bytes_in_use=stats.get("peak_bytes_in_use"),
    ))


if __name__ == "__main__":
    {"halo": halo, "chip": chip}[sys.argv[1] if len(sys.argv) > 1 else "halo"]()
