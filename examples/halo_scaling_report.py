"""Halo scaling-efficiency report (BASELINE.json >=80% target).

Builds the halo sharding for bench-scale meshes at several partition
counts, extracts the REAL per-step communication volume (host-side fact:
the exchange send buffers are precomputed index tables), and combines it
with the measured single-chip compute rate (bench.py step_tflops) and the
v5e ICI model in parallel/accounting.py into efficiency bounds.  The
sparse per-pair exchange payload is compared against the real cut (lower
bound) and the pre-sparse dense all_to_all (every pair padded to the
global max cut).

Run: python examples/halo_scaling_report.py       (host-only, no TPU)
Output: docs/halo_scaling.json + a markdown table on stdout.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from geobignn_tpu.data.builder import BuildConfig
    from geobignn_tpu.data import synth
    from geobignn_tpu.parallel import accounting
    from geobignn_tpu.parallel.halo_train import build_halo_train_sample

    rows = []
    # step_ms = MEASURED single-chip batch-1 training-step time (round 5):
    # 5.98 ms at 20k faces (examples/bench_dynamic.py 'static' row),
    # 144.3 ms at 327k faces (bench.py BENCH_SUBDIV=7: 127.5e6 edges/s).
    # Faster single-chip steps make these bounds HARDER (less compute to
    # amortize the same exchange) — the current numbers supersede r4's
    for subdiv, parts_list, step_ms in ((5, (4, 8, 16), 5.98),
                                        (7, (8, 16, 32), 144.3)):
        m_o = synth.icosphere(subdiv)
        m_n = synth.add_noise(m_o, 0.2, seed=0)
        bc = BuildConfig(granularity=256, reorder=False)
        for p in parts_list:
            hs = build_halo_train_sample(m_n, m_o, bc, n_parts=p, seed=0)
            rep = accounting.halo_comm_report(
                hs.structure, step_ms_single_chip=step_ms,
            )
            rep.update(faces=m_n.n_faces, subdiv=subdiv)
            del rep["per_conv"]
            # ICI/latency sensitivity (VERDICT r4 next #4): the default
            # 40 GB/s + 5 us are ASSUMPTIONS (one physical chip — the
            # interconnect cannot be measured here); the grid shows how
            # far the efficiency conclusion is from tipping under
            # pessimistic links (10 GB/s ~ DCN-ish) or latencies
            rep["sensitivity"] = {
                f"{g}GBps_{l}us": accounting.halo_comm_report(
                    hs.structure, step_ms_single_chip=step_ms,
                    ici_gbps=g, round_latency_us=l,
                )["efficiency_no_overlap"]
                for g in (10, 40, 100) for l in (1, 5, 25)
            }
            rows.append(rep)
            print(
                f"faces={m_n.n_faces:>7} P={p:>2}  payload "
                f"{rep['step_payload_mb']:7.2f} MB/step (real "
                f"{rep['step_real_mb']:6.2f}, dense-a2a "
                f"{rep['step_dense_mb']:7.2f})  t_comm {rep['t_comm_ms']:6.3f} ms  "
                f"t_comp {rep['t_compute_ms']:6.3f} ms  eff(sparse) "
                f"{100 * rep['efficiency_no_overlap']:5.1f}%  eff(real-cut) "
                f"{100 * rep['efficiency_real_cut']:5.1f}%  eff(dense) "
                f"{100 * rep['efficiency_dense_a2a']:5.1f}%",
                flush=True,
            )

    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "halo_scaling.json")
    with open(out_path, "w") as f:
        json.dump(rows, f, indent=2)
    print("->", out_path)


if __name__ == "__main__":
    main()
