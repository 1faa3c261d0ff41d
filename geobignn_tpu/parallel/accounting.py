"""Communication accounting for the halo-sharded training step.

BASELINE.json's target is >=80% scaling efficiency 1 chip -> 1 host ->
>=2 hosts.  This environment has ONE physical chip, so the achievable
evidence (VERDICT r2 missing #5) is measured BYTES + an analytic
ICI-time model: the halo step's communication volume is a host-side
fact of the built sharding (send buffers are precomputed index tables,
parallel/partition.py:build_halo_sharding), and per-chip compute time is
measured on the real chip (bench.py).  This module extracts both and
reports the efficiency bound

    eff_no_overlap = T_compute / (T_compute + T_comm)
    eff_overlap    = T_compute / max(T_compute, T_comm)

per conv and per step.  The exchange in halo_gnn_module is one
`all_to_all` of the boundary buffer per conv (forward), and its transpose
in backward — 2x the payload per conv per step.
"""

from __future__ import annotations

import dataclasses

import numpy as np

# v5e interchip interconnect: 4 ICI links, 1600 Gbit/s aggregate per chip
# (public spec) = 200 GB/s raw.  All_to_all on a 2D torus lands well below
# raw link rate; 40 GB/s effective per chip is a conservative planning
# number (20% of raw), exposed as a parameter.
DEFAULT_ICI_GBPS = 40.0

# conv channel schedule of one GNNModule branch, imported from the model
# definition itself (pinned to initialized param shapes in
# tests/test_accounting.py) so the comm model cannot drift from the net
from geobignn_tpu.models.dual_gnn import CONV_SCHEDULE as _MODEL_SCHEDULE

_CONV_SCHEDULE = [(lvl, c_in, c_out) for _, lvl, c_in, c_out in _MODEL_SCHEDULE]


@dataclasses.dataclass
class ConvComm:
    name: str
    level: int
    c_in: int
    payload_mb: float  # padded all_to_all payload leaving each chip (fwd)
    real_mb: float  # real (non-trash) boundary rows only


def _level_halo(sh) -> tuple[int, int]:
    """(padded send rows per chip, real send rows per chip mean)."""
    p, _, h_pad = sh.send_idx.shape
    trash = sh.n_loc - 1
    real = (sh.send_idx != trash).sum(axis=(1, 2))  # per chip
    # off-chip rows per chip: all (P-1) destination buffers
    padded = (p - 1) * h_pad
    return padded, int(real.mean())


def halo_comm_report(
    hd,
    c0_v: int = 6,
    c0_f: int = 12,
    step_ms_single_chip: float = 7.6,
    ici_gbps: float = DEFAULT_ICI_GBPS,
) -> dict:
    """Per-conv and per-step comm volume + efficiency bounds.

    hd: parallel.halo_model.HaloDual (host-built).
    step_ms_single_chip: MEASURED single-chip training-step time for this
      mesh (bench.py at batch 1) — per-chip compute under a perfect
      P-way split is step_ms / P, against which the exchange time is
      weighed.
    """
    p = hd.v.levels[0].send_idx.shape[0]
    convs: list[ConvComm] = []
    for branch, tag, c0 in ((hd.v, "v", c0_v), (hd.f, "f", c0_f)):
        for i, (lvl, c_in, _) in enumerate(_CONV_SCHEDULE):
            ci = c0 if c_in is None else c_in
            padded, real = _level_halo(branch.levels[lvl])
            convs.append(ConvComm(
                name=f"{tag}_conv{i + 1}", level=lvl + 1, c_in=ci,
                payload_mb=padded * ci * 4 / 1e6,
                real_mb=real * ci * 4 / 1e6,
            ))
    # cross-domain corner gather: 3-coord positions, one exchange (+ bwd)
    p_fv, _, h_fv = hd.send_fv.shape
    fv_payload = (p_fv - 1) * h_fv * 3 * 4 / 1e6
    convs.append(ConvComm("fv_gather", 1, 3, fv_payload, fv_payload))

    # fwd exchange + bwd transpose per conv
    step_payload_mb = 2 * sum(c.payload_mb for c in convs)
    step_real_mb = 2 * sum(c.real_mb for c in convs)

    t_comm_ms = step_payload_mb / 1e3 / ici_gbps * 1e3
    # real-cut time: what a sparse exchange (per-neighbor ppermute instead
    # of the max-pair-padded all_to_all) would move
    t_comm_real_ms = step_real_mb / 1e3 / ici_gbps * 1e3
    t_comp_ms = step_ms_single_chip / p
    eff_no = t_comp_ms / (t_comp_ms + t_comm_ms)
    eff_ov = t_comp_ms / max(t_comp_ms, t_comm_ms)
    eff_real = t_comp_ms / (t_comp_ms + t_comm_real_ms)
    return dict(
        n_parts=p,
        per_conv=[dataclasses.asdict(c) for c in convs],
        step_payload_mb=round(step_payload_mb, 3),
        step_real_mb=round(step_real_mb, 3),
        padding_overhead=round(step_payload_mb / max(step_real_mb, 1e-9), 2),
        ici_gbps=ici_gbps,
        t_comm_ms=round(t_comm_ms, 3),
        t_comm_real_ms=round(t_comm_real_ms, 3),
        t_compute_ms=round(t_comp_ms, 3),
        efficiency_no_overlap=round(eff_no, 4),
        efficiency_overlapped=round(eff_ov, 4),
        efficiency_real_cut=round(eff_real, 4),
    )
