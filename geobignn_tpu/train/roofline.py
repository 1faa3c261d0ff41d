"""Analytic FLOP accounting + MFU/roofline reporting for the DualGNN step.

BASELINE.md's bar is "hot kernels at speed-of-light per chip"; edges/s alone
can hide window waste (banded/block-sparse kernels spend MXU FLOPs on masked
window slots).  This module counts, from a sample's attached structures:

  * executed_flops  — matmul FLOPs the step actually issues (including
    window waste and padded table slots), per formulation:
    banded/block-sparse windows, dense neighbor tables, or sorted-COO;
  * useful_flops    — the information-theoretic minimum for the same math:
    real-edge messages + per-node head transforms + fc heads.

mfu_pct       = executed_flops / (step_time * chip peak)   [how hard the
                MXU runs]
useful_pct    = useful_flops / executed_flops              [how much of
                that work is real]
useful_mfu    = their product                              [the honest
                speed-of-light number]

A training step is counted as fwd + bwd ~= 3x forward matmul FLOPs (the
custom-VJP kernels issue ~2x the forward matmuls; optimizer work is
negligible).  Peaks are dense bf16/int8-free matmul peaks per chip.
"""

from __future__ import annotations

import numpy as np

import jax

# dense bf16 matmul peak per chip, by PJRT device_kind (FLOP/s)
PEAK_FLOPS = {
    "TPU v2": 45e12,
    "TPU v3": 123e12,
    "TPU v4": 275e12,
    "TPU v4 lite": 138e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v5 lite": 197e12,  # v5e bf16 dense = 197 TFLOP/s (394 int8)
    "TPU v5e": 197e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def chip_peak_flops(device=None) -> float:
    d = device or jax.devices()[0]
    kind = getattr(d, "device_kind", "")
    # longest-prefix match: "TPU v5 lite" must not resolve to "TPU v5"
    for k in sorted(PEAK_FLOPS, key=len, reverse=True):
        if kind.startswith(k):
            return PEAK_FLOPS[k]
    return 197e12  # default: v5e-class


# channel schedule of the 8 convs of one GNNModule branch:
# (level index, C_in, C_out); c0 = branch input width (6 vertex / 12 facet)
def _conv_schedule(c0: int):
    return [
        (0, c0, 32), (1, 32, 64), (2, 64, 128), (2, 128, 128),
        (1, 128, 64), (1, 128, 64), (0, 64, 32), (0, 64, 32),
    ]


def _conv_flops(level, c_in: int, c_out: int, heads: int) -> tuple[int, int]:
    """(executed, useful) forward FLOPs of ONE FeaStConv on `level`."""
    n_pad = int(np.asarray(level.node_mask).shape[0])
    n_valid = int(np.asarray(level.node_mask).sum())
    e_real = int(np.asarray(level.deg).sum())

    # useful: per real edge one H-score dot + one H-weighted feature sum;
    # per valid node the head-transform matmul + self term
    useful = 4 * e_real * heads * c_in + 2 * n_valid * heads * c_in * c_out
    useful += 2 * n_valid * c_in * c_out  # self-loop term

    if level.band is not None:
        n_blk, tile, win = level.band.shape
        n_rows = n_blk * tile
        # D matmul + numerator z matmul + xpw broadcast + head transform
        exe = n_rows * (
            2 * win * heads * (c_in + 1)
            + win * heads * c_in
            + 2 * heads * c_in * c_out
        )
        exe += 2 * n_pad * c_in * c_out
    elif level.nbr is not None:
        k = int(np.asarray(level.nbr).shape[1])
        exe = n_pad * (4 * k * heads * c_in + 2 * heads * c_in * c_out)
        exe += 2 * n_pad * c_in * c_out
    else:
        e_pad = int(np.asarray(level.edge_index).shape[1])
        exe = 4 * e_pad * heads * c_in + 2 * n_pad * heads * c_in * c_out
        exe += 2 * n_pad * c_in * c_out
    return exe, useful


def dual_gnn_flops(sample, heads: int = 9, fc_hidden: int = 1024) -> dict:
    """Forward executed/useful FLOPs of one DualGNN application."""
    exe = useful = 0
    for branch, c0 in ((sample.v, 6), (sample.f, 12)):
        for lvl_i, c_in, c_out in _conv_schedule(c0):
            e, u = _conv_flops(branch.levels[lvl_i], c_in, c_out, heads)
            exe += e
            useful += u
        n_pad = int(np.asarray(branch.x).shape[0])
        n_valid = int(np.asarray(branch.levels[0].node_mask).sum())
        out_dim = 3
        fc = 2 * (32 * fc_hidden + fc_hidden * out_dim)
        exe += n_pad * fc
        useful += n_valid * fc
    return dict(fwd_executed=exe, fwd_useful=useful)


def roofline(sample, step_seconds: float, heads: int = 9,
             bwd_multiplier: float = 3.0, device=None) -> dict:
    """MFU metrics of one measured training step on `sample`."""
    f = dual_gnn_flops(sample, heads)
    peak = chip_peak_flops(device)
    exe = f["fwd_executed"] * bwd_multiplier
    useful = f["fwd_useful"] * bwd_multiplier
    mfu = exe / (step_seconds * peak)
    useful_frac = useful / exe
    return dict(
        mfu_pct=round(100 * mfu, 2),
        useful_flops_pct=round(100 * useful_frac, 2),
        useful_mfu_pct=round(100 * mfu * useful_frac, 3),
        step_tflops=round(exe / step_seconds / 1e12, 2),
        peak_tflops=round(peak / 1e12, 1),
    )
