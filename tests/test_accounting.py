"""Halo comm accounting: bytes consistency against the built sharding."""

import numpy as np

from geobignn_tpu.data import synth
from geobignn_tpu.data.builder import BuildConfig
from geobignn_tpu.parallel import accounting
from geobignn_tpu.parallel.halo_train import build_halo_train_sample


def test_report_consistency():
    m_o = synth.icosphere(3)
    m_n = synth.add_noise(m_o, 0.2, seed=0)
    hs = build_halo_train_sample(m_n, m_o, BuildConfig(), n_parts=4, seed=0)
    rep = accounting.halo_comm_report(hs.structure, step_ms_single_chip=5.0)

    assert rep["n_parts"] == 4
    # 8 convs per branch + the fv gather
    assert len(rep["per_conv"]) == 17
    # padded payload >= real payload, both positive on a connected mesh
    assert rep["step_payload_mb"] >= rep["step_real_mb"] > 0
    # efficiency bounds ordered: overlapped >= no-overlap; real-cut uses
    # a smaller payload so it can only be >= the padded no-overlap number
    assert rep["efficiency_overlapped"] >= rep["efficiency_no_overlap"]
    assert rep["efficiency_real_cut"] >= rep["efficiency_no_overlap"]
    assert 0 < rep["efficiency_no_overlap"] <= 1

    # hand-recompute one conv's payload from the sharding: per-chip ROUND
    # PARTICIPATION (rounds the chip appears in), max over chips
    sh = hs.structure.v.levels[0]
    c_in = 6  # first vertex conv
    assert sh.h_total == sum(h for _, h in sh.rounds)
    part = np.zeros(sh.n_parts)
    for perm, h_c in sh.rounds:
        for chip in {s for s, _ in perm}:
            part[chip] += h_c
    expect_mb = part.max() * c_in * 4 / 1e6
    assert abs(rep["per_conv"][0]["payload_mb"] - expect_mb) < 1e-9

    # real rows: non-trash entries of send_idx, worst chip
    trash = sh.n_loc - 1
    real_rows = int((sh.send_idx != trash).sum(axis=1).max())
    expect_real = real_rows * c_in * 4 / 1e6
    assert abs(rep["per_conv"][0]["real_mb"] - expect_real) < 1e-9

    # sparse payload is bracketed by the real cut and the dense all_to_all
    assert rep["step_real_mb"] <= rep["step_payload_mb"] <= rep["step_dense_mb"]
    assert rep["efficiency_no_overlap"] >= rep["efficiency_dense_a2a"]


def test_conv_schedule_matches_model_params():
    """CONV_SCHEDULE (the comm model's channel widths) is pinned to the
    REAL initialized GNNModule parameter shapes, so accounting cannot
    silently drift if the model's widths change."""
    import jax

    from geobignn_tpu.data.builder import build_dual_sample
    from geobignn_tpu.models.dual_gnn import CONV_SCHEDULE, GNNModule

    m_o = synth.icosphere(2)
    m_n = synth.add_noise(m_o, 0.2, seed=0)
    sample, _ = build_dual_sample(m_n, m_o, BuildConfig())
    mod = GNNModule()
    params = jax.eval_shape(
        lambda: mod.init(jax.random.PRNGKey(0), sample.v, sample.v.x)
    )["params"]

    c0 = sample.v.x.shape[1]
    assert set(params) == {name for name, *_ in CONV_SCHEDULE}
    for name, _, c_in, c_out in CONV_SCHEDULE:
        want_in = c0 if c_in is None else c_in
        h, win, wout = params[name]["w"].shape
        assert (win, wout) == (want_in, c_out), name
        assert params[name]["u"].shape[0] == want_in, name


def test_comm_grows_sublinearly_with_parts():
    """Doubling P should much-less-than-double the REAL cut bytes (surface
    vs volume); the padded payload may grow faster (max-pair padding)."""
    m_o = synth.icosphere(4)
    m_n = synth.add_noise(m_o, 0.2, seed=0)
    reals = []
    for p in (2, 4, 8):
        hs = build_halo_train_sample(m_n, m_o, BuildConfig(), n_parts=p, seed=0)
        rep = accounting.halo_comm_report(hs.structure, step_ms_single_chip=5.0)
        reals.append(rep["step_real_mb"])
    assert reals[2] < 4 * reals[0]
