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


def _walk_ppermutes(jaxpr, acc):
    """Collect (operand shape, frozenset(perm)) from every ppermute eqn,
    recursing through pjit/scan/cond/custom-vjp sub-jaxprs."""
    from jax.extend import core as jex_core  # noqa: F401
    import jax.core as core

    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "ppermute":
            acc.append((
                tuple(eqn.invars[0].aval.shape),
                frozenset(tuple(p) for p in eqn.params["perm"]),
            ))
        for v in eqn.params.values():
            for x in (v if isinstance(v, (tuple, list)) else (v,)):
                if hasattr(x, "jaxpr") and hasattr(x, "consts"):  # ClosedJaxpr
                    _walk_ppermutes(x.jaxpr, acc)
                elif hasattr(x, "eqns"):  # Jaxpr
                    _walk_ppermutes(x, acc)


def test_live_step_schedule_agrees_with_accounting():
    """Close the model<->runtime loop (VERDICT r4 next #4): the ppermutes
    the TRACED halo train step actually performs — count, per-round pad
    h_c, channel width, chip pairs — must equal the host schedule the
    accounting bills, and an EXECUTED exchange on the 8-device mesh must
    deliver exactly the non-trash rows the accounting's real-cut counts."""
    import jax
    import jax.numpy as jnp
    import optax

    from geobignn_tpu.data.builder import build_dual_sample
    from geobignn_tpu.models import DualGNN
    from geobignn_tpu.models.dual_gnn import CONV_SCHEDULE
    from geobignn_tpu.parallel import halo_train as ht
    from geobignn_tpu.parallel import partition as hp
    from geobignn_tpu.parallel.api import make_mesh
    from jax.sharding import PartitionSpec as P

    m_o = synth.icosphere(3)
    m_n = synth.add_noise(m_o, 0.2, seed=0)
    bc = BuildConfig(granularity=16)
    n_parts = 8
    hs = ht.build_halo_train_sample(m_n, m_o, bc, n_parts=n_parts, seed=0)
    rep = accounting.halo_comm_report(hs.structure, step_ms_single_chip=5.0)

    mesh = make_mesh(1, n_parts)
    tx = optax.adam(1e-3)
    single, _ = build_dual_sample(m_n, m_o, bc)
    params = jax.jit(DualGNN().init)(jax.random.PRNGKey(0), single)["params"]
    params = jax.tree.map(np.asarray, params)
    opt_state = tx.init(params)
    step = ht.make_halo_train_step(tx, mesh, hs.arrays, static_d=hs.static)

    jaxpr = jax.make_jaxpr(step)(
        params, opt_state, hs.arrays, jax.random.PRNGKey(0)
    )
    acc = []
    _walk_ppermutes(jaxpr.jaxpr, acc)

    # 1. executed round count == the accounting's n_rounds_step
    assert len(acc) == rep["n_rounds_step"], (len(acc), rep["n_rounds_step"])

    # 2. the multiset of (h_c, c_in, pairs) matches the host schedule:
    # each conv at level l performs every round of that level's schedule
    # once forward and once in the AD transpose (perm is symmetric, so
    # the inverted permutation is the same pair set)
    expect = {}
    for br in (hs.structure.v, hs.structure.f):
        for i, (_, lvl, c_in, _) in enumerate(CONV_SCHEDULE):
            # c_in None = first conv: 6 input features (v) / 12 (f)
            ci = c_in if c_in is not None else (
                6 if br is hs.structure.v else 12)
            # the first VERTEX conv's exchange input is the raw data xv:
            # no param-dependent path, so no AD transpose (factor 1); the
            # first FACET conv consumes vert_p-derived features (factor 2)
            fac = 1 if (br is hs.structure.v and i == 0) else 2
            for perm, h_c in br.levels[lvl].rounds:
                key = ((h_c, ci), frozenset(perm))
                expect[key] = expect.get(key, 0) + fac
    for perm, h_c in hs.structure.fv_rounds:
        key = ((h_c, 3), frozenset(perm))
        expect[key] = expect.get(key, 0) + 2
    got = {}
    for shape, pairs in acc:
        key = ((shape[0], shape[1]), pairs)
        got[key] = got.get(key, 0) + 1
    assert got == expect

    # 3. EXECUTED real rows: send a real-slot indicator through the live
    # sparse exchange; each chip must receive exactly the non-trash rows
    # the host schedule (and therefore the accounting's real-cut column)
    # says its partners send it
    sh = hs.structure.v.levels[0]
    trash = sh.n_loc - 1
    marker = (np.arange(sh.n_loc) != trash).astype(np.float32)
    marker = np.broadcast_to(marker[None, :, None], (n_parts, sh.n_loc, 1))
    send_idx = np.asarray(sh.send_idx)

    def ex(x, si):
        ext = hp.halo_exchange(x[0], si[0], "gp", rounds=sh.rounds)
        return ext[None, sh.n_loc:, :]

    out = jax.jit(jax.shard_map(
        ex, mesh=mesh, in_specs=(P("gp"), P("gp")), out_specs=P("gp"),
        check_vma=False,
    ))(jnp.asarray(marker), jnp.asarray(send_idx))
    got_rows = np.asarray(out).sum(axis=(1, 2))  # received real rows/chip

    expect_rows = np.zeros(n_parts)
    off = 0
    for perm, h_c in sh.rounds:
        for src, dst in perm:
            expect_rows[dst] += (send_idx[src, off:off + h_c] != trash).sum()
        off += h_c
    np.testing.assert_array_equal(got_rows, expect_rows)
    # and the accounting's real_mb for the first v conv is exactly the
    # worst chip's SENT real rows (receive totals must globally balance)
    sent = (send_idx != trash).sum(axis=1)
    assert got_rows.sum() == sent.sum()
    assert abs(rep["per_conv"][0]["real_mb"]
               - sent.max() * 6 * 4 / 1e6) < 1e-12
