"""FULL-MODEL numerical parity vs a pure-torch reference twin.

The highest bar in BASELINE.md: per-layer activations AND gradients
allclose against the reference's end-to-end composition — all 16 FeaStConvs
(8 per branch), 4 pooling rounds, copy-back unpooling + skip concats, the
differentiable cross-domain rebuild (code/network.py:334-337), the fc
heads (incl. the force_depth Kinect head, code/network.py:326-332), and
loss_v/loss_n/error_v/error_n (code/network.py:364-413).

Methodology (SURVEY.md §7 hard-part 3): the SAME precomputed pooling
clusters are injected into both sides (our hierarchy's cluster maps feed
the torch twin directly), isolating conv/composition parity from pooling-
policy differences.  The torch twin (bench_baseline_torch.py) implements
PyG-FeaStConv semantics — per-edge head softmax, exactly one self-loop per
node (PyG strips and re-adds them), mean aggregation — as an independent
plain-torch re-implementation; the JAX side runs the shipped padded
DualGNN with identical parameters copied in.

Tolerances: f32 on CPU through 16 convs + 1024-wide fc heads; forward
agrees to ~1e-5 relative, gradients to ~1e-3 relative of each tensor's
max magnitude.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import bench_baseline_torch as twin
from geobignn_tpu.data import synth
from geobignn_tpu.data.builder import BuildConfig, build_dual_sample, build_raw
from geobignn_tpu.models import DualGNN, losses

pytestmark = pytest.mark.slow

HEADS = 9
CONV_NAMES = {
    "l1": "l_conv1", "l2": "l_conv2", "l3": "l_conv3", "l4": "l_conv4",
    "r1": "r_conv1", "r2": "r_conv2", "r3": "r_conv3", "r4": "r_conv4",
}
# which graph level (-> valid-row count) each conv's output lives on
CONV_LEVEL = {
    "l_conv1": 0, "l_conv2": 1, "l_conv3": 2, "l_conv4": 2,
    "r_conv1": 1, "r_conv2": 1, "r_conv3": 0, "r_conv4": 0,
}


def _build(force_depth=False, subdiv=2, noise=0.15, seed=0):
    m_o = synth.icosphere(subdiv)
    m_n = synth.add_noise(m_o, noise, seed=seed)
    cfg = BuildConfig(granularity=8, with_depth=force_depth, reorder=False)
    bv, bf, meta = build_raw(m_n, m_o, cfg)
    sample, plan = build_dual_sample(m_n, m_o, cfg)
    vb, fb = twin.branch_to_torch(bv), twin.branch_to_torch(bf)
    fv = torch.from_numpy(meta["fv_indices"].astype(np.int64))
    depth = None
    if force_depth:
        depth = torch.from_numpy(np.asarray(bv.depth_direction))
    return (bv, bf), sample, (vb, fb, fv, depth)


def _inject(params, tm: twin.TorchDualGNN, force_depth=False):
    """Copy the flax DualGNN params into the torch twin (same tensors)."""
    pv = params["params"]

    def conv(tc, jc):
        tc.u.data = torch.from_numpy(np.asarray(jc["u"]))
        tc.c.data = torch.from_numpy(np.asarray(jc["c"]))
        tc.w.data = torch.from_numpy(np.asarray(jc["w"]))
        tc.b.data = torch.from_numpy(np.asarray(jc["b"]))

    for branch, tgnn in (("gnn_v", tm.gnn_v), ("gnn_f", tm.gnn_f)):
        for tname, jname in CONV_NAMES.items():
            conv(getattr(tgnn, tname), pv[branch][jname])
    for fc in ("fc_v1", "fc_v2", "fc_f1", "fc_f2"):
        lin = getattr(tm, fc)
        lin.weight.data = torch.from_numpy(
            np.asarray(pv[fc]["kernel"]).T.copy()
        )
        lin.bias.data = torch.from_numpy(np.asarray(pv[fc]["bias"]))


def _torch_with_hooks(tm):
    """Register hooks capturing every TorchFeaStConv output, keyed by
    (branch, conv_name), in reference execution order."""
    acts = {}

    def mk(branch, name):
        def hook(_m, _inp, out):
            acts[(branch, name)] = out.detach().numpy()

        return hook

    handles = []
    for branch, tgnn in (("gnn_v", tm.gnn_v), ("gnn_f", tm.gnn_f)):
        for tname, jname in CONV_NAMES.items():
            handles.append(
                getattr(tgnn, tname).register_forward_hook(mk(branch, jname))
            )
    return acts, handles


def _run_pair(force_depth=False):
    raw, sample, tin = _build(force_depth)
    model = DualGNN(force_depth=force_depth, heads=HEADS)
    params = model.init(jax.random.PRNGKey(3), sample)

    tm = twin.TorchDualGNN(HEADS, force_depth=force_depth)
    _inject(params, tm, force_depth)
    return raw, sample, tin, model, params, tm


class TestForwardParity:
    @pytest.fixture(scope="class")
    def pair(self):
        raw, sample, tin, model, params, tm = _run_pair()
        with jax.default_matmul_precision("float32"):
            (vert_j, norm_j), state = model.apply(
                params, sample, capture_intermediates=True
            )
        acts_t, handles = _torch_with_hooks(tm)
        with torch.no_grad():
            vert_t, norm_t = tm(*tin[:3])
        for h in handles:
            h.remove()
        inter = state["intermediates"]
        return raw, sample, (vert_j, norm_j, inter), (vert_t, norm_t, acts_t)

    def test_all_16_convs_allclose(self, pair):
        """Every FeaStConv activation in both branches pins to the twin."""
        (bv, bf), sample, (_, _, inter), (_, _, acts_t) = pair
        sizes = {
            "gnn_v": [bv.n_nodes, bv.specs[0].n_out, bv.specs[1].n_out],
            "gnn_f": [bf.n_nodes, bf.specs[0].n_out, bf.specs[1].n_out],
        }
        for branch in ("gnn_v", "gnn_f"):
            for jname in CONV_NAMES.values():
                j = np.asarray(inter[branch][jname]["__call__"][0])
                t = acts_t[(branch, jname)]
                n_valid = sizes[branch][CONV_LEVEL[jname]]
                np.testing.assert_allclose(
                    j[:n_valid], t[:n_valid], rtol=2e-4, atol=1e-5,
                    err_msg=f"{branch}.{jname}",
                )

    def test_final_outputs_allclose(self, pair):
        (bv, bf), _, (vj, nj, _), (vt, nt, _) = pair
        np.testing.assert_allclose(
            np.asarray(vj)[: bv.n_nodes], vt.numpy(), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(nj)[: bf.n_nodes], nt.numpy(), rtol=1e-4, atol=1e-4
        )

    def test_losses_and_errors_allclose(self, pair):
        """loss_v/loss_n/error_v/error_n on identical predictions match the
        reference formulas (code/network.py:364-413) evaluated in torch."""
        (bv, bf), sample, (vj, nj, _), (vt, nt, _) = pair
        mask_v = sample.v.levels[0].node_mask
        mask_f = sample.f.levels[0].node_mask
        y_v = torch.from_numpy(np.asarray(bv.y))
        y_f = torch.from_numpy(np.asarray(bf.y))

        ref = dict(
            loss_v=float((vt - y_v).abs().sum(1).mean()),
            loss_n=float((nt - y_f).abs().sum(1).mean()),
            error_v=float((vt - y_v).pow(2).sum(1).pow(0.5).mean()),
            error_n=float(
                (
                    torch.acos(
                        torch.clamp(1 - (nt - y_f).pow(2).sum(1) / 2, -1, 1)
                    )
                    * 180.0
                    / np.pi
                ).mean()
            ),
        )
        ours = dict(
            loss_v=float(losses.loss_v(vj, sample.v.y, mask_v, "L1")),
            loss_n=float(losses.loss_n(nj, sample.f.y, mask_f, "L1")),
            error_v=float(losses.error_v(vj, sample.v.y, mask_v)),
            error_n=float(losses.error_n(nj, sample.f.y, mask_f)),
        )
        for k in ref:
            assert abs(ours[k] - ref[k]) < 1e-3 + 1e-4 * abs(ref[k]), (
                k, ours[k], ref[k],
            )


def test_pool_rounds_parity():
    """The 4 max-pool coarsening rounds per branch, in isolation: our padded
    segment-max over PoolStep maps vs torch index_reduce over the SAME raw
    clusters (reference scatter(reduce='max'), code/net_util.py:131-134)."""
    (bv, bf), sample, _ = _build()
    rng = np.random.default_rng(0)
    from geobignn_tpu.models.dual_gnn import pool_features

    for raw, branch in ((bv, sample.v), (bf, sample.f)):
        x = rng.normal(size=(raw.n_nodes, 5)).astype(np.float32)
        x_pad = np.zeros((branch.x.shape[0], 5), np.float32)
        x_pad[: raw.n_nodes] = x

        xt = torch.from_numpy(x)
        cur_j = jnp.asarray(x_pad)
        step_i = 0
        for spec in raw.specs:
            for cl, n in zip(spec.step_clusters, spec.step_sizes):
                clt = torch.from_numpy(np.asarray(cl)).long()
                out = xt.new_full((int(n), 5), -torch.inf)
                out.index_reduce_(0, clt, xt, "amax", include_self=False)
                xt = torch.nan_to_num(out, neginf=0.0)

                cur_j = pool_features(
                    cur_j, (branch.steps[step_i],), "max"
                )
                step_i += 1
                np.testing.assert_allclose(
                    np.asarray(cur_j)[: int(n)], xt.numpy(), rtol=1e-6,
                    atol=1e-6,
                )


def test_unpool_skip_parity():
    """Copy-back unpooling (x[unpool]) against torch gather on raw maps."""
    (bv, _), sample, _ = _build()
    rng = np.random.default_rng(1)
    n3_raw = bv.specs[1].n_out
    x3 = rng.normal(size=(n3_raw, 7)).astype(np.float32)
    n3_pad = sample.v.steps[3].n_out
    x3_pad = np.zeros((n3_pad, 7), np.float32)
    x3_pad[:n3_raw] = x3

    u_j = np.asarray(jnp.asarray(x3_pad)[sample.v.unpool2])
    u_t = torch.from_numpy(x3)[torch.from_numpy(np.asarray(bv.specs[1].unpool)).long()]
    np.testing.assert_allclose(
        u_j[: bv.specs[0].n_out], u_t.numpy(), atol=0
    )


class TestGradientParity:
    def _grads(self, force_depth=False):
        raw, sample, tin, model, params, tm = _run_pair(force_depth)
        (bv, bf) = raw
        mask_v = sample.v.levels[0].node_mask
        mask_f = sample.f.levels[0].node_mask

        def loss_fn(p):
            vert, norm = model.apply(p, sample)
            lv = losses.loss_v(vert, sample.v.y, mask_v, "L1")
            ln = losses.loss_n(norm, sample.f.y, mask_f, "L1")
            return losses.dual_loss(lv, ln)

        with jax.default_matmul_precision("float32"):
            loss_j, grads_j = jax.value_and_grad(loss_fn)(params)

        vb, fb, fv, depth = tin
        vert, norm = tm(vb, fb, fv, depth)
        y_v = torch.from_numpy(np.asarray(bv.y))
        y_f = torch.from_numpy(np.asarray(bf.y))
        loss_t = (vert - y_v).abs().sum(1).mean() + (
            (norm - y_f).abs().sum(1).mean()
        )
        loss_t.backward()
        return float(loss_j), grads_j["params"], float(loss_t), tm

    @pytest.mark.parametrize("force_depth", [False, True])
    def test_gradients_allclose(self, force_depth):
        """d(dual_loss)/d(every parameter) matches torch autograd through
        the full cascade INCLUDING the cross-domain rebuild — gradients of
        the facet loss flow into the vertex branch on both sides."""
        loss_j, gj, loss_t, tm = self._grads(force_depth)
        assert abs(loss_j - loss_t) < 1e-4 * max(1.0, abs(loss_t))

        def cmp(name, j, t):
            j = np.asarray(j)
            t = t.detach().numpy()
            scale = max(np.abs(t).max(), 1e-8)
            np.testing.assert_allclose(
                j / scale, t / scale, rtol=2e-3, atol=2e-4, err_msg=name
            )

        for branch, tgnn in (("gnn_v", tm.gnn_v), ("gnn_f", tm.gnn_f)):
            for tname, jname in CONV_NAMES.items():
                tc = getattr(tgnn, tname)
                for field in ("u", "c", "w", "b"):
                    cmp(
                        f"{branch}.{jname}.{field}",
                        gj[branch][jname][field],
                        getattr(tc, field).grad,
                    )
        for fc in ("fc_v1", "fc_v2", "fc_f1", "fc_f2"):
            lin = getattr(tm, fc)
            cmp(f"{fc}.kernel", gj[fc]["kernel"], lin.weight.grad.T)
            cmp(f"{fc}.bias", gj[fc]["bias"], lin.bias.grad)

        # the cross-domain coupling is live: facet-branch loss gradients
        # reached vertex-branch parameters (nonzero on both sides)
        g_v1 = np.abs(np.asarray(gj["gnn_v"]["l_conv1"]["w"])).max()
        assert g_v1 > 0


def test_forward_parity_force_depth():
    """force_depth head: out = fc(1) * depth_direction + xyz (Kinect)."""
    raw, sample, tin, model, params, tm = _run_pair(force_depth=True)
    (bv, bf) = raw
    with jax.default_matmul_precision("float32"):
        vert_j, norm_j = model.apply(params, sample)
    with torch.no_grad():
        vert_t, norm_t = tm(*tin)
    np.testing.assert_allclose(
        np.asarray(vert_j)[: bv.n_nodes], vert_t.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(norm_j)[: bf.n_nodes], norm_t.numpy(), rtol=1e-4, atol=1e-4
    )
