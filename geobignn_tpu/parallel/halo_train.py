"""Halo-sharded TRAINING: gradients + optimizer over the node-partitioned
dual model (parallel/halo_model.py).

This is the scaling path the reference lacks entirely: meshes too large for
one chip are node-partitioned across the "gp" mesh axis, every conv
exchanges only O(cut) boundary features (one all_to_all), and the backward
pass reuses the same exchanges via shard_map's varying-axes transpose —
gradients arrive globally psummed, so the optimizer update is replicated
and bit-identical on every chip.  Single-device-parity of the gradients is
pinned in tests/test_halo_model.py; this module adds the optimizer step,
multi-step dispatch fusion (lax.scan over steps, same motivation as
trainer.epoch_step), shared-rotation augmentation, and the host-side
builder that takes a raw mesh pair to a device-ready sharded sample.

Reference seam generalized: submesh split + overlap averaging
(code/dataset.py:157-193, code/test_dual.py:49-61) — there, patches are
independent samples; here, one giant mesh trains as one coherent graph.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from geobignn_tpu.data.augment import random_rotation_matrix
from geobignn_tpu.parallel import halo_model as hm
from geobignn_tpu.parallel import partition as hp


@dataclasses.dataclass
class HaloTrainSample:
    """Host-built, device-ready halo-sharded training sample.

    All arrays carry a leading chip axis P and are sharded over the "gp"
    mesh axis; `structure` is the HaloDual kept for unsharding results."""

    arrays: dict  # {d, xv, xf, yv, yf, mv, mf} — the shard_map operands
    structure: hm.HaloDual
    n_v: int
    n_f: int
    meta: dict
    static: dict | None = None  # dual_static(hd): per-level exchange rounds


def build_halo_train_sample(
    mesh_noisy, mesh_orig, build_cfg, n_parts: int, seed: int = 0,
    granularity: int = 8, banded: bool = False,
) -> HaloTrainSample:
    """Raw mesh pair -> halo-sharded sample: BFS node partition,
    owner-constrained pooling hierarchies, halo structures, sharded
    features/targets/masks.  `banded=True` RCM-orders each chip's slots and
    routes level-1 convs through the banded Pallas kernel."""
    from geobignn_tpu.data.builder import build_raw
    from geobignn_tpu.pool.hierarchy import build_hierarchy

    bv, bf, meta = build_raw(mesh_noisy, mesh_orig, build_cfg)
    n_v, n_f = bv.n_nodes, bf.n_nodes
    owner_v = hp.partition_nodes(bv.edge_index, n_v, n_parts, seed=seed)
    owner_f = owner_v[meta["fv_indices"][:, 0]].astype(np.int32)
    bv.specs = build_hierarchy(
        bv.edge_index, bv.edge_weight, bv.x, n_v, owner=owner_v,
        weight_type=build_cfg.weight_type,
    )
    bf.specs = build_hierarchy(
        bf.edge_index, bf.edge_weight, bf.x, n_f, owner=owner_f,
        weight_type=build_cfg.weight_type,
    )
    hd = hm.build_halo_dual(
        bv.edge_index, bv.edge_weight, n_v, bv.specs, owner_v,
        bf.edge_index, bf.edge_weight, meta["fv_indices"], bf.specs,
        granularity=granularity, banded=banded,
    )
    from geobignn_tpu.data.dataset import branch_messages

    meta["messages"] = branch_messages(bv) + branch_messages(bf)
    sh_v, sh_f = hd.v.levels[0], hd.f.levels[0]
    arrays = dict(
        d=hm.dual_device_arrays(hd),
        xv=hp.shard_features(bv.x, sh_v),
        xf=hp.shard_features(bf.x, sh_f),
        mv=sh_v.node_mask,
        mf=sh_f.node_mask,
    )
    if bv.depth_direction is not None:  # Kinect force_depth ray per vertex
        arrays["dd"] = hp.shard_features(bv.depth_direction, sh_v)
    if bv.y is not None:  # inference builds have no targets
        arrays["yv"] = hp.shard_features(bv.y, sh_v)
        arrays["yf"] = hp.shard_features(bf.y, sh_f)
    return HaloTrainSample(arrays=arrays, structure=hd, n_v=n_v, n_f=n_f,
                           meta=meta, static=hm.dual_static(hd))


def _rotate_blocks(x, rot):
    """Rotate every 3-wide block of a (..., 3k) feature array."""
    parts = [x[..., i : i + 3] @ rot for i in range(0, x.shape[-1], 3)]
    return jnp.concatenate(parts, axis=-1)


def _cd_halo(vert_p, yv, mv, axis: str):
    """Chamfer loss over the WHOLE partitioned point set, replicated-exact.

    Both sides of the chamfer need cross-chip nearest neighbours, so the
    (small: N x 3) position arrays are all_gathered and every chip runs the
    identical masked chamfer.  The value is returned as psum(cd / P):
    numerically cd (each chip holds the same replicate), and the 1/P
    exactly cancels the P-fold cotangent fan-in of the all_gather
    transpose, so gradients match the single-device chamfer."""
    from geobignn_tpu.models import losses

    p = jax.lax.psum(1, axis)
    vp_all = jax.lax.all_gather(vert_p, axis, tiled=True)
    yv_all = jax.lax.all_gather(yv, axis, tiled=True)
    m_all = jax.lax.all_gather(mv, axis, tiled=True)
    cd = losses.chamfer_distance(vp_all, yv_all, m_all, m_all)
    return jax.lax.psum(cd / p, axis)


def _sided_halo(vert_p, yv, norm_p, yf, mf, a, sd, axis: str):
    """Sided normal loss (reference network.py:385-388) over halo shards:
    each LOCAL predicted face is matched (by centroid) to the nearest
    GLOBAL ground-truth face; targets are all_gathered (no gradients flow
    into them), predictions stay local, partial sums are psummed.  Face
    centroids come from the same fv corner exchange the model uses —
    under stop_gradient, because the argmin match passes no gradient in
    the reference either."""
    from geobignn_tpu.models import losses
    from geobignn_tpu.parallel import partition as hp

    d = a["d"]
    ext_p = hp.halo_exchange(jax.lax.stop_gradient(vert_p), d["send_fv"],
                             axis, sd["fv_rounds"])
    fc_p = ext_p[d["fv"]].mean(axis=1)
    ext_y = hp.halo_exchange(yv, d["send_fv"], axis, sd["fv_rounds"])
    fc_gt = ext_y[d["fv"]].mean(axis=1)

    fc_all = jax.lax.all_gather(fc_gt, axis, tiled=True)
    n_all = jax.lax.all_gather(yf, axis, tiled=True)
    m_all = jax.lax.all_gather(mf, axis, tiled=True)
    idx = losses.nearest_index(fc_p, fc_all, m_all)
    per = jnp.abs(norm_p - n_all[idx]).sum(axis=1)
    s = jax.lax.psum(jnp.stack([(per * mf).sum(), mf.sum()]), axis)
    return s[0] / s[1]


def _halo_loss(params, a: dict, sd: dict, axis: str, pool_type: str,
               cfg: dict, key=None, compute_dtype=None):
    """Per-chip loss with globally psum-normalized denominators: identical
    to the single-device masked dual loss on the unpartitioned graph.
    loss_v: L1 | L2 | CD (chamfer);  loss_n: L1 | L2 | sided.
    Returns (loss, metric sums stacked) — metrics are raw global sums so
    callers can aggregate across steps before normalizing."""
    xv, xf, yv, yf = a["xv"], a["xf"], a["yv"], a["yf"]
    dd = a.get("dd")
    if key is not None:  # shared rotation: key is replicated across chips
        rot = random_rotation_matrix(key, cfg.get("z_only", False))
        xv, xf = _rotate_blocks(xv, rot), _rotate_blocks(xf, rot)
        yv, yf = yv @ rot, yf @ rot
        if dd is not None:
            dd = dd @ rot
    vert_p, norm_p = hm.halo_dual_gnn(params, xv, xf, a["d"], sd, axis,
                                      pool_type, depth_direction=dd,
                                      compute_dtype=compute_dtype)
    mv, mf = a["mv"], a["mf"]

    kv, kn = cfg.get("loss_v", "L1"), cfg.get("loss_n", "L1")
    dv, dn = vert_p - yv, norm_p - yf
    sv = jnp.abs(dv).sum(1) if kv == "L1" else (dv**2).sum(1)
    sn = jnp.abs(dn).sum(1) if kn == "L1" else (dn**2).sum(1)
    # Metrics only — stop_gradient is load-bearing: these ride the same
    # stacked psum as the loss terms, so they receive a zero cotangent, and
    # 0 * inf (sqrt' at 0, arccos' at +-1 on trash lanes) would NaN the
    # whole gradient.
    ev = jax.lax.stop_gradient(jnp.sqrt(((vert_p - yv) ** 2).sum(axis=1)))
    en_val = jnp.clip(1.0 - ((norm_p - yf) ** 2).sum(axis=1) / 2.0, -1.0, 1.0)
    en = jax.lax.stop_gradient(jnp.arccos(en_val) * (180.0 / jnp.pi))

    base = jax.lax.psum(
        jnp.stack([
            (sv * mv).sum(), (sn * mf).sum(),
            (ev * mv).sum(), (en * mf).sum(),
            mv.sum(), mf.sum(),
        ]),
        axis,
    )
    loss_v = _cd_halo(vert_p, yv, mv, axis) if kv == "CD" else base[0] / base[4]
    loss_n = (
        _sided_halo(vert_p, yv, norm_p, yf, mf, a, sd, axis)
        if kn == "sided"
        else base[1] / base[5]
    )
    loss = loss_v * cfg.get("loss_v_scale", 1.0) + loss_n * cfg.get("loss_n_scale", 1.0)
    # metric sums carry the ACTUAL loss components (node-weighted) so the
    # driver's aggregation recovers them whatever the loss family
    sums = jnp.stack([
        jax.lax.stop_gradient(loss_v) * base[4],
        jax.lax.stop_gradient(loss_n) * base[5],
        base[2], base[3], base[4], base[5],
    ])
    return loss, sums


def halo_in_specs(arrays: dict):
    return jax.tree.map(lambda _: P("gp"), arrays)


def make_halo_train_step(
    tx,
    mesh,
    arrays: dict,
    static_d: dict | None = None,
    loss_cfg: dict | None = None,
    pool_type: str = "max",
    augment: bool = False,
    n_steps: int = 1,
    compute_dtype=None,
) -> Callable:
    """Jitted SPMD training step over halo shards.

    Returns step(params, opt_state, arrays, rng) -> (params, opt_state,
    metrics).  `n_steps > 1` chains that many optimizer steps on the same
    sharded sample inside ONE dispatch (full-batch training of a single
    giant mesh is the halo regime; dispatch latency over a tunneled TPU
    otherwise dominates — see trainer.epoch_step).  With augment=True each
    chained step applies an independent shared-across-chips SO(3) rotation.
    Gradients come out of the vma transpose globally psummed, so params
    stay replicated (out_specs P()) without an explicit pmean."""
    cfg = loss_cfg or {}
    axis = "gp"
    if static_d is None:
        # silently-empty rounds would skip every exchange and corrupt the
        # result; the schedule is required (HaloTrainSample.static)
        raise ValueError("make_halo_train_step needs static_d "
                         "(= sample.static / halo_model.dual_static)")
    sd = static_d

    def local_step(params, opt_state, a, rng):
        a = jax.tree.map(lambda t: t[0], a)  # strip the sharded chip axis

        def one(carry, key):
            params, opt_state = carry
            k = key if augment else None
            grads, sums = jax.grad(
                lambda p: _halo_loss(p, a, sd, axis, pool_type, cfg, k,
                                     compute_dtype),
                has_aux=True,
            )(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            return (params, opt_state), sums

        keys = jax.random.split(rng, n_steps)
        (params, opt_state), sums = jax.lax.scan(one, (params, opt_state), keys)
        s = sums[-1]  # last step's global sums
        metrics = dict(
            loss_v=s[0] / s[4], loss_f=s[1] / s[5],
            error_v=s[2] / s[4], error_f=s[3] / s[5],
            n_v=s[4], n_f=s[5],
        )
        metrics["loss"] = (
            metrics["loss_v"] * cfg.get("loss_v_scale", 1.0)
            + metrics["loss_f"] * cfg.get("loss_n_scale", 1.0)
        )
        return params, opt_state, metrics

    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(), halo_in_specs(arrays), P()),
        out_specs=(P(), P(), P()),
        check_vma=True,
    )
    return jax.jit(sharded, donate_argnums=(0, 1))


def make_halo_forward(mesh, arrays: dict, static_d: dict | None = None,
                      pool_type: str = "max", compute_dtype=None) -> Callable:
    """Jitted sharded forward: (params, arrays) -> per-chip (vert_p, norm_p).
    Unshard with `unshard_predictions` for host-side stitching/eval."""
    if static_d is None:
        raise ValueError("make_halo_forward needs static_d "
                         "(= sample.static / halo_model.dual_static)")

    def fwd(params, a):
        a = jax.tree.map(lambda t: t[0], a)  # strip the sharded chip axis
        v, n = hm.halo_dual_gnn(params, a["xv"], a["xf"], a["d"], static_d,
                                "gp", pool_type,
                                depth_direction=a.get("dd"),
                                compute_dtype=compute_dtype)
        return v[None], n[None]  # re-add chip axis: out_specs P("gp") -> (P, n_loc, C)

    sharded = jax.shard_map(
        fwd,
        mesh=mesh,
        in_specs=(P(), halo_in_specs(arrays)),
        out_specs=(P("gp"), P("gp")),
        check_vma=False,
    )
    return jax.jit(sharded)


def unshard_predictions(sample: HaloTrainSample, vert_loc, norm_loc):
    """Per-chip predictions -> global (n_v, 3) positions, (n_f, 3) normals."""
    hd = sample.structure
    v = hp.unshard_features(np.asarray(vert_loc), hd.v.levels[0], sample.n_v)
    n = hp.unshard_features(np.asarray(norm_loc), hd.f.levels[0], sample.n_f)
    return v, n
