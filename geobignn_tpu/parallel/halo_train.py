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
    if bv.y is not None:  # inference builds have no targets
        arrays["yv"] = hp.shard_features(bv.y, sh_v)
        arrays["yf"] = hp.shard_features(bf.y, sh_f)
    return HaloTrainSample(arrays=arrays, structure=hd, n_v=n_v, n_f=n_f, meta=meta)


def _rotate_blocks(x, rot):
    """Rotate every 3-wide block of a (..., 3k) feature array."""
    parts = [x[..., i : i + 3] @ rot for i in range(0, x.shape[-1], 3)]
    return jnp.concatenate(parts, axis=-1)


def _halo_loss(params, a: dict, axis: str, pool_type: str, cfg: dict, key=None):
    """Per-chip loss with globally psum-normalized denominators: identical
    to the single-device masked dual loss (L1/L2) on the unpartitioned
    graph.  Returns (loss, metric sums stacked) — metrics are raw global
    sums so callers can aggregate across steps before normalizing."""
    xv, xf, yv, yf = a["xv"], a["xf"], a["yv"], a["yf"]
    if key is not None:  # shared rotation: key is replicated across chips
        rot = random_rotation_matrix(key, cfg.get("z_only", False))
        xv, xf = _rotate_blocks(xv, rot), _rotate_blocks(xf, rot)
        yv, yf = yv @ rot, yf @ rot
    vert_p, norm_p = hm.halo_dual_gnn(params, xv, xf, a["d"], axis, pool_type)
    mv, mf = a["mv"], a["mf"]

    dv, dn = vert_p - yv, norm_p - yf
    sv = jnp.abs(dv).sum(1) if cfg.get("loss_v", "L1") == "L1" else (dv**2).sum(1)
    sn = jnp.abs(dn).sum(1) if cfg.get("loss_n", "L1") == "L1" else (dn**2).sum(1)
    # Metrics only — stop_gradient is load-bearing: these ride the same
    # stacked psum as the loss terms, so they receive a zero cotangent, and
    # 0 * inf (sqrt' at 0, arccos' at +-1 on trash lanes) would NaN the
    # whole gradient.
    ev = jax.lax.stop_gradient(jnp.sqrt(((vert_p - yv) ** 2).sum(axis=1)))
    en_val = jnp.clip(1.0 - ((norm_p - yf) ** 2).sum(axis=1) / 2.0, -1.0, 1.0)
    en = jax.lax.stop_gradient(jnp.arccos(en_val) * (180.0 / jnp.pi))

    sums = jax.lax.psum(
        jnp.stack([
            (sv * mv).sum(), (sn * mf).sum(),
            (ev * mv).sum(), (en * mf).sum(),
            mv.sum(), mf.sum(),
        ]),
        axis,
    )
    loss_v = sums[0] / sums[4]
    loss_n = sums[1] / sums[5]
    loss = loss_v * cfg.get("loss_v_scale", 1.0) + loss_n * cfg.get("loss_n_scale", 1.0)
    return loss, sums


def halo_in_specs(arrays: dict):
    return jax.tree.map(lambda _: P("gp"), arrays)


def make_halo_train_step(
    tx,
    mesh,
    arrays: dict,
    loss_cfg: dict | None = None,
    pool_type: str = "max",
    augment: bool = False,
    n_steps: int = 1,
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

    def local_step(params, opt_state, a, rng):
        a = jax.tree.map(lambda t: t[0], a)  # strip the sharded chip axis

        def one(carry, key):
            params, opt_state = carry
            k = key if augment else None
            grads, sums = jax.grad(
                lambda p: _halo_loss(p, a, axis, pool_type, cfg, k),
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


def make_halo_forward(mesh, arrays: dict, pool_type: str = "max") -> Callable:
    """Jitted sharded forward: (params, arrays) -> per-chip (vert_p, norm_p).
    Unshard with `unshard_predictions` for host-side stitching/eval."""

    def fwd(params, a):
        a = jax.tree.map(lambda t: t[0], a)  # strip the sharded chip axis
        v, n = hm.halo_dual_gnn(params, a["xv"], a["xf"], a["d"], "gp", pool_type)
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
