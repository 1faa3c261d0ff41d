"""Multi-chip execution: data-parallel x graph-parallel SPMD.

The reference is strictly single-process / single-GPU (SURVEY §2c); its only
scaling mechanism is host-side submesh splitting with overlap averaging.
This module is the first-class replacement, built on `jax.sharding.Mesh` +
`shard_map` with XLA collectives over ICI:

  * axis "dp" — data parallel: the stacked sample batch is split across
    chips; gradients are pmean'd.
  * axis "gp" — graph (edge-partition) parallel, the mesh analog of
    sequence/context parallelism: each chip owns a slice of every level's
    edge list (the trash-padding convention makes ANY contiguous slice a
    valid partition), node features stay replicated, and each FeaStConv
    combines partial aggregates with one fused psum over "gp"
    (ops/feastconv.py).  Backward collectives are inserted automatically by
    shard_map's varying-axes tracking.

Halo-exchange node partitioning (replacing replication with ppermute'd
boundary buffers) is the planned next stage on top of this seam.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from geobignn_tpu.models import losses
from geobignn_tpu.structs import DualSample


def make_mesh(dp: int, gp: int, devices=None, dcn: int = 1) -> Mesh:
    """Device mesh for SPMD training.

    dcn > 1 adds a leading cross-host data-parallel axis: devices are laid
    out (dcn, dp, gp) so that the fast-collective axes ("dp" grad
    reduction, "gp" per-conv psums) ride ICI within a host/slice while only
    the once-per-step gradient pmean crosses the DCN axis.  On real
    multi-host pods call `distributed_init()` first so jax.devices() spans
    all processes; device order groups same-host devices contiguously,
    matching this layout."""
    devices = jax.devices() if devices is None else devices
    need = dcn * dp * gp
    assert len(devices) >= need, f"need {need} devices, have {len(devices)}"
    if dcn > 1:
        dev = np.asarray(devices[:need]).reshape(dcn, dp, gp)
        return Mesh(dev, ("dcn", "dp", "gp"))
    dev = np.asarray(devices[:need]).reshape(dp, gp)
    return Mesh(dev, ("dp", "gp"))


def distributed_init(coordinator: str | None = None, num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize cross-host JAX (DCN).  A no-op when the runtime is
    single-process (e.g. the CPU test mesh or one tunneled chip); on a real
    multi-host pod arguments default from the cluster environment."""
    if jax.process_count() > 1:
        return  # already initialized by the launcher
    try:
        jax.distributed.initialize(coordinator, num_processes, process_id)
    except (ValueError, RuntimeError):
        pass  # single-process environment: nothing to join


def _dp_axes(mesh: Mesh) -> tuple[str, ...]:
    """Mesh axes the batch is split over (everything except "gp")."""
    return tuple(a for a in mesh.axis_names if a != "gp")


def stack_samples(samples: list[DualSample]) -> DualSample:
    """Stack same-SizePlan samples into a batched pytree (leading axis B)."""
    return jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]), *samples)


_EDGE_LEAVES = {"edge_index", "edge_weight"}


def batch_pspecs(batched: DualSample, dp_axes: tuple[str, ...] = ("dp",),
                 gp_shard: bool = True) -> Any:
    """PartitionSpec pytree for a batched sample: batch axis over `dp_axes`
    (("dcn", "dp") on a multi-host mesh); edge arrays additionally sharded
    on "gp" along the edge axis.  gp_shard=False keeps edges whole per dp
    rank (models without a psum_axis edge path, e.g. dynamic pooling —
    which is dp-only; config rejects gp > 1 there)."""
    b = dp_axes[0] if len(dp_axes) == 1 else tuple(dp_axes)

    def spec(path, leaf):
        name = None
        for k in reversed(path):
            if isinstance(k, jax.tree_util.GetAttrKey):
                name = k.name
                break
        if gp_shard and name == "edge_index":  # (B, 2, E)
            return P(b, None, "gp")
        if gp_shard and name == "edge_weight":  # (B, E)
            return P(b, "gp")
        return P(b, *([None] * (leaf.ndim - 1)))

    return jax.tree_util.tree_map_with_path(spec, batched)


def dual_loss_and_metrics(model, params, sample: DualSample, cfg) -> tuple:
    """Shared loss computation: returns (loss, metrics dict)."""
    vert_p, norm_p = model.apply(params, sample)
    mask_v = sample.v.levels[0].node_mask
    mask_f = sample.f.levels[0].node_mask
    lv = losses.loss_v(vert_p, sample.v.y, mask_v, cfg.get("loss_v", "L1"))
    ln = losses.loss_n(norm_p, sample.f.y, mask_f, cfg.get("loss_n", "L1"))
    loss = losses.dual_loss(
        lv, ln, cfg.get("loss_v_scale", 1.0), cfg.get("loss_n_scale", 1.0)
    )
    metrics = dict(
        loss=loss,
        loss_v=lv,
        loss_f=ln,
        error_v=losses.error_v(vert_p, sample.v.y, mask_v),
        error_f=losses.error_n(norm_p, sample.f.y, mask_f),
    )
    return loss, metrics


def make_sharded_train_step(
    model,
    tx,
    mesh: Mesh,
    batched_sample: DualSample,
    loss_cfg: dict | None = None,
    augment: bool = False,
    gp_shard: bool = True,
) -> Callable:
    """Build the jitted SPMD train step for a given batch structure.

    model must be constructed with gp_axis="gp".  The step consumes the
    full stacked batch (B divisible by dp), runs grad accumulation over the
    local per-chip micro-batch via lax.scan, pmeans over "dp", and applies
    one optimizer update.  Returns step(params, opt_state, batch, rng) ->
    (params, opt_state, metrics).  With augment=True each sample gets an
    independent on-device random SO(3) rotation derived from rng."""
    from geobignn_tpu.data import augment as aug

    cfg = loss_cfg or {}
    dp_axes = _dp_axes(mesh)
    specs = batch_pspecs(batched_sample, dp_axes, gp_shard=gp_shard)

    def local_step(params, opt_state, batch, rng):
        rank = jax.lax.axis_index(dp_axes)

        def loss_fn(p, sample):
            return dual_loss_and_metrics(model, p, sample, cfg)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def body(carry, inp):
            g_acc, m_acc = carry
            i, sample = inp
            if augment:
                key = jax.random.fold_in(jax.random.fold_in(rng, rank), i)
                sample = aug.random_rotate(sample, key)
            (_, m), g = grad_fn(params, sample)
            g_acc = jax.tree.map(lambda a, b: a + b, g_acc, g)
            m_acc = jax.tree.map(lambda a, b: a + b, m_acc, m)
            return (g_acc, m_acc), None

        # initial accumulators must carry the same varying-axes type as the
        # body outputs (dp-varying, since the batch is dp-sharded)
        vary = lambda t: jax.tree.map(
            lambda a: jax.lax.pcast(a, dp_axes, to="varying"), t
        )
        zeros_g = vary(jax.tree.map(jax.numpy.zeros_like, params))
        zeros_m = vary({
            k: jax.numpy.zeros(()) for k in ["loss", "loss_v", "loss_f", "error_v", "error_f"]
        })
        b_len = jax.tree.leaves(batch)[0].shape[0]
        idxs = jax.numpy.arange(b_len)
        (grads, metrics), _ = jax.lax.scan(body, (zeros_g, zeros_m), (idxs, batch))

        # check_vma's transpose of the params pcast already psums grads over
        # the mesh axes, so every dp rank holds the GLOBAL gradient sum; the
        # pmean below is numerically a no-op that restores the invariant vma
        # type (the scan carry forced dp-varying), then we normalize by the
        # global batch.  Metrics are genuinely dp-varying per-rank means.
        b_local = jax.tree.leaves(batch)[0].shape[0]
        b_global = b_local * jax.lax.axis_size(dp_axes)
        grads = jax.lax.pmean(grads, dp_axes)
        grads = jax.tree.map(lambda g: g / b_global, grads)
        metrics = jax.tree.map(lambda m: m / b_local, metrics)
        metrics = jax.lax.pmean(metrics, dp_axes)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, metrics

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(), specs, P()),
        out_specs=(P(), P(), P()),
        check_vma=True,  # varying-axes tracking inserts the gp backward psums
    )
    return jax.jit(sharded)
