"""Small math utilities.

Capability parity targets:
  * batch quaternion -> rotation matrix (code/net_util.py:14-42)
  * iterative closest point prealignment — the reference optionally ICP-
    aligns predictions before the vertex loss via pytorch3d
    (code/network.py:14-17,364-367); here a self-contained SVD-based
    rigid ICP in JAX.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def enable_compile_cache(cache_dir: str | None = None) -> None:
    """Enable JAX's persistent compilation cache (idempotent).

    Pallas-kernel compiles dominate cold-start wall time on the tunneled
    TPU (minutes per shape signature); every long-running entry (train,
    predict_dir, bench, campaign) calls this so restarts and the driver's
    bench run hit the disk cache."""
    import os

    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        # Pallas/Mosaic kernels serialize their MLIR (incl. per-op source
        # locations with FULL call-stack tracebacks) into the custom_call
        # payload, which IS part of the compile-cache key — so by default
        # any line shift in any file on the trace stack invalidates every
        # cached executable (round-2 incident: driver bench timed out on
        # the resulting cold recompile).  Dropping tracebacks from MLIR
        # locations makes lowered modules byte-identical across unrelated
        # source edits (verified: identical lowerings from shifted files).
        jax.config.update("jax_include_full_tracebacks_in_locations", False)
    except Exception:
        pass  # older jax without the knobs: cold compiles only


def batch_quat_to_rotmat(q: jax.Array, normalize: bool = True) -> jax.Array:
    """(B, 4) quaternions -> (B, 3, 3) rotation matrices."""
    s = 2.0 / (q * q).sum(-1) if normalize else jnp.full(q.shape[:1], 2.0)
    h = jnp.einsum("bi,bj->bij", q, q)  # Hamilton product coefficients
    w, x, y, z = 0, 1, 2, 3
    r = jnp.stack(
        [
            1 - (h[:, y, y] + h[:, z, z]) * s,
            (h[:, x, y] - h[:, z, w]) * s,
            (h[:, x, z] + h[:, y, w]) * s,
            (h[:, x, y] + h[:, z, w]) * s,
            1 - (h[:, x, x] + h[:, z, z]) * s,
            (h[:, y, z] - h[:, x, w]) * s,
            (h[:, x, z] - h[:, y, w]) * s,
            (h[:, y, z] + h[:, x, w]) * s,
            1 - (h[:, x, x] + h[:, y, y]) * s,
        ],
        axis=-1,
    )
    return r.reshape(-1, 3, 3)


def _rigid_align(src, dst, weights):
    """Weighted Kabsch: best R, t mapping src -> dst."""
    wsum = jnp.maximum(weights.sum(), 1e-12)
    mu_s = (src * weights[:, None]).sum(0) / wsum
    mu_d = (dst * weights[:, None]).sum(0) / wsum
    a = (src - mu_s) * weights[:, None]
    b = dst - mu_d
    h = a.T @ b
    u, _, vt = jnp.linalg.svd(h)
    d = jnp.sign(jnp.linalg.det(vt.T @ u.T))  # reflection guard
    s = jnp.diag(jnp.stack([jnp.ones(()), jnp.ones(()), d]))
    r = vt.T @ s @ u.T
    t = mu_d - r @ mu_s
    return r, t


@partial(jax.jit, static_argnames=("n_iters", "block"))
def icp_align(
    src: jax.Array,
    dst: jax.Array,
    mask_src: jax.Array | None = None,
    mask_dst: jax.Array | None = None,
    n_iters: int = 10,
    block: int = 1024,
):
    """Rigid ICP: returns (aligned_src, R, t) such that aligned = src@R.T+t.

    Nearest-neighbour correspondences recomputed each iteration with the
    tiled distance kernel (O(block*N) memory)."""
    from geobignn_tpu.models.losses import nearest_index

    ms = jnp.ones(src.shape[0]) if mask_src is None else mask_src
    md = jnp.ones(dst.shape[0]) if mask_dst is None else mask_dst

    def nearest_idx(pts):
        return nearest_index(pts, dst, md, block)

    def body(_, state):
        r, t = state
        cur = src @ r.T + t
        idx = nearest_idx(cur)
        r2, t2 = _rigid_align(src, dst[idx], ms)
        return r2, t2

    r0 = jnp.eye(3)
    t0 = jnp.zeros(3)
    r, t = jax.lax.fori_loop(0, n_iters, body, (r0, t0))
    return src @ r.T + t, r, t
