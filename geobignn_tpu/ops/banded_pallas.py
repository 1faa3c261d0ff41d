"""Pallas TPU kernels for the banded block-dense FeaStConv (ops/banded.py).

The XLA formulation of the rank-H factorized conv materializes the
(B, T, W) denominator and per-head weight slabs in HBM (~14 GB of traffic
per level-1 conv — measured 23 ms fwd, slower than the gather path).  These
kernels keep every (T, W) intermediate in VMEM: per grid step (one band
block b) the forward loads r, the 3-block windows of p^T and x^T, the int8
band mask, computes D once on the MXU, then two wide MXU matmuls produce
the head-flattened output — HBM traffic is just the operands (mask + 3x
features) and the output.

TRANSPOSED LAYOUT (round 3): the head-flattened operands are built and
consumed with the flattened H*C axis on SUBLANES and the node axis on
LANES.  The original layout built xpw[w, h*C+c] = p_h(w)·x[w, c] by
broadcasting the (W,) column p_h across lanes — a Mosaic lane-broadcast
that dominated the whole kernel (measured: the z matmul at HALF width only
cut 15% of kernel time, and f32 compute was free ⇒ not MXU-bound).
Building the transpose xpwT[h*C+c, w] = p[h, w]·xT[c, w] instead
broadcasts a (1, W) ROW across sublanes — near-free — and the matmuls
contract lane-to-lane (transposed dot_general), which Mosaic handles at
full tile efficiency.  Measured on the bench facet-L1 shape (N=165888,
T=384, C 64→32, H9): 4.49 ms → 1.37 ms forward (3.3×), bit-identical
output.

The backward kernel recomputes D/G per block (cheap MXU work) and emits
per-block window slabs for x̄ and p̄ which the XLA wrapper folds with two
shifted adds (overlap-add; no scatter), plus W̄ accumulated across grid
steps into a single revisited output block.

Layouts: p and x are passed TRANSPOSED (B+2, H|C, T) so a window row is
lane-contiguous; T is the lane dim (multiple of 128 via pick_tile's
granularity), sublane dims are H/C/H·C.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _common_T(rt_ref, pts, xts, m_ref):
    rt = rt_ref[0]  # (H, T)
    pw = jnp.concatenate([q[0] for q in pts], axis=-1)  # (H, W)
    xwt = jnp.concatenate([q[0] for q in xts], axis=-1)  # (C, W)
    mf = m_ref[0].astype(jnp.float32)  # (T, W)
    d = jax.lax.dot_general(
        rt, pw, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (T, W)
    return rt, pw, xwt, mf, d


def _xpw_T(pw, xwt, heads, compute_dtype):
    """xpwT[h*C + c, w] = p_h(w) * xT[c, w] — per-head scaling folded into
    ONE wide (H*C, W) operand.  The p_h row broadcast runs across SUBLANES
    (cheap); the original lane-direction broadcast dominated the kernel."""
    return jnp.concatenate(
        [(pw[h][None, :] * xwt) for h in range(heads)], axis=0
    ).astype(compute_dtype)


def _rwide_T(rt, c_in, heads):
    """rwT[h*C + c, t] = r[t, h] (sublane-expanded to match xpwT layout)."""
    t = rt.shape[1]
    return jnp.concatenate(
        [jnp.broadcast_to(rt[h][None, :], (c_in, t)) for h in range(heads)],
        axis=0,
    )


def _strip_scale(pw, yT, heads, compute_dtype):
    """out[h*S + s, w] = p_h(w) * yT[h*S + s, w] — per-head row-broadcast
    scaling of an (H*S, W) strip stack (sublane-cheap, like _xpw_T but for
    operands that already differ per head)."""
    s = yT.shape[0] // heads
    return jnp.concatenate(
        [pw[h][None, :] * yT[h * s : (h + 1) * s] for h in range(heads)],
        axis=0,
    ).astype(compute_dtype)


def _head_sum_mat(heads, s, compute_dtype):
    """(H*S, H) block indicator: col h sums strip h's rows (one MXU matmul
    computes all per-head strip column-sums)."""
    hs = heads * s
    rows = jax.lax.broadcasted_iota(jnp.int32, (hs, heads), 0) // s
    cols = jax.lax.broadcasted_iota(jnp.int32, (hs, heads), 1)
    return (rows == cols).astype(compute_dtype)


def _out_sum_mat(heads, c_out, compute_dtype):
    """(C_out, H*C_out) indicator O[o, h*Co + o'] = [o == o']: one matmul
    folds the head strips of a (H*Co, T) stack into the (Co, T) output."""
    hco = heads * c_out
    rows = jax.lax.broadcasted_iota(jnp.int32, (c_out, hco), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (c_out, hco), 1) % c_out
    return (rows == cols).astype(compute_dtype)


def _fwd_kernel_tf(rt_ref, pt0, pt1, pt2, xt0, xt1, xt2, m_ref, w2_ref,
                   out_ref, *, heads: int, compute_dtype):
    """Transform-first forward for C_out < C_in: per-head features are
    mapped to C_out space BEFORE the window aggregate, so the dominant
    (·, W)x(W, T) matmul runs at H*C_out sublanes instead of H*C_in —
    a C_in/C_out FLOP cut on the window work (ROADMAP r3 item: ~1.45-2x).

      yT    = W2 @ xT                 (H*Co, W)   per-head transform
      ypwT  = p ⊙ yT (head strips)
      zT    = ypwT @ (M/D)^T          (H*Co, T)   THE window matmul
      outT  = O (zT ⊙ rw)             (Co, T)     head-sum via indicator
    """
    rt, pw, xwt, mf, d = _common_T(rt_ref, (pt0, pt1, pt2), (xt0, xt1, xt2), m_ref)
    _fwd_body_tf(rt, pw, xwt, mf, d, w2_ref, out_ref, heads, compute_dtype)


def _fwd_body_tf(rt, pw, xwt, mf, d, w2_ref, out_ref, heads, compute_dtype):
    c_out = w2_ref.shape[0] // heads
    minv = (mf / jnp.maximum(d, 1e-12)).astype(compute_dtype)

    w2 = w2_ref[:].astype(compute_dtype)  # (H*Co, C_in)
    yT = jax.lax.dot_general(  # (H*Co, W)
        w2, xwt.astype(compute_dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ypwT = _strip_scale(pw, yT, heads, compute_dtype)
    zT = jax.lax.dot_general(  # (H*Co, T)
        ypwT, minv, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    zrT = (zT * _rwide_T(rt, c_out, heads)).astype(compute_dtype)
    out_ref[0] = jax.lax.dot_general(  # (Co, T)
        _out_sum_mat(heads, c_out, compute_dtype), zrT,
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )


def _bwd_kernel_tf(rt_ref, pt0, pt1, pt2, xt0, xt1, xt2, m_ref, w2_ref,
                   gt_ref, rbar_ref, pbar_ref, xbar_ref, wbar_ref,
                   *, heads: int, compute_dtype):
    """Transform-first backward: the three T-scale window matmuls (zT
    recompute, ȳpw, K) run at H*C_out sublanes; x̄/W̄ close over the W-wide
    transform (no T factor — cheap).

      z̄T   = tile_H(ḡ) ⊙ rw          r̄_direct = Σ_strips ḡ ⊙ zT
      ȳpwT = z̄T @ (M/D)              ȳT = p ⊙ ȳpw
      K    = z̄T^T·ypwT (contract HCo) → d̄ = -(M/D²) ⊙ K → r̄_d, p̄_d
      p̄_direct = Σ_strips yT ⊙ ȳpw
      x̄T   = W2^T ȳT ;  W̄2 = ȳT xT^T
    """
    rt, pw, xwt, mf, d = _common_T(rt_ref, (pt0, pt1, pt2), (xt0, xt1, xt2), m_ref)
    _bwd_body_tf(rt, pw, xwt, mf, d, w2_ref, gt_ref,
                 rbar_ref, pbar_ref, xbar_ref, wbar_ref, heads, compute_dtype)


def _bwd_body_tf(rt, pw, xwt, mf, d, w2_ref, gt_ref,
                 rbar_ref, pbar_ref, xbar_ref, wbar_ref, heads, compute_dtype):
    c_out = w2_ref.shape[0] // heads
    gt = gt_ref[0]  # (C_out, T)

    dinv = 1.0 / jnp.maximum(d, 1e-12)
    minv = mf * dinv
    minv_c = minv.astype(compute_dtype)
    mdd = jnp.where(d > 1e-12, -minv * dinv, 0.0)

    xwt_c = xwt.astype(compute_dtype)
    w2 = w2_ref[:].astype(compute_dtype)
    yT = jax.lax.dot_general(  # (H*Co, W) forward recompute
        w2, xwt_c, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ypwT = _strip_scale(pw, yT, heads, compute_dtype)
    zT = jax.lax.dot_general(  # (H*Co, T)
        ypwT, minv_c, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gz = jnp.concatenate([gt] * heads, axis=0)  # (H*Co, T) head-tiled ḡ
    ones_h = _head_sum_mat(heads, c_out, compute_dtype)
    rbar_direct = jax.lax.dot_general(  # (H, T)
        ones_h, (gz * zT).astype(compute_dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    zbar = (gz * _rwide_T(rt, c_out, heads)).astype(compute_dtype)
    ybarpw = jax.lax.dot_general(  # (H*Co, W)
        zbar, minv_c, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    k = jax.lax.dot_general(  # (T, W) denominator path
        zbar, ypwT, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbar = mdd * k
    rbar_d = jax.lax.dot_general(  # (H, T)
        pw, dbar, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    pbar_direct = jax.lax.dot_general(  # (H, W)
        ones_h, (yT * ybarpw).astype(compute_dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    pbar_d = jax.lax.dot_general(  # (H, W)
        rt, dbar, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    ybarT = _strip_scale(pw, ybarpw, heads, compute_dtype)  # ȳT = p ⊙ ȳpw
    xbar_ref[0] = jax.lax.dot_general(  # (C_in, W)
        w2, ybarT, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    wbar_ref[0] = jax.lax.dot_general(  # (H*Co, C_in)
        ybarT, xwt_c, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    rbar_ref[0] = rbar_direct + rbar_d
    pbar_ref[0] = pbar_direct + pbar_d


def _fwd_kernel(rt_ref, pt0, pt1, pt2, xt0, xt1, xt2, m_ref, w_ref, out_ref,
                *, heads: int, compute_dtype):
    """outT = W^T ((xpwT @ (M/D)^T) ⊙ rwT), all heads flattened into the
    sublane dimension: two wide MXU matmuls per block."""
    rt, pw, xwt, mf, d = _common_T(rt_ref, (pt0, pt1, pt2), (xt0, xt1, xt2), m_ref)
    c_in = xwt.shape[0]
    minv = (mf / jnp.maximum(d, 1e-12)).astype(compute_dtype)

    xpwT = _xpw_T(pw, xwt, heads, compute_dtype)  # (H*C, W)
    zT = jax.lax.dot_general(  # (H*C, T)
        xpwT, minv, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    zrT = (zT * _rwide_T(rt, c_in, heads)).astype(compute_dtype)
    w_flat = w_ref[:].astype(compute_dtype)  # (H*C, C_out), pre-flattened
    out_ref[0] = jax.lax.dot_general(  # (C_out, T)
        w_flat, zrT, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _bwd_kernel(rt_ref, pt0, pt1, pt2, xt0, xt1, xt2, m_ref, w_ref, gt_ref,
                rbar_ref, pbar_ref, xbar_ref, wbar_ref,
                *, heads: int, compute_dtype):
    """Flattened-heads backward, fully transposed: five wide MXU matmuls.

      zT   = xpwT @ minv^T                     (forward recompute)
      ḡzT  = (W_flat ḡ^T) ⊙ rwT                cotangent at z
      W̄    = zrT ḡ^T                           per-block slab, XLA-reduced
      aT   = ȳT @ minv                         closes x̄ and p̄:
               x̄T_c = Σ_h p_h ⊙ aT_h ;  p̄_h = Σ_c xT ⊙ aT_h
      K    = ȳT^T·xpwT (contract HC)           = Σ_h p_h ⊙ (ȳ_h x^T) — the
             denominator path collapses into ONE matmul because xpwT
             already carries the p_h scaling
      d̄   = -(M/D^2) ⊙ K ; r̄T += pw @ d̄^T ; p̄ += rt @ d̄
    """
    rt, pw, xwt, mf, d = _common_T(rt_ref, (pt0, pt1, pt2), (xt0, xt1, xt2), m_ref)
    c_in = xwt.shape[0]
    gt = gt_ref[0]  # (C_out, T)

    dinv = 1.0 / jnp.maximum(d, 1e-12)
    minv = mf * dinv
    minv_c = minv.astype(compute_dtype)
    mdd = jnp.where(d > 1e-12, -minv * dinv, 0.0)  # clamp subgradient

    xpwT = _xpw_T(pw, xwt, heads, compute_dtype)  # (HC, W)
    rwT = _rwide_T(rt, c_in, heads)  # (HC, T)
    gt_c = gt.astype(compute_dtype)
    w_flat = w_ref[:].astype(compute_dtype)  # (HC, C_out)

    zT = jax.lax.dot_general(  # (HC, T)
        xpwT, minv_c, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gyT = jax.lax.dot_general(  # (HC, T)
        w_flat, gt_c, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    zrT = (zT * rwT).astype(compute_dtype)
    wbar_ref[0] = jax.lax.dot_general(  # (HC, C_out); caller reshapes
        zrT, gt_c, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    # r̄ direct part: per-head sublane-group column sums of gy ⊙ z via one
    # matmul against a block-diagonal ones matrix
    hc = heads * c_in
    blk_rows = jax.lax.broadcasted_iota(jnp.int32, (hc, heads), 0) // c_in
    blk_cols = jax.lax.broadcasted_iota(jnp.int32, (hc, heads), 1)
    ones_blk = (blk_rows == blk_cols).astype(compute_dtype)  # (HC, H)
    gz = (gyT * zT).astype(compute_dtype)
    rbar_direct = jax.lax.dot_general(  # (H, T)
        ones_blk, gz, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    ybarT = (gyT * rwT).astype(compute_dtype)  # (HC, T)
    aT = jax.lax.dot_general(  # ȳT minv -> (HC, W)
        ybarT, minv_c, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    xbarT = jnp.zeros((c_in, xpwT.shape[1]), jnp.float32)
    pbar_rows = []
    for h in range(heads):  # (C, W)-strip epilogues, sublane-cheap
        a_h = aT[h * c_in : (h + 1) * c_in]
        xbarT = xbarT + pw[h][None, :] * a_h
        pbar_rows.append((a_h * xwt).sum(axis=0)[None, :])

    k = jax.lax.dot_general(  # ȳT^T xpwT: denominator path in one dot
        ybarT, xpwT, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (T, W)
    dbar = mdd * k
    rbar_d = jax.lax.dot_general(  # (H, T); f32 like the original
        pw, dbar, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    rbar_ref[0] = rbar_direct + rbar_d
    pbar_ref[0] = jnp.concatenate(pbar_rows, axis=0) + jax.lax.dot_general(
        rt, dbar, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (H, W)
    xbar_ref[0] = xbarT


def _specs(n_blk, tile, heads, c_in, c_out, with_gout: bool, tf: bool = False):
    w = 3 * tile
    v = pltpu.VMEM
    w_shape = (heads * c_out, c_in) if tf else (heads * c_in, c_out)
    ins = [
        pl.BlockSpec((1, heads, tile), lambda b: (b, 0, 0), memory_space=v),  # rT
        pl.BlockSpec((1, heads, tile), lambda b: (b, 0, 0), memory_space=v),  # pT b-1
        pl.BlockSpec((1, heads, tile), lambda b: (b + 1, 0, 0), memory_space=v),
        pl.BlockSpec((1, heads, tile), lambda b: (b + 2, 0, 0), memory_space=v),
        pl.BlockSpec((1, c_in, tile), lambda b: (b, 0, 0), memory_space=v),  # xT b-1
        pl.BlockSpec((1, c_in, tile), lambda b: (b + 1, 0, 0), memory_space=v),
        pl.BlockSpec((1, c_in, tile), lambda b: (b + 2, 0, 0), memory_space=v),
        pl.BlockSpec((1, tile, w), lambda b: (b, 0, 0), memory_space=v),  # mask
        pl.BlockSpec(w_shape, lambda b: (0, 0), memory_space=v),
    ]
    if with_gout:
        ins.append(pl.BlockSpec((1, c_out, tile), lambda b: (b, 0, 0), memory_space=v))
    return ins


_NO_TF_NOTED = False


def _use_tf(c_in: int, c_out: int) -> bool:
    """Transform-first pays whenever the window matmuls shrink; ablation
    escape hatch: GBN_NO_TF=1 reproduces the aggregate-first schedule.
    Read at TRACE time: set it before the first jit of the model — a
    toggle after compilation hits the stale jit cache and does nothing
    (hence the one-time log below, matching GBN_FORCE_BS visibility)."""
    import os

    if c_out < c_in and os.environ.get("GBN_NO_TF") == "1":
        global _NO_TF_NOTED
        if not _NO_TF_NOTED:
            _NO_TF_NOTED = True
            print("note: GBN_NO_TF=1 — aggregate-first schedule forced "
                  "for narrowing convs (trace-time flag; already-compiled "
                  "models are unaffected)")
        return False
    return c_out < c_in


def _w2_of(w, heads, c_in, c_out):
    """(H, C_in, C_out) -> (H*C_out, C_in): w2[h*Co + o, c] = w[h, c, o]."""
    return jnp.moveaxis(w, 1, 2).reshape(heads * c_out, c_in)


def _pad_blocks_T(arr, tile):
    """(N, C) -> (B+2, C, T): one zero block on each side, transposed."""
    n, c = arr.shape
    z = jnp.zeros((tile, c), arr.dtype)
    blocks = jnp.concatenate([z, arr, z]).reshape(-1, tile, c)
    return jnp.moveaxis(blocks, -1, -2)


def banded_aggregate(r, p, x, w, m, compute_dtype=jnp.bfloat16, vma=None):
    """sum_h r_h ⊙ ((M ⊙ p_h / D) @ x_win) @ W_h over the band mask.

    r, p: (N, H) factorized softmax halves; x: (N, C_in); w: (H, C_in,
    C_out); m: (B, T, 3T) int8.  Returns (N, C_out) f32.  The matmuls run
    in `compute_dtype` (bf16 default — same MXU passes XLA uses for f32);
    D and all accumulations are f32.

    `vma` (hashable collection of mesh-axis names, e.g. frozenset({"gp"}))
    must be set when calling inside a `check_vma=True` shard_map — pallas
    out_shapes need the varying axes declared, and replicated operands are
    pvary-lifted so every kernel input agrees.  On non-TPU backends with
    `vma` set, an equivalent XLA formulation runs instead: the interpret-
    mode HLO interpreter cannot mix varying operands with its own
    replicated grid indices (jax-ml/jax dynamic_slice vma mismatch)."""
    if vma is not None and _interpret():
        return _xla_numerator(r, p, x, w, m, compute_dtype)
    return _banded_aggregate_kernel(r, p, x, w, m, compute_dtype, vma)


def _xla_numerator(r, p, x, w, m, compute_dtype):
    """Pure-XLA twin of the kernel (ops/banded.py math, numerator only)."""
    from geobignn_tpu.ops.banded import _window

    n_blk, tile, win = m.shape
    n, c_in = x.shape
    x_win = _window(x.astype(compute_dtype), tile)
    p_win = _window(p, tile)
    r_blk = r.reshape(n_blk, tile, -1)
    mf = m.astype(jnp.float32)
    d = jnp.einsum("bth,bwh->btw", r_blk, p_win,
                   preferred_element_type=jnp.float32)
    dinv = 1.0 / jnp.maximum(d, 1e-12)

    def one_head(w_h, p_h, r_h):
        g = (mf * p_h[:, None, :] * dinv).astype(compute_dtype)
        z = jnp.einsum("btw,bwc->btc", g, x_win,
                       preferred_element_type=jnp.float32)
        z = (z * r_h[..., None]).astype(compute_dtype)
        return jnp.einsum("btc,co->bto", z, w_h.astype(compute_dtype),
                          preferred_element_type=jnp.float32)

    p_heads = jnp.moveaxis(p_win, -1, 0)
    r_heads = jnp.moveaxis(r_blk, -1, 0)
    out0 = one_head(w[0], p_heads[0], r_heads[0])

    def body(acc, whr):
        return acc + one_head(*whr), None

    out, _ = jax.lax.scan(body, out0, (w[1:], p_heads[1:], r_heads[1:]))
    return out.reshape(n, -1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _banded_aggregate_kernel(r, p, x, w, m, compute_dtype=jnp.bfloat16, vma=None):
    return _call_fwd(r, p, x, w, m, compute_dtype, vma)


def _sds(shape, vma):
    if vma is None:
        return jax.ShapeDtypeStruct(shape, jnp.float32)
    return jax.ShapeDtypeStruct(shape, jnp.float32, vma=frozenset(vma))


def _call_fwd(r, p, x, w, m, compute_dtype, vma=None):
    n_blk, tile, win = m.shape
    n, c_in = x.shape
    heads = r.shape[1]
    c_out = w.shape[2]
    tf = _use_tf(c_in, c_out)
    if tf:
        w_flat = _w2_of(w, heads, c_in, c_out)
        flops = int(2 * n * win * (heads * (c_out + 1) + heads * c_in / 3))
        kern = _fwd_kernel_tf
    else:
        w_flat = w.reshape(heads * c_in, c_out)
        flops = int(2 * n * win * (heads * (c_in + 1) + heads * c_out / 3))
        kern = _fwd_kernel
    if vma is not None:  # lift replicated operands to the varying set
        w_flat = jax.lax.pcast(w_flat, tuple(vma), to='varying')
    rt = jnp.moveaxis(r.reshape(n_blk, tile, heads), -1, -2)  # (B, H, T)
    pt = _pad_blocks_T(p, tile)  # (B+2, H, T)
    xt = _pad_blocks_T(x, tile)  # (B+2, C, T)
    out = pl.pallas_call(
        functools.partial(kern, heads=heads, compute_dtype=compute_dtype),
        grid=(n_blk,),
        in_specs=_specs(n_blk, tile, heads, c_in, c_out, False, tf),
        out_specs=pl.BlockSpec(
            (1, c_out, tile), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=_sds((n_blk, c_out, tile), vma),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=m.size + 3 * x.size * 4, transcendentals=0
        ),
        compiler_params=pltpu.CompilerParams(
            # default scoped-vmem limit is 16 MB; the f32 (T, 3T) D/mask
            # intermediates exceed it at tile >= 768 (327k-face meshes)
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(rt, pt, pt, pt, xt, xt, xt, m, w_flat)
    return jnp.moveaxis(out, -1, -2).reshape(n, c_out)


def _interpret() -> bool:
    """Pallas kernels compile only on TPU; the CPU test mesh (conftest pins
    JAX_PLATFORMS=cpu) runs them in interpreter mode."""
    return jax.default_backend() != "tpu"


def _banded_aggregate_fwd(r, p, x, w, m, compute_dtype, vma):
    out = _call_fwd(r, p, x, w, m, compute_dtype, vma)
    return out, (r, p, x, w, m)


def _fold_windows_T(slabs, tile, n):
    """(B, C, 3T) per-block window cotangents -> (N, C) overlap-add
    (done in the transposed layout; one final moveaxis)."""
    n_blk, c = slabs.shape[0], slabs.shape[1]
    parts = slabs.reshape(n_blk, c, 3, tile)
    z = jnp.zeros((1, c, tile), slabs.dtype)
    prev = jnp.concatenate([parts[1:, :, 0], z])  # block b+1's "prev" slab
    cur = parts[:, :, 1]
    nxt = jnp.concatenate([z, parts[:-1, :, 2]])  # block b-1's "next" slab
    summed = prev + cur + nxt  # (B, C, T)
    return jnp.moveaxis(summed, -1, -2).reshape(n_blk * tile, c)


def _banded_aggregate_bwd(compute_dtype, vma, res, gout):
    r, p, x, w, m = res
    n_blk, tile, win = m.shape
    n, c_in = x.shape
    heads = r.shape[1]
    c_out = w.shape[2]
    tf = _use_tf(c_in, c_out)
    if tf:
        w_flat = _w2_of(w, heads, c_in, c_out)
        wbar_shape = (heads * c_out, c_in)
        kern = _bwd_kernel_tf
    else:
        w_flat = w.reshape(heads * c_in, c_out)
        wbar_shape = (heads * c_in, c_out)
        kern = _bwd_kernel
    if vma is not None:
        w_flat = jax.lax.pcast(w_flat, tuple(vma), to='varying')
    rt = jnp.moveaxis(r.reshape(n_blk, tile, heads), -1, -2)
    pt = _pad_blocks_T(p, tile)
    xt = _pad_blocks_T(x, tile)
    gt = jnp.moveaxis(
        gout.reshape(n_blk, tile, c_out).astype(jnp.float32), -1, -2
    )  # (B, C_out, T)

    rbar, pbar, xbar, wbar = pl.pallas_call(
        functools.partial(kern, heads=heads, compute_dtype=compute_dtype),
        grid=(n_blk,),
        in_specs=_specs(n_blk, tile, heads, c_in, c_out, True, tf),
        out_specs=(
            pl.BlockSpec((1, heads, tile), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, heads, win), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_in, win), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            # per-block W̄ slabs, reduced in XLA: a revisited accumulator
            # block would serialize the grid pipeline
            pl.BlockSpec((1,) + wbar_shape, lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            _sds((n_blk, heads, tile), vma),
            _sds((n_blk, heads, win), vma),
            _sds((n_blk, c_in, win), vma),
            _sds((n_blk,) + wbar_shape, vma),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(rt, pt, pt, pt, xt, xt, xt, m, w_flat, gt)

    dr = jnp.moveaxis(rbar, -1, -2).reshape(n, heads)
    dp = _fold_windows_T(pbar, tile, n)  # (N, H)
    dx = _fold_windows_T(xbar, tile, n)  # (N, C_in)
    dm = np.zeros(m.shape, jax.dtypes.float0)  # int mask: no cotangent
    if tf:
        dw = jnp.moveaxis(
            wbar.sum(axis=0).reshape(heads, c_out, c_in), 1, 2
        )
    else:
        dw = wbar.sum(axis=0).reshape(heads, c_in, c_out)
    if vma is not None:
        # w binds replicated: built-in ops get this psum from the pvary
        # transpose, a custom VJP must reduce its own cotangent
        dw = jax.lax.psum(dw, tuple(vma))
    # cotangent dtypes must match the primals (custom_vjp contract): the
    # kernels accumulate in f32, but under a bf16 compute_dtype the
    # primal operands arrive bf16 (hit by the 1.31M-face bf16 step)
    return (dr.astype(r.dtype), dp.astype(p.dtype), dx.astype(x.dtype),
            dw.astype(w.dtype), dm)


_banded_aggregate_kernel.defvjp(_banded_aggregate_fwd, _banded_aggregate_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _gather_unique(x, jnodes, jpos):
    """(N, C) -> (S, C) row gather whose BACKWARD is also a gather.

    `jnodes` must hit each real row at most once with `jpos` its inverse
    (sentinel S elsewhere; ops/banded.boundary_band_np builds both), so
    the scatter-add transpose collapses to `pad(g)[jpos]`.  Duplicate
    trash slots in jnodes legitimately drop their cotangent: the trash
    row's value never reaches the output (empty sub-band mask rows).
    XLA's scatter lowering measured 3.8 ms per (N, 9) operand at 327k —
    the dominant fusion group in the step trace — vs ~1 ms for the
    equivalent sentinel-row gather."""
    return x[jnodes]


def _gather_unique_fwd(x, jnodes, jpos):
    return x[jnodes], (jnodes, jpos)


def _gather_unique_bwd(res, g):
    jnodes, jpos = res
    dx = jnp.pad(g, ((0, 1), (0, 0)))[jpos]
    return dx, None, None


_gather_unique.defvjp(_gather_unique_fwd, _gather_unique_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _scatter_add_unique(num, corr, jnodes, jpos):
    """num.at[jnodes].add(corr) as a sentinel-row GATHER (same uniqueness
    contract as _gather_unique); backward is the gather corr̄ = ḡ[jnodes]."""
    return num + jnp.pad(corr, ((0, 1), (0, 0)))[jpos]


def _scatter_add_unique_fwd(num, corr, jnodes, jpos):
    return _scatter_add_unique(num, corr, jnodes, jpos), (jnodes, jpos)


def _scatter_add_unique_bwd(res, g):
    jnodes, jpos = res
    return g, g[jnodes], None, None


_scatter_add_unique.defvjp(_scatter_add_unique_fwd, _scatter_add_unique_bwd)


def feast_conv_hybrid_band(
    params, x, m, jnodes, jband, jpos, deg, *, compute_dtype=jnp.bfloat16,
):
    """Band + banded-SUB-GRAPH hybrid FeaStConv: in-window edges run the
    main banded Pallas aggregate; the out-of-window boundary runs the SAME
    kernel over gathered boundary-node features at a tiny tile (the
    junction sub-graph's RCM bandwidth is ~10; ops/banded.boundary_band_np).
    The per-edge head softmax is independent per edge, so the two partial
    aggregates are exactly additive; `deg` counts BOTH edge sets.
    Replaces the compact-table correction (measured 70% of the hybrid
    conv's cost at 327k — examples/probe_f1_327k.py).

    p/r for the sub-problem are recomputed from the GATHERED x (one
    well-tiled 64-ch gather) instead of gathering the (N, 9) p/r arrays:
    the factorized softmax is per-node-shift invariant, so local max
    shifts give identical q, and the narrow-operand gathers/scatters —
    whose 9-lane rows waste 14x bandwidth — disappear from the graph."""
    a = x @ params.u
    p = jnp.exp(a - jax.lax.stop_gradient(a.max(axis=1, keepdims=True)))
    ca = params.c - a
    r = jnp.exp(ca - jax.lax.stop_gradient(ca.max(axis=1, keepdims=True)))
    num = banded_aggregate(r, p, x, params.w, m, compute_dtype)

    # gathered sub-problem: trash-padded jnodes point at the zero trash
    # row; their sub-band mask rows are empty, so their aggregate is 0 and
    # the duplicate sentinel adds below are exact no-ops
    x_s = _gather_unique(x, jnodes, jpos)
    a_s = x_s @ params.u
    p_s = jnp.exp(a_s - jax.lax.stop_gradient(a_s.max(axis=1, keepdims=True)))
    ca_s = params.c - a_s
    r_s = jnp.exp(ca_s - jax.lax.stop_gradient(ca_s.max(axis=1, keepdims=True)))
    corr = banded_aggregate(r_s, p_s, x_s, params.w, jband, compute_dtype)
    num = _scatter_add_unique(num, corr, jnodes, jpos)

    s_self = jax.nn.softmax(params.c)
    w_self = jnp.einsum("h,hio->io", s_self, params.w)
    out = num + jnp.dot(x, w_self, preferred_element_type=jnp.float32)
    out = out / (deg + 1.0)[:, None]
    return out + params.b


def feast_conv_hybrid(
    params, x, m, rows_b, nbr_b, kmask_b, src_b, rev_b, deg, *,
    compute_dtype=jnp.bfloat16,
):
    """Band + boundary-table hybrid FeaStConv (slab-RCM node order,
    ops/banded.order_for_band / hybrid_arrays_np): in-window edges run the
    banded Pallas aggregate; the small out-of-window boundary runs a
    compact per-edge softmax correction over `rows_b` only.  The FeaSt
    softmax is per-edge, so the two partial aggregates are exactly
    additive; `deg` counts BOTH edge sets.  Single-chip analog of
    parallel.partition.halo_feast_conv_banded (there the boundary lives in
    halo buffers; here everything is resident, so the correction is a
    gather + scatter-add over the M_b boundary rows)."""
    from geobignn_tpu.ops import table as tbl

    a = x @ params.u
    p = jnp.exp(a - jax.lax.stop_gradient(a.max(axis=1, keepdims=True)))
    ca = params.c - a
    r = jnp.exp(ca - jax.lax.stop_gradient(ca.max(axis=1, keepdims=True)))
    num = banded_aggregate(r, p, x, params.w, m, compute_dtype)

    x_i = x[rows_b]  # (M_b, C); unique rows -> cheap scatter in backward
    xnb = tbl.table_gather_compact(x, nbr_b, src_b, rev_b)  # (M_b, K_b, C)
    s = jnp.einsum("mkc,ch->mkh", xnb - x_i[:, None, :], params.u) + params.c
    q = jax.nn.softmax(s, axis=-1) * kmask_b[..., None]
    z = jnp.einsum("mkh,mkc->mhc", q, xnb)
    corr = jnp.einsum("mhc,hco->mo", z, params.w)
    # trash-padded rows_b carry kmask 0 -> corr 0 -> harmless dup adds
    num = num.at[rows_b].add(corr)

    s_self = jax.nn.softmax(params.c)
    w_self = jnp.einsum("h,hio->io", s_self, params.w)
    out = num + jnp.dot(x, w_self, preferred_element_type=jnp.float32)
    out = out / (deg + 1.0)[:, None]
    return out + params.b


def feast_conv_banded_pallas(
    params, x, m, deg, *, compute_dtype=jnp.bfloat16, interpret=False
):
    """Drop-in for ops.banded.feast_conv_banded using the Pallas kernels.
    Differentiable end-to-end: the p/r/self-loop/normalization epilogue is
    plain XLA; the banded aggregate has the custom VJP above."""
    del interpret  # kept for API symmetry with test harnesses
    a = x @ params.u
    p = jnp.exp(a - jax.lax.stop_gradient(a.max(axis=1, keepdims=True)))
    ca = params.c - a
    r = jnp.exp(ca - jax.lax.stop_gradient(ca.max(axis=1, keepdims=True)))

    out = banded_aggregate(r, p, x, params.w, m, compute_dtype)

    s_self = jax.nn.softmax(params.c)
    w_self = jnp.einsum("h,hio->io", s_self, params.w)
    out = out + jnp.dot(x, w_self, preferred_element_type=jnp.float32)
    out = out / (deg + 1.0)[:, None]
    return out + params.b
