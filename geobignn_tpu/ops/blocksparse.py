"""Block-sparse FeaStConv: scalar-prefetched column-block indexing.

Lifts the banded kernel's bandwidth ceiling (ops/banded.py MAX_BAND_TILE):
the contiguous 3-tile window assumes graph bandwidth <= tile, which fails on
large meshes (327k faces -> facet bandwidth 1408 > 768-tile VMEM limit) and
previously dropped whole levels to the gather path.  Here each row block
carries its OWN list of column blocks (blk_idx, built on host from the RCM
ordering), so per-block cost scales with the LOCAL neighbor span, not the
global bandwidth — a mesh's worst row no longer taxes every row.

Kernel structure (mirrors ops/banded_pallas.py; math helpers shared):
grid = (n_row_blocks,), `blk_idx` rides as a scalar-prefetch operand and
drives the BlockSpec index maps of the K p/x window operands — the standard
TPU block-sparse pattern (Pallas guide: PrefetchScalarGridSpec).  Padded
blk_idx slots repeat a real block (no extra fetch; the band mask zeroes
their contribution).  The backward emits per-(row-block) window slabs whose
fold is a BLOCK-granular segment-sum over blk_idx — K*B block rows instead
of a per-edge scatter.

Semantics are identical to ops.banded.feast_conv_banded (rank-H factorized
softmax, implicit self-loop, mean aggregation); parity pinned in
tests/test_blocksparse.py.  Reference op: PyG FeaStConv
(code/network.py:258-268).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from geobignn_tpu.ops.banded_pallas import (
    _bwd_body_tf,
    _fwd_body_tf,
    _interpret,
    _rwide_T,
    _use_tf,
    _w2_of,
    _xpw_T,
)
from geobignn_tpu.structs import round_up

def bs_tile() -> int:
    """Row-block size for block-sparse levels: big enough for full MXU
    tiles, small enough that K tracks the local neighbor span.  Read from
    GBN_BS_TILE at USE time (not import time) so perf sweeps and
    monkeypatch.setenv take effect in long-lived processes (ADVICE r2)."""
    return int(os.environ.get("GBN_BS_TILE", "256"))


# --------------------------------------------------------------------------
# host-side builders
# --------------------------------------------------------------------------

def block_sparse_np(
    edge_index: np.ndarray,  # (2, E) trash-padded COO in RCM order
    n_pad: int,  # multiple of tile
    tile: int,
    k_pad: int | None = None,
) -> tuple[np.ndarray, np.ndarray, int]:
    """Per-row-block column-block lists + in-window edge mask.

    Returns (blk_idx (B, K) int32, mask (B, T, K*T) int8, k_needed):
    mask[b, t, j*T + w] = 1 iff edge (b*T + t) <- (blk_idx[b, j]*T + w).
    Padded blk_idx slots repeat the row block's own index (cheap refetch,
    zero mask).  Raises if the graph needs more than k_pad column blocks
    for some row block."""
    assert n_pad % tile == 0, (n_pad, tile)
    n_blk = n_pad // tile
    row = edge_index[0].astype(np.int64)
    col = edge_index[1].astype(np.int64)
    real = row != col  # trash padding is (trash, trash); stored graphs are
    # self-loop-free, so this strips exactly the padding
    row, col = row[real], col[real]
    b = row // tile
    cb = col // tile

    key = b * n_blk + cb
    uniq = np.unique(key)  # sorted (b-major)
    ub, uc = uniq // n_blk, uniq % n_blk
    counts = np.bincount(ub, minlength=n_blk)
    k_needed = int(counts.max()) if uniq.size else 1
    k = k_pad or k_needed
    if k_needed > k:
        raise ValueError(f"needs {k_needed} column blocks > k_pad {k}")

    offsets = np.zeros(n_blk + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    blk_idx = np.broadcast_to(
        np.arange(n_blk, dtype=np.int32)[:, None], (n_blk, k)
    ).copy()  # default: own block (mask-zero repeat)
    j_of_uniq = np.arange(uniq.size) - offsets[ub]
    blk_idx[ub, j_of_uniq] = uc.astype(np.int32)

    pos = np.searchsorted(uniq, key)  # per-edge slot in the uniq list
    j_e = pos - offsets[b]
    t = row - b * tile
    w = j_e * tile + (col - cb * tile)
    mask = np.zeros((n_blk, tile, k * tile), np.int8)
    mask[b, t, w] = 1
    return blk_idx, mask, k_needed


def blocks_needed(edge_index: np.ndarray, n: int, tile: int | None = None) -> int:
    """Max column blocks any row block needs (cheap; no mask built)."""
    tile = bs_tile() if tile is None else tile
    row = edge_index[0].astype(np.int64)
    col = edge_index[1].astype(np.int64)
    real = row != col
    row, col = row[real], col[real]
    if row.size == 0:
        return 1
    n_blk = (round_up(n, tile)) // tile
    key = (row // tile) * n_blk + (col // tile)
    uniq = np.unique(key)
    return int(np.bincount(uniq // n_blk, minlength=n_blk).max())


# --------------------------------------------------------------------------
# kernels (variadic window refs, scalar-prefetched indices)
# --------------------------------------------------------------------------

def _parse(args, k: int, n_out: int):
    """kernel args = (idx_ref, r, p*k, x*k, m, w[, gout], outs...)."""
    ins = args[: len(args) - n_out]
    outs = args[len(args) - n_out:]
    r_ref = ins[1]
    pts = ins[2 : 2 + k]
    xs = ins[2 + k : 2 + 2 * k]
    rest = ins[2 + 2 * k :]
    return r_ref, pts, xs, rest, outs


def _window_ops_T(rt_ref, pts, xts, m_ref):
    rt = rt_ref[0]  # (H, T)
    pw = jnp.concatenate([p[0] for p in pts], axis=-1)  # (H, W)
    xwt = jnp.concatenate([x[0] for x in xts], axis=-1)  # (C, W)
    mf = m_ref[0].astype(jnp.float32)  # (T, W)
    d = jax.lax.dot_general(
        rt, pw, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return rt, pw, xwt, mf, d


def _fwd_kernel_tf(*args, k: int, heads: int, compute_dtype):
    rt_ref, pts, xts, (m_ref, w2_ref), (out_ref,) = _parse(args, k, 1)
    rt, pw, xwt, mf, d = _window_ops_T(rt_ref, pts, xts, m_ref)
    _fwd_body_tf(rt, pw, xwt, mf, d, w2_ref, out_ref, heads, compute_dtype)


def _bwd_kernel_tf(*args, k: int, heads: int, compute_dtype):
    (rt_ref, pts, xts, (m_ref, w2_ref, gt_ref),
     (rbar_ref, pbar_ref, xbar_ref, wbar_ref)) = _parse(args, k, 4)
    rt, pw, xwt, mf, d = _window_ops_T(rt_ref, pts, xts, m_ref)
    _bwd_body_tf(rt, pw, xwt, mf, d, w2_ref, gt_ref,
                 rbar_ref, pbar_ref, xbar_ref, wbar_ref, heads, compute_dtype)


def _fwd_kernel(*args, k: int, heads: int, compute_dtype):
    rt_ref, pts, xts, (m_ref, w_ref), (out_ref,) = _parse(args, k, 1)
    rt, pw, xwt, mf, d = _window_ops_T(rt_ref, pts, xts, m_ref)
    c_in = xwt.shape[0]
    minv = (mf / jnp.maximum(d, 1e-12)).astype(compute_dtype)
    xpwT = _xpw_T(pw, xwt, heads, compute_dtype)  # (H*C, W)
    zT = jax.lax.dot_general(  # (H*C, T)
        xpwT, minv, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    zrT = (zT * _rwide_T(rt, c_in, heads)).astype(compute_dtype)
    w_flat = w_ref[:].astype(compute_dtype)
    out_ref[0] = jax.lax.dot_general(  # (C_out, T)
        w_flat, zrT, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _bwd_kernel(*args, k: int, heads: int, compute_dtype):
    (rt_ref, pts, xts, (m_ref, w_ref, gt_ref),
     (rbar_ref, pbar_ref, xbar_ref, wbar_ref)) = _parse(args, k, 4)
    rt, pw, xwt, mf, d = _window_ops_T(rt_ref, pts, xts, m_ref)
    c_in = xwt.shape[0]
    gt = gt_ref[0]  # (C_out, T)

    dinv = 1.0 / jnp.maximum(d, 1e-12)
    minv = mf * dinv
    minv_c = minv.astype(compute_dtype)
    mdd = jnp.where(d > 1e-12, -minv * dinv, 0.0)

    xpwT = _xpw_T(pw, xwt, heads, compute_dtype)  # (HC, W)
    rwT = _rwide_T(rt, c_in, heads)  # (HC, T)
    gt_c = gt.astype(compute_dtype)
    w_flat = w_ref[:].astype(compute_dtype)

    zT = jax.lax.dot_general(
        xpwT, minv_c, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gyT = jax.lax.dot_general(
        w_flat, gt_c, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    zrT = (zT * rwT).astype(compute_dtype)
    wbar_ref[0] = jax.lax.dot_general(
        zrT, gt_c, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    hc = heads * c_in
    blk_rows = jax.lax.broadcasted_iota(jnp.int32, (hc, heads), 0) // c_in
    blk_cols = jax.lax.broadcasted_iota(jnp.int32, (hc, heads), 1)
    ones_blk = (blk_rows == blk_cols).astype(compute_dtype)
    gz = (gyT * zT).astype(compute_dtype)
    rbar_direct = jax.lax.dot_general(  # (H, T)
        ones_blk, gz, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    ybarT = (gyT * rwT).astype(compute_dtype)
    aT = jax.lax.dot_general(  # (HC, W)
        ybarT, minv_c, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    xbarT = jnp.zeros((c_in, xpwT.shape[1]), jnp.float32)
    pbar_rows = []
    for h in range(heads):
        a_h = aT[h * c_in : (h + 1) * c_in]
        xbarT = xbarT + pw[h][None, :] * a_h
        pbar_rows.append((a_h * xwt).sum(axis=0)[None, :])

    kd = jax.lax.dot_general(  # (T, W)
        ybarT, xpwT, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbar = mdd * kd
    rbar_d = jax.lax.dot_general(
        pw, dbar, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    rbar_ref[0] = rbar_direct + rbar_d
    pbar_ref[0] = jnp.concatenate(pbar_rows, axis=0) + jax.lax.dot_general(
        rt, dbar, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    xbar_ref[0] = xbarT


def _specs(k, tile, heads, c_in, c_out, with_gout: bool, tf: bool = False):
    """Input specs AFTER the scalar-prefetch operand.  Index maps receive
    (b, idx_ref); the j-th window operand reads block idx_ref[b, j]."""
    v = pltpu.VMEM
    own = lambda b, idx: (b, 0, 0)
    w_shape = (heads * c_out, c_in) if tf else (heads * c_in, c_out)

    def at(j):
        return lambda b, idx: (idx[b, j], 0, 0)

    ins = [pl.BlockSpec((1, heads, tile), own, memory_space=v)]  # rT
    ins += [
        pl.BlockSpec((1, heads, tile), at(j), memory_space=v) for j in range(k)
    ]
    ins += [
        pl.BlockSpec((1, c_in, tile), at(j), memory_space=v) for j in range(k)
    ]
    ins.append(pl.BlockSpec((1, tile, k * tile), own, memory_space=v))  # mask
    ins.append(pl.BlockSpec(w_shape, lambda b, idx: (0, 0), memory_space=v))
    if with_gout:
        ins.append(pl.BlockSpec((1, c_out, tile), own, memory_space=v))
    return ins


# --------------------------------------------------------------------------
# XLA twin — the independent numerator REFERENCE the kernel is pinned
# against (tests/test_blocksparse.py::test_xla_numerator_matches_kernel);
# not on any production path (interpret mode runs the kernel itself)
# --------------------------------------------------------------------------

def _xla_numerator(r, p, x, w, m, blk_idx, compute_dtype):
    n_blk, tile, win = m.shape
    k = win // tile
    n, c_in = x.shape
    heads = r.shape[1]
    x_win = x.reshape(n_blk, tile, c_in)[blk_idx].reshape(n_blk, win, c_in)
    p_win = p.reshape(n_blk, tile, heads)[blk_idx].reshape(n_blk, win, heads)
    r_blk = r.reshape(n_blk, tile, heads)
    mf = m.astype(jnp.float32)
    d = jnp.einsum("bth,bwh->btw", r_blk, p_win,
                   preferred_element_type=jnp.float32)
    dinv = 1.0 / jnp.maximum(d, 1e-12)

    def one_head(w_h, p_h, r_h):
        g = (mf * p_h[:, None, :] * dinv).astype(compute_dtype)
        z = jnp.einsum("btw,bwc->btc", g, x_win.astype(compute_dtype),
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


# --------------------------------------------------------------------------
# custom-VJP aggregate
# --------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def bs_aggregate(r, p, x, w, m, blk_idx, compute_dtype=jnp.bfloat16):
    """sum_h r_h ⊙ ((M ⊙ p_h / D) @ x_win) @ W_h over block-sparse windows.

    r, p: (N, H); x: (N, C_in); w: (H, C_in, C_out); m: (B, T, K*T) int8;
    blk_idx: (B, K) int32.  N must be B*T.  Returns (N, C_out) f32."""
    return _call_fwd(r, p, x, w, m, blk_idx, compute_dtype)


def _call_fwd(r, p, x, w, m, blk_idx, compute_dtype):
    n_blk, tile, win = m.shape
    k = win // tile
    n, c_in = x.shape
    heads = r.shape[1]
    c_out = w.shape[2]
    tf = _use_tf(c_in, c_out)
    if tf:
        w_flat = _w2_of(w, heads, c_in, c_out)
        flops = int(2 * n * win * (heads * (c_out + 1) + heads * c_in / 3))
    else:
        w_flat = w.reshape(heads * c_in, c_out)
        flops = int(2 * n * win * (heads * (c_in + 1) + heads * c_out / 3))
    rt = jnp.moveaxis(r.reshape(n_blk, tile, heads), -1, -2)  # (B, H, T)
    pt = jnp.moveaxis(p.reshape(n_blk, tile, heads), -1, -2)  # (B, H, T)
    xt = jnp.moveaxis(x.reshape(n_blk, tile, c_in), -1, -2)  # (B, C, T)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blk,),
        in_specs=_specs(k, tile, heads, c_in, c_out, False, tf),
        out_specs=pl.BlockSpec(
            (1, c_out, tile), lambda b, idx: (b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel_tf if tf else _fwd_kernel,
            k=k, heads=heads, compute_dtype=compute_dtype
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blk, c_out, tile), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=m.size + (2 * k + 1) * x.size * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(blk_idx, rt, *([pt] * k), *([xt] * k), m, w_flat)
    return jnp.moveaxis(out, -1, -2).reshape(n, c_out)


def _bs_fwd(r, p, x, w, m, blk_idx, compute_dtype):
    return _call_fwd(r, p, x, w, m, blk_idx, compute_dtype), (r, p, x, w, m, blk_idx)


def _fold_blocks_T(slabs, blk_idx, n_blk, tile, n):
    """(B, C, K*T) per-row-block window cotangents -> (N, C): block-granular
    segment-sum over the column-block ids (padded slots carry exact zeros)."""
    b, c, win = slabs.shape
    k = win // tile
    flat = jnp.moveaxis(
        slabs.reshape(b, c, k, tile), 1, -1
    ).reshape(-1, tile, c)  # (B*K, T, C)
    out = jax.ops.segment_sum(
        flat, blk_idx.reshape(-1), num_segments=n_blk
    )  # (B, T, C)
    return out.reshape(n_blk * tile, c)[:n]


def _bs_bwd(compute_dtype, res, gout):
    r, p, x, w, m, blk_idx = res
    n_blk, tile, win = m.shape
    k = win // tile
    n, c_in = x.shape
    heads = r.shape[1]
    c_out = w.shape[2]
    tf = _use_tf(c_in, c_out)
    if tf:
        w_flat = _w2_of(w, heads, c_in, c_out)
        wbar_shape = (heads * c_out, c_in)
    else:
        w_flat = w.reshape(heads * c_in, c_out)
        wbar_shape = (heads * c_in, c_out)
    rt = jnp.moveaxis(r.reshape(n_blk, tile, heads), -1, -2)
    pt = jnp.moveaxis(p.reshape(n_blk, tile, heads), -1, -2)
    xt = jnp.moveaxis(x.reshape(n_blk, tile, c_in), -1, -2)
    gt = jnp.moveaxis(
        gout.reshape(n_blk, tile, c_out).astype(jnp.float32), -1, -2
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blk,),
        in_specs=_specs(k, tile, heads, c_in, c_out, True, tf),
        out_specs=(
            pl.BlockSpec((1, heads, tile), lambda b, idx: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, heads, win), lambda b, idx: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_in, win), lambda b, idx: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + wbar_shape, lambda b, idx: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    rbar, pbar, xbar, wbar = pl.pallas_call(
        functools.partial(
            _bwd_kernel_tf if tf else _bwd_kernel,
            k=k, heads=heads, compute_dtype=compute_dtype
        ),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_blk, heads, tile), jnp.float32),
            jax.ShapeDtypeStruct((n_blk, heads, win), jnp.float32),
            jax.ShapeDtypeStruct((n_blk, c_in, win), jnp.float32),
            jax.ShapeDtypeStruct((n_blk,) + wbar_shape, jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(blk_idx, rt, *([pt] * k), *([xt] * k), m, w_flat, gt)

    dr = jnp.moveaxis(rbar, -1, -2).reshape(n, heads)
    dp = _fold_blocks_T(pbar, blk_idx, n_blk, tile, n)
    dx = _fold_blocks_T(xbar, blk_idx, n_blk, tile, n)
    dm = np.zeros(m.shape, jax.dtypes.float0)
    dik = np.zeros(blk_idx.shape, jax.dtypes.float0)
    if tf:
        dw = jnp.moveaxis(wbar.sum(axis=0).reshape(heads, c_out, c_in), 1, 2)
    else:
        dw = wbar.sum(axis=0).reshape(heads, c_in, c_out)
    # cotangent dtypes must match the primals (custom_vjp contract; the
    # kernels accumulate f32 but bf16 compute passes bf16 primals)
    return (dr.astype(r.dtype), dp.astype(p.dtype), dx.astype(x.dtype),
            dw.astype(w.dtype), dm, dik)


bs_aggregate.defvjp(_bs_fwd, _bs_bwd)


def feast_conv_blocksparse(
    params, x, m, blk_idx, deg, *, compute_dtype=jnp.bfloat16
):
    """FeaStConv over block-sparse windows; drop-in for
    ops.banded.feast_conv_banded with (m, blk_idx) instead of a band.
    x: (N, C_in) with N = B*T (caller pads); deg: (N,) real in-degree."""
    a = x @ params.u
    p = jnp.exp(a - jax.lax.stop_gradient(a.max(axis=1, keepdims=True)))
    ca = params.c - a
    r = jnp.exp(ca - jax.lax.stop_gradient(ca.max(axis=1, keepdims=True)))

    out = bs_aggregate(r, p, x, params.w, m, blk_idx, compute_dtype)

    s_self = jax.nn.softmax(params.c)
    w_self = jnp.einsum("h,hio->io", s_self, params.w)
    out = out + jnp.dot(x, w_self, preferred_element_type=jnp.float32)
    out = out / (deg + 1.0)[:, None]
    return out + params.b
