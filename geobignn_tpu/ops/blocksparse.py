"""Block-sparse FeaStConv: scalar-prefetched column-block indexing.

Lifts the banded kernel's bandwidth ceiling (ops/banded.py MAX_BAND_TILE):
the contiguous 3-tile window assumes graph bandwidth <= tile, which fails on
large meshes (327k faces -> facet bandwidth ~1300 > 768-tile VMEM limit) and
previously dropped whole levels to the gather path.  Here each row block
carries its OWN list of column blocks (blk_idx, built on host from the RCM
ordering) plus its own block COUNT (blk_cnt), so per-block cost scales with
the LOCAL neighbor-cluster count, not the global bandwidth and not even the
worst row block's K: the kernels run a (B, K_max) grid and SKIP the padded
column blocks of every row block (`@pl.when(j < blk_cnt[b])`), with input
index maps clamped so skipped steps re-fetch nothing.  Executed MXU work is
therefore sum_b(k_b) * T * window-block, i.e. proportional to the MEAN K.

Kernel structure (math identical to ops/banded_pallas.py — the rank-H
factorized softmax): `blk_idx`/`blk_cnt` ride as scalar-prefetch operands
driving the BlockSpec index maps — the standard TPU block-sparse pattern
(Pallas guide: PrefetchScalarGridSpec).  The forward accumulates the
(T, H*C) numerator in VMEM scratch across the j steps and applies the
r-scaling + head transform at the last j; the backward emits per-(b, j)
window slabs whose fold is a BLOCK-granular segment-sum over blk_idx.

Semantics are identical to ops.banded.feast_conv_banded (rank-H factorized
softmax, implicit self-loop, mean aggregation); parity pinned in
tests/test_blocksparse.py.  Reference op: PyG FeaStConv
(code/network.py:258-268).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from geobignn_tpu.ops.banded_pallas import _interpret, _rwide, _xpw_all
from geobignn_tpu.structs import round_up

BS_TILE = 128  # row/column block size.  Measured on icosphere meshes
# (T128 vs T256, facet graph): mean K*T window 1200 vs 2074 at 327k faces
# — the smaller tile tracks the local neighbor span much tighter, and
# T=128 still fills the MXU's row dimension.


# --------------------------------------------------------------------------
# host-side builders
# --------------------------------------------------------------------------

def block_sparse_np(
    edge_index: np.ndarray,  # (2, E) trash-padded COO in RCM order
    n_pad: int,  # multiple of tile
    tile: int,
    k_pad: int | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Per-row-block column-block lists + counts + in-window edge mask.

    Returns (blk_idx (B, K) int32, blk_cnt (B,) int32, mask (B, T, K*T)
    int8, k_needed): mask[b, t, j*T + w] = 1 iff edge
    (b*T + t) <- (blk_idx[b, j]*T + w).  Padded blk_idx slots repeat the
    row block's LAST VALID column block (the kernels' clamped index maps
    then re-fetch nothing for skipped steps; the mask is zero there).
    Raises if some row block needs more than k_pad column blocks."""
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
    ).copy()  # edgeless row blocks: own index everywhere
    j_of_uniq = np.arange(uniq.size) - offsets[:-1][ub]
    blk_idx[ub, j_of_uniq] = uc.astype(np.int32)
    # pad slots repeat the last valid block id
    have = counts > 0
    last = np.zeros(n_blk, np.int32)
    last[ub] = uc.astype(np.int32)  # last write per b wins (uniq is sorted)
    js = np.arange(k, dtype=np.int64)[None, :]
    pad_slots = js >= counts[:, None]
    blk_idx = np.where(pad_slots & have[:, None], last[:, None], blk_idx)

    pos = np.searchsorted(uniq, key)  # per-edge slot in the uniq list
    j_e = pos - offsets[:-1][b]
    t = row - b * tile
    w = j_e * tile + (col - cb * tile)
    mask = np.zeros((n_blk, tile, k * tile), np.int8)
    mask[b, t, w] = 1
    blk_cnt = np.maximum(counts, 1).astype(np.int32)
    return blk_idx, blk_cnt, mask, k_needed


def blocks_needed(edge_index: np.ndarray, n: int, tile: int = BS_TILE) -> int:
    """Max column blocks any row block needs (cheap; no mask built)."""
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
# kernels: grid (B, K), scalar-prefetched indices, per-block skip
# --------------------------------------------------------------------------

def _fwd_kernel(idx_ref, cnt_ref, r_ref, p_ref, x_ref, m_ref, w_ref,
                out_ref, z_acc, *, heads: int, compute_dtype):
    b = pl.program_id(0)
    j = pl.program_id(1)
    nk = pl.num_programs(1)
    c_in = x_ref.shape[-1]

    @pl.when(j == 0)
    def _init():
        z_acc[...] = jnp.zeros_like(z_acc)

    @pl.when(j < cnt_ref[b])
    def _accum():
        r = r_ref[0]  # (T, H)
        pj = p_ref[0]  # (H, T)
        xj = x_ref[0]  # (T, C)
        mf = m_ref[0].astype(jnp.float32)  # (T, T)
        d = jax.lax.dot_general(
            r, pj, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        minv = (mf / jnp.maximum(d, 1e-12)).astype(compute_dtype)
        xpw = _xpw_all(pj, xj, heads, compute_dtype)  # (T, H*C)
        z_acc[...] += jnp.dot(minv, xpw, preferred_element_type=jnp.float32)

    @pl.when(j == nk - 1)
    def _epilogue():
        r = r_ref[0]
        zr = (z_acc[...] * _rwide(r, c_in, heads)).astype(compute_dtype)
        w_flat = w_ref[:].astype(compute_dtype)
        out_ref[0] = jnp.dot(zr, w_flat, preferred_element_type=jnp.float32)


def _bwd_kernel(idx_ref, cnt_ref, r_ref, p_ref, x_ref, m_ref, w_ref,
                gout_ref, rbar_ref, pbar_ref, xbar_ref, wbar_ref,
                z_acc, gy_s, ybar_s, *, heads: int, compute_dtype):
    b = pl.program_id(0)
    j = pl.program_id(1)
    nk = pl.num_programs(1)
    c_in = x_ref.shape[-1]
    r = r_ref[0]
    r_wide = _rwide(r, c_in, heads)

    @pl.when(j == 0)
    def _init():
        z_acc[...] = jnp.zeros_like(z_acc)
        rbar_ref[0] = jnp.zeros_like(rbar_ref[0])
        gy = jnp.dot(
            gout_ref[0].astype(compute_dtype),
            w_ref[:].astype(compute_dtype).T,
            preferred_element_type=jnp.float32,
        )
        gy_s[...] = gy
        ybar_s[...] = gy * r_wide

    live = j < cnt_ref[b]

    @pl.when(live)
    def _per_block():
        pj = p_ref[0]  # (H, T)
        xj = x_ref[0]  # (T, C)
        mf = m_ref[0].astype(jnp.float32)
        d = jax.lax.dot_general(
            r, pj, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dinv = 1.0 / jnp.maximum(d, 1e-12)
        minv = mf * dinv
        minv_c = minv.astype(compute_dtype)
        mdd = jnp.where(d > 1e-12, -minv * dinv, 0.0)

        xpw = _xpw_all(pj, xj, heads, compute_dtype)  # (T, H*C)
        z_acc[...] += jnp.dot(minv_c, xpw, preferred_element_type=jnp.float32)

        ybar = ybar_s[...].astype(compute_dtype)
        a = jax.lax.dot_general(  # minv^T ybar -> (T_col, HC)
            minv_c, ybar, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        xbar = jnp.zeros((xj.shape[0], c_in), jnp.float32)
        pbar_rows = []
        for h in range(heads):
            a_h = a[:, h * c_in : (h + 1) * c_in]
            xbar = xbar + pj[h][:, None] * a_h
            pbar_rows.append((a_h * xj).sum(axis=1)[None, :])
        xbar_ref[0] = xbar

        kd = jax.lax.dot_general(  # ybar xpw^T: denominator path, one dot
            ybar, xpw, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dbar = mdd * kd
        rbar_ref[0] += jax.lax.dot_general(
            dbar, pj, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        pbar_ref[0] = jnp.concatenate(pbar_rows, axis=0) + jax.lax.dot_general(
            r, dbar, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(jnp.logical_not(live))
    def _skipped():  # padded column blocks emit exact zeros (the XLA fold
        # segment-sums them into real blocks, so garbage is not an option)
        xbar_ref[0] = jnp.zeros_like(xbar_ref[0])
        pbar_ref[0] = jnp.zeros_like(pbar_ref[0])

    @pl.when(j == nk - 1)
    def _epilogue():
        gy = gy_s[...]
        z = z_acc[...]
        hc = heads * c_in
        blk_rows = jax.lax.broadcasted_iota(jnp.int32, (hc, heads), 0) // c_in
        blk_cols = jax.lax.broadcasted_iota(jnp.int32, (hc, heads), 1)
        ones_blk = (blk_rows == blk_cols).astype(compute_dtype)
        rbar_ref[0] += jnp.dot(
            (gy * z).astype(compute_dtype), ones_blk,
            preferred_element_type=jnp.float32,
        )
        zr = (z * r_wide).astype(compute_dtype)
        wbar_ref[0] = jax.lax.dot_general(
            zr, gout_ref[0].astype(compute_dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def _in_specs(tile, heads, c_in, c_out, k, with_gout: bool):
    """Input specs AFTER the two scalar-prefetch operands.  Index maps
    receive (b, j, idx_ref, cnt_ref); window operands follow idx[b, j],
    clamped to the last REAL block for skipped steps (no extra fetch)."""
    v = pltpu.VMEM
    own = lambda b, j, idx, cnt: (b, 0, 0)

    def at_blk(b, j, idx, cnt):
        return (idx[b, j], 0, 0)

    def mask_blk(b, j, idx, cnt):  # clamp: skipped steps re-read the last
        # real mask block instead of streaming padded zeros from HBM
        return (b, 0, jnp.minimum(j, cnt[b] - 1))

    ins = [
        pl.BlockSpec((1, tile, heads), own, memory_space=v),  # r
        pl.BlockSpec((1, heads, tile), at_blk, memory_space=v),  # p_j
        pl.BlockSpec((1, tile, c_in), at_blk, memory_space=v),  # x_j
        pl.BlockSpec((1, tile, tile), mask_blk, memory_space=v),  # m_j
        pl.BlockSpec(
            (heads * c_in, c_out), lambda b, j, idx, cnt: (0, 0),
            memory_space=v,
        ),
    ]
    if with_gout:
        ins.append(pl.BlockSpec((1, tile, c_out), own, memory_space=v))
    return ins


# --------------------------------------------------------------------------
# XLA twin (numerator reference for tests; exact same math)
# --------------------------------------------------------------------------

def _xla_numerator(r, p, x, w, m, blk_idx, compute_dtype):
    n_blk, tile, win = m.shape
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

@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def bs_aggregate(r, p, x, w, m, blk_idx, blk_cnt, compute_dtype=jnp.bfloat16):
    """sum_h r_h ⊙ ((M ⊙ p_h / D) @ x_win) @ W_h over block-sparse windows.

    r, p: (N, H); x: (N, C_in); w: (H, C_in, C_out); m: (B, T, K*T) int8;
    blk_idx: (B, K) int32; blk_cnt: (B,) int32 real column-block counts.
    N must be B*T.  Returns (N, C_out) f32."""
    return _call_fwd(r, p, x, w, m, blk_idx, blk_cnt, compute_dtype)


def _shapes_of(m, x, r, w):
    n_blk, tile, win = m.shape
    return n_blk, tile, win, win // tile, x.shape[1], r.shape[1], w.shape[2]


def _call_fwd(r, p, x, w, m, blk_idx, blk_cnt, compute_dtype):
    n_blk, tile, win, k, c_in, heads, c_out = _shapes_of(m, x, r, w)
    n = x.shape[0]
    w_flat = w.reshape(heads * c_in, c_out)
    r_blk = r.reshape(n_blk, tile, heads)
    pt = jnp.moveaxis(p.reshape(n_blk, tile, heads), -1, -2)  # (B, H, T)
    xb = x.reshape(n_blk, tile, c_in)
    flops = int(2 * n * win * (heads * (c_in + 1) + heads * c_out / 3))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blk, k),
        in_specs=_in_specs(tile, heads, c_in, c_out, k, False),
        out_specs=pl.BlockSpec(
            (1, tile, c_out), lambda b, j, idx, cnt: (b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((tile, heads * c_in), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, heads=heads, compute_dtype=compute_dtype
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blk, tile, c_out), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=m.size + (2 * k + 1) * x.size * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(blk_idx, blk_cnt, r_blk, pt, xb, m, w_flat)
    return out.reshape(n, c_out)


def _bs_fwd(r, p, x, w, m, blk_idx, blk_cnt, compute_dtype):
    out = _call_fwd(r, p, x, w, m, blk_idx, blk_cnt, compute_dtype)
    return out, (r, p, x, w, m, blk_idx, blk_cnt)


def _fold_blocks(slabs, blk_idx, n_blk, tile, n):
    """(B, K, T, C)-flattened per-(row-block, j) window cotangents ->
    (N, C): block-granular segment-sum over the column-block ids (padded
    slots carry exact zeros)."""
    c = slabs.shape[-1]
    flat = slabs.reshape(-1, tile, c)  # (B*K, T, C)
    out = jax.ops.segment_sum(
        flat, blk_idx.reshape(-1), num_segments=n_blk
    )  # (B, T, C)
    return out.reshape(n_blk * tile, c)[:n]


def _bs_bwd(compute_dtype, res, gout):
    r, p, x, w, m, blk_idx, blk_cnt = res
    n_blk, tile, win, k, c_in, heads, c_out = _shapes_of(m, x, r, w)
    n = x.shape[0]
    w_flat = w.reshape(heads * c_in, c_out)
    r_blk = r.reshape(n_blk, tile, heads)
    pt = jnp.moveaxis(p.reshape(n_blk, tile, heads), -1, -2)
    xb = x.reshape(n_blk, tile, c_in)
    g_blk = gout.reshape(n_blk, tile, c_out).astype(jnp.float32)

    own_out = lambda b, j, idx, cnt: (b, 0, 0)
    per_j_last = lambda b, j, idx, cnt: (b, 0, j)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blk, k),
        in_specs=_in_specs(tile, heads, c_in, c_out, k, True),
        out_specs=(
            pl.BlockSpec((1, tile, heads), own_out, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, heads, tile), per_j_last, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, c_in),
                         lambda b, j, idx, cnt: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, heads * c_in, c_out), own_out,
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile, heads * c_in), jnp.float32),  # z accumulator
            pltpu.VMEM((tile, heads * c_in), jnp.float32),  # gy
            pltpu.VMEM((tile, heads * c_in), jnp.float32),  # ybar
        ],
    )
    rbar, pbar, xbar, wbar = pl.pallas_call(
        functools.partial(
            _bwd_kernel, heads=heads, compute_dtype=compute_dtype
        ),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_blk, tile, heads), jnp.float32),
            jax.ShapeDtypeStruct((n_blk, heads, win), jnp.float32),
            jax.ShapeDtypeStruct((n_blk, k * tile, c_in), jnp.float32),
            jax.ShapeDtypeStruct((n_blk, heads * c_in, c_out), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(blk_idx, blk_cnt, r_blk, pt, xb, m, w_flat, g_blk)

    dr = rbar.reshape(n, heads)
    dp = _fold_blocks(  # (B, H, K*T) -> (B, K, T, H) slabs
        jnp.transpose(pbar.reshape(n_blk, heads, k, tile), (0, 2, 3, 1)),
        blk_idx, n_blk, tile, n,
    )
    dx = _fold_blocks(xbar, blk_idx, n_blk, tile, n)
    dm = np.zeros(m.shape, jax.dtypes.float0)
    dik = np.zeros(blk_idx.shape, jax.dtypes.float0)
    dcnt = np.zeros(blk_cnt.shape, jax.dtypes.float0)
    dw = wbar.sum(axis=0).reshape(heads, c_in, c_out)
    return dr, dp, dx, dw, dm, dik, dcnt


bs_aggregate.defvjp(_bs_fwd, _bs_bwd)


def feast_conv_blocksparse(
    params, x, m, blk_idx, blk_cnt, deg, *, compute_dtype=jnp.bfloat16
):
    """FeaStConv over block-sparse windows; drop-in for
    ops.banded.feast_conv_banded with (m, blk_idx, blk_cnt) instead of a
    band.  x: (N, C_in) with N = B*T (caller pads); deg: (N,) real
    in-degree."""
    a = x @ params.u
    p = jnp.exp(a - jax.lax.stop_gradient(a.max(axis=1, keepdims=True)))
    ca = params.c - a
    r = jnp.exp(ca - jax.lax.stop_gradient(ca.max(axis=1, keepdims=True)))

    out = bs_aggregate(r, p, x, params.w, m, blk_idx, blk_cnt, compute_dtype)

    s_self = jax.nn.softmax(params.c)
    w_self = jnp.einsum("h,hio->io", s_self, params.w)
    out = out + jnp.dot(x, w_self, preferred_element_type=jnp.float32)
    out = out / (deg + 1.0)[:, None]
    return out + params.b
