"""Locate where banded-conv time goes: D matmul, mask traffic, z matmul.

VERDICT r2 weak #1: useful MFU 1.3% — >93% of executed MXU FLOPs are
masked window waste.  Before redesigning, measure the per-part cost of the
level-1 banded kernel at bench scale by compiling VARIANTS of the forward
kernel with parts disabled:

  full      the shipped _fwd_kernel
  no_d      denominator fixed to 1 (skips the (T,H)@(H,W) D matmul — MXU
            contraction depth 9, ~7% tile efficiency, suspected hidden cost)
  no_mask   mf=1 (skips the int8 (T, W) mask load: HBM + VPU convert)
  no_z      out = zr @ W only on x_win center block (window matmul removed)

Run: PYTHONPATH=/root/repo:/root/.axon_site python examples/kernel_probe.py
"""

from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def main():
    from geobignn_tpu.ops import banded
    from geobignn_tpu.ops.banded_pallas import (
        _common,
        _interpret,
        _pad_blocks,
        _rwide,
        _specs,
        _xpw_all,
    )
    from geobignn_tpu.train.profiling import measure_chained
    from geobignn_tpu.utils import enable_compile_cache

    enable_compile_cache()

    # f-branch L1 at bench scale: N=165888 padded, tile 384, C 64->32
    n = int(os.environ.get("PROBE_N", str(165888)))
    tile = int(os.environ.get("PROBE_TILE", "384"))
    c_in = int(os.environ.get("PROBE_CIN", "64"))
    c_out = int(os.environ.get("PROBE_COUT", "32"))
    heads = 9
    rng = np.random.default_rng(0)

    # synthetic band mask with realistic density (~12 neighbors/row)
    n_blk = n // tile
    win = 3 * tile
    deg = 12
    m = np.zeros((n_blk, tile, win), np.int8)
    cols = rng.integers(0, win, size=(n_blk, tile, deg))
    for b in range(n_blk):
        for t in range(tile):
            m[b, t, cols[b, t]] = 1

    r = jnp.asarray(rng.normal(size=(n, heads)), jnp.float32)
    p = jnp.asarray(rng.normal(size=(n, heads)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(n, c_in)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(heads, c_in, c_out)) * 0.1, jnp.float32)
    m_j = jnp.asarray(m)

    compute_dtype = jnp.bfloat16

    def make_kernel(variant):
        def kern(r_ref, pt0, pt1, pt2, x0, x1, x2, m_ref, w_ref, out_ref):
            r_, pw, xw, mf, d = _common(
                r_ref, (pt0, pt1, pt2), (x0, x1, x2), m_ref
            )
            if variant == "no_d":
                d = jnp.ones_like(d)
            if variant == "no_mask":
                mf = jnp.ones_like(mf)
            minv = (mf / jnp.maximum(d, 1e-12)).astype(compute_dtype)
            ci = xw.shape[1]
            if variant == "no_z":
                z = jnp.broadcast_to(
                    x1[0].astype(jnp.float32), (tile, ci)
                )
                z = jnp.concatenate([z] * heads, axis=1)
            else:
                xpw = _xpw_all(pw, xw, heads, compute_dtype)
                z = jnp.dot(minv, xpw, preferred_element_type=jnp.float32)
            zr = (z * _rwide(r_, ci, heads)).astype(compute_dtype)
            w_flat = w_ref[:].astype(compute_dtype)
            out_ref[0] = jnp.dot(zr, w_flat, preferred_element_type=jnp.float32)

        return kern

    def run_variant(variant):
        r_blk = r.reshape(n_blk, tile, heads)
        pt = jnp.moveaxis(_pad_blocks(p, tile), -1, -2)
        xb = _pad_blocks(x, tile)
        w_flat = w.reshape(heads * c_in, c_out)

        def once(rr, pp, xx, ww):
            return pl.pallas_call(
                make_kernel(variant),
                grid=(n_blk,),
                in_specs=_specs(n_blk, tile, heads, c_in, c_out, False),
                out_specs=pl.BlockSpec(
                    (1, tile, c_out), lambda b: (b, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                out_shape=jax.ShapeDtypeStruct((n_blk, tile, c_out), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=64 * 1024 * 1024,
                ),
                interpret=_interpret(),
            )(rr, pt, pt, pt, xb, xb, xb, m_j, ww)

        @jax.jit
        def chain(k):
            def body(_, carry):
                rr, acc = carry
                out = once(rr, pt, xb, w_flat)
                return rr, acc + out[0, 0, 0]

            return jax.lax.fori_loop(0, k, body, (r_blk, jnp.float32(0.0)))[1]

        dt = measure_chained(chain, k_small=1, k_large=11)
        return dt

    peak = 197e12
    z_flops = 2 * n * win * heads * c_in
    d_flops = 2 * n * win * heads
    t_flops = 2 * n * heads * c_in * c_out
    print(f"shape: N={n} tile={tile} C {c_in}->{c_out} H{heads} "
          f"(z {z_flops/1e9:.1f} GF, D {d_flops/1e9:.1f} GF, "
          f"transform {t_flops/1e9:.1f} GF)")
    results = {}
    for variant in ("full", "no_d", "no_mask", "no_z"):
        dt = run_variant(variant)
        results[variant] = dt
        print(f"{variant:8s} {dt*1e3:8.3f} ms   "
              f"exec-MFU {100*(z_flops+d_flops+t_flops)/(dt*peak):5.1f}%",
              flush=True)
    print(f"\nD part:    {(results['full']-results['no_d'])*1e3:7.3f} ms")
    print(f"mask part: {(results['full']-results['no_mask'])*1e3:7.3f} ms")
    print(f"z part:    {(results['full']-results['no_z'])*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
