"""Locate the in-branch serialization gap at 327k faces.

profile_large.py (fixed probes) measures each conv STACK as 3 independent
convs — XLA overlaps them — while the real U-Net chains them (x2 = f(x1)).
The branch bisect (profile_step.py) shows the branches cost ~70 ms more
than the sum of their overlapped parts.  This probe quantifies:

  indep3   3 independent convs, fwd (+bwd)   [what profile_large measured]
  chain3   x -> conv -> conv -> conv         [what the model pays]
  xpose    _pad_blocks_T + un-moveaxis only  [the per-conv layout cost]

Run: PYTHONPATH=/root/repo:/root/.axon_site python examples/probe_serial.py
Env: PROBE_N (164352), PROBE_TILE (768), PROBE_C (64), PROBE_HEADS (9)
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from geobignn_tpu.ops import banded_pallas as bp
    from geobignn_tpu.train.profiling import measure_chained
    from geobignn_tpu.utils import enable_compile_cache

    enable_compile_cache()

    n = int(os.environ.get("PROBE_N", "164352"))
    tile = int(os.environ.get("PROBE_TILE", "768"))
    c = int(os.environ.get("PROBE_C", "64"))
    heads = int(os.environ.get("PROBE_HEADS", "9"))
    deg = 6
    rng = np.random.default_rng(0)

    n_blk = n // tile
    win = 3 * tile
    m = (rng.random((n_blk, tile, win)) < deg / win).astype(np.int8)
    m_j = jnp.asarray(m)

    x = jnp.asarray(rng.normal(size=(n, c)), jnp.float32)
    ws = [jnp.asarray(rng.normal(size=(heads, c, c)) * 0.1, jnp.float32)
          for _ in range(3)]
    us = [jnp.asarray(rng.normal(size=(c, heads)) * 0.1, jnp.float32)
          for _ in range(3)]

    def one_conv(x_, u, w, m_):
        a = x_ @ u
        p = jnp.exp(a - jax.lax.stop_gradient(a.max(axis=1, keepdims=True)))
        r = jnp.exp(-a - jax.lax.stop_gradient((-a).max(axis=1, keepdims=True)))
        return bp.banded_aggregate(r, p, x_, w, m_)

    # the mask rides as an explicit jit ARGUMENT: a 379 MB closure constant
    # gets serialized into the remote-compile request (tunnel HTTP 413)
    @jax.jit
    def indep3(k, x0, m_):
        def body(_, x_):
            outs = [one_conv(x_, u, w, m_) for u, w in zip(us, ws)]
            return x_ + 1e-30 * sum(o[:, :c] for o in outs)

        return jax.lax.fori_loop(0, k, body, x0)[0, 0]

    @jax.jit
    def chain3(k, x0, m_):
        def body(_, x_):
            y = x_
            for u, w in zip(us, ws):
                y = one_conv(y, u, w, m_)[:, :c]
            return x_ + 1e-30 * y

        return jax.lax.fori_loop(0, k, body, x0)[0, 0]

    @jax.jit
    def indep3_bwd(k, x0, m_):
        def body(_, x_):
            g = jax.grad(lambda xx: sum(
                one_conv(xx, u, w, m_).sum() for u, w in zip(us, ws)))(x_)
            return x_ + 1e-30 * g

        return jax.lax.fori_loop(0, k, body, x0)[0, 0]

    @jax.jit
    def chain3_bwd(k, x0, m_):
        def body(_, x_):
            def f(xx):
                y = xx
                for u, w in zip(us, ws):
                    y = one_conv(y, u, w, m_)[:, :c]
                return y.sum()

            return x_ + 1e-30 * jax.grad(f)(x_)

        return jax.lax.fori_loop(0, k, body, x0)[0, 0]

    @jax.jit
    def xpose(k, x0, m_):
        del m_

        def body(_, x_):
            xt = bp._pad_blocks_T(x_, tile)  # (B+2, C, T)
            back = jnp.moveaxis(xt[1:-1], -1, -2).reshape(n, c)
            return x_ + 1e-30 * back

        return jax.lax.fori_loop(0, k, body, x0)[0, 0]

    x = jax.device_put(x)
    m_j = jax.device_put(m_j)
    for name, fn, kk in (("xpose roundtrip", xpose, (2, 12)),
                         ("indep3 fwd", indep3, (1, 5)),
                         ("chain3 fwd", chain3, (1, 5)),
                         ("indep3 fwd+bwd", indep3_bwd, (1, 4)),
                         ("chain3 fwd+bwd", chain3_bwd, (1, 4))):
        dt = measure_chained(lambda k: fn(k, x, m_j), *kk)
        print(f"{name:20s} {dt * 1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
