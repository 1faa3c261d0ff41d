"""Banded-conv microbenchmark: production kernel fwd/bwd at a given shape.

History (round 3): the original probe compared ablated variants of the
level-1 banded forward and located the bottleneck — NOT the MXU matmuls
(half-width z: -15%, f32 compute: free) but the lane-direction broadcasts
building the head-flattened window operand (xpw).  The production kernels
now use the fully transposed layout (ops/banded_pallas.py docstring);
measured 4.49 ms -> 1.37 ms forward on the bench facet-L1 shape.

This probe times the CURRENT production banded_aggregate (fwd and
fwd+bwd) at a configurable shape so kernel regressions show up as numbers:

  PYTHONPATH=/root/repo:/root/.axon_site python examples/kernel_probe.py
  PROBE_N=165888 PROBE_TILE=384 PROBE_CIN=64 PROBE_COUT=32 ...
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

    n = int(os.environ.get("PROBE_N", "165888"))
    tile = int(os.environ.get("PROBE_TILE", "384"))
    c_in = int(os.environ.get("PROBE_CIN", "64"))
    c_out = int(os.environ.get("PROBE_COUT", "32"))
    heads = int(os.environ.get("PROBE_HEADS", "9"))
    deg = 12
    rng = np.random.default_rng(0)

    n_blk = n // tile
    win = 3 * tile
    m = (rng.random((n_blk, tile, win)) < deg / win).astype(np.int8)

    r = jnp.asarray(rng.normal(size=(n, heads)), jnp.float32)
    p = jnp.asarray(rng.normal(size=(n, heads)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(n, c_in)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(heads, c_in, c_out)) * 0.1, jnp.float32)
    m_j = jnp.asarray(m)

    @jax.jit
    def fwd_chain(k):
        def body(_, rr):
            out = bp.banded_aggregate(rr, p, x, w, m_j)
            # feed output back so the chain cannot be hoisted
            return rr + 1e-20 * out[:, :1]

        return jax.lax.fori_loop(0, k, body, r)[0, 0]

    @jax.jit
    def bwd_chain(k):
        def body(_, rr):
            g = jax.grad(
                lambda rr_, p_, x_, w_: bp.banded_aggregate(
                    rr_, p_, x_, w_, m_j
                ).sum(),
                argnums=(0, 1, 2, 3),
            )(rr, p, x, w)
            return rr + 1e-20 * g[0]

        return jax.lax.fori_loop(0, k, body, r)[0, 0]

    peak = 197e12
    z_flops = 2 * n * win * heads * c_in
    d_flops = 2 * n * win * heads
    t_flops = 2 * n * heads * c_in * c_out
    tot = z_flops + d_flops + t_flops
    print(f"shape: N={n} tile={tile} C {c_in}->{c_out} H{heads} "
          f"(exec fwd {tot / 1e9:.1f} GF)")
    dt_f = measure_chained(fwd_chain, 1, 11)
    print(f"fwd      {dt_f * 1e3:8.3f} ms   exec-MFU {100 * tot / (dt_f * peak):5.1f}%",
          flush=True)
    dt_b = measure_chained(bwd_chain, 1, 6)
    print(f"fwd+bwd  {dt_b * 1e3:8.3f} ms   exec-MFU "
          f"{100 * 3 * tot / (dt_b * peak):5.1f}%  (bwd ~2x fwd matmuls)",
          flush=True)


if __name__ == "__main__":
    main()
