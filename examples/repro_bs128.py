"""Single-op repro: block-sparse aggregate at T=128 on the 327k facet L1.

The full-step sweep config bs128 (GBN_BS_TILE=128 GBN_FORCE_BS=1) failed
to compile at subdiv 7 while T=256 runs; this isolates the first fL1 conv
to capture the Mosaic/XLA error (run on TPU; seconds once the host cache
exists).  Usage: PYTHONPATH=/root/repo:/root/.axon_site python
examples/repro_bs128.py [tile]
"""

import pickle
import sys

import numpy as np

import jax
import jax.numpy as jnp


def main():
    tile = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    from geobignn_tpu.ops import blocksparse
    from geobignn_tpu.ops.feastconv import init_feast_params
    from geobignn_tpu.structs import round_up
    from geobignn_tpu.utils import enable_compile_cache

    enable_compile_cache()
    from bench import _host_build  # repo-local version-keyed host cache

    bv, bf, meta, single = _host_build(7, tables_only=False)
    ei = bf.edge_index
    n = bf.n_nodes
    n_pad = round_up(n + 1, tile)
    trash = n_pad - 1
    ei_pad = np.full((2, ei.shape[1] + 8), trash, np.int32)
    ei_pad[:, : ei.shape[1]] = ei
    blk_idx, mask, k = blocksparse.block_sparse_np(ei_pad, n_pad, tile)
    print(f"tile={tile} n_pad={n_pad} blocks={mask.shape[0]} K={k} "
          f"mask={mask.size / 1e6:.0f}MB")
    c_in, c_out, heads = 64, 32, 9
    params = init_feast_params(jax.random.PRNGKey(0), c_in, c_out, heads)
    x = jnp.ones((n_pad, c_in), jnp.float32)
    deg = jnp.ones((n_pad,), jnp.float32) * 12

    f = jax.jit(lambda p, x_: blocksparse.feast_conv_blocksparse(
        p, x_, jnp.asarray(mask), jnp.asarray(blk_idx), deg))
    out = f(params, x)
    print("fwd ok", float(jnp.abs(out).sum()))
    g = jax.jit(jax.grad(lambda p, x_: blocksparse.feast_conv_blocksparse(
        p, x_, jnp.asarray(mask), jnp.asarray(blk_idx), deg).sum(),
        argnums=(0, 1)))
    gp, gx = g(params, x)
    print("bwd ok", float(jnp.abs(gx).sum()))


if __name__ == "__main__":
    main()
