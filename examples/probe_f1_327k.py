"""Facet-L1 conv formulation shoot-out at 327k faces (the large-mesh
bottleneck, VERDICT r3 next #3).

Times the REAL f-L1 conv (C_in=64 -> C_out=32, 9 heads) fwd and fwd+bwd
on the icosphere-7 facet graph under:

  bs256      global-RCM order, block-sparse windows at T=256 (r3 shipped)
  hyb384/256 slab-RCM order, band+boundary-table hybrid
  hyb*_nb    same hybrid band, boundary correction REMOVED (isolates the
             table-correction cost from the band cost)

Run: PYTHONPATH=/root/repo:/root/.axon_site python examples/probe_f1_327k.py
Selector: PROBE_CONFIGS=bs256,hyb384 (default: all)
"""

from __future__ import annotations

import os
import pickle

import numpy as np

import jax
import jax.numpy as jnp


def _host_structs():
    """Cached host build of every config's structures (minutes at 327k)."""
    from geobignn_tpu import graphs
    from geobignn_tpu.data import synth
    from geobignn_tpu.ops import banded, blocksparse
    from geobignn_tpu.structs import round_up

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "processed_cache", "probe_f1_v3.pkl")
    if os.path.exists(cache):
        with open(cache, "rb") as fh:
            return pickle.load(fh)

    m = synth.add_noise(synth.icosphere(7), 0.2, seed=0)
    ei = graphs.build_facet_graph(m.fv_indices, m.vf_indices)
    n = m.n_faces
    out = {}

    # global RCM + blocksparse T=256
    perm = banded.rcm_order(ei.astype(np.int64), n)
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    ei_g = inv[ei.astype(np.int64)].astype(np.int32)
    bt = 256
    n_pad = round_up(n + 1, bt)
    blk_idx, mask, k = blocksparse.block_sparse_np(ei_g, n_pad, bt)
    deg = np.zeros(n_pad, np.float32)
    np.add.at(deg, ei_g[0], 1.0)
    out["bs256"] = dict(kind="bs", mask=mask, blk_idx=blk_idx, deg=deg,
                        n_pad=n_pad, note=f"K={k}")

    # slab order + hybrid at two tiles
    perm_s, bw_i = banded.order_for_band(ei, n)
    inv_s = np.empty(n, np.int64)
    inv_s[perm_s] = np.arange(n)
    ei_s = inv_s[ei.astype(np.int64)].astype(np.int32)
    for tile in (256, 384):
        t, mb, kb, rb, sb = banded.hybrid_widths(ei_s, n, tile=tile)
        n_pad = round_up(n + 1, tile)
        _, mb2, kb2, rb2, sb2 = banded.hybrid_widths(ei_s, n_pad, tile=tile)
        arrs = banded.hybrid_arrays_np(ei_s, n_pad, tile, max(mb, mb2),
                                       max(kb, kb2), max(rb, rb2),
                                       max(sb, sb2))
        deg = np.zeros(n_pad, np.float32)
        np.add.at(deg, ei_s[0], 1.0)
        out[f"hyb{tile}"] = dict(
            kind="hyb", deg=deg, n_pad=n_pad, tile=tile,
            note=f"intra_bw={bw_i} mb={max(mb, mb2)} kb={max(kb, kb2)}",
            **arrs,
        )
    with open(cache, "wb") as fh:
        pickle.dump(out, fh)
    return out


def main():
    from geobignn_tpu.ops import banded_pallas as bp
    from geobignn_tpu.ops import blocksparse
    from geobignn_tpu.ops.feastconv import init_feast_params
    from geobignn_tpu.train.profiling import measure_chained
    from geobignn_tpu.utils import enable_compile_cache

    enable_compile_cache()
    structs = _host_structs()
    sel = os.environ.get("PROBE_CONFIGS")
    names = sel.split(",") if sel else None

    c_in, c_out, heads = 64, 32, 9
    params = init_feast_params(jax.random.PRNGKey(0), c_in, c_out, heads)
    rng = np.random.default_rng(1)

    def run(name, s, skip_boundary=False):
        n_pad = s["n_pad"]
        x0 = jnp.asarray(rng.normal(size=(n_pad, c_in)) * 0.1, jnp.float32)

        # arrays travel as jit ARGUMENTS — a closure would bake them into
        # the program as constants (1 GB upload -> remote-compile HTTP 413)
        if s["kind"] == "bs":
            arrs = tuple(jnp.asarray(s[k]) for k in ("mask", "blk_idx", "deg"))

            def conv(x, a):
                return blocksparse.feast_conv_blocksparse(
                    params, x, a[0], a[1], a[2])
        elif skip_boundary:
            arrs = tuple(jnp.asarray(s[k]) for k in ("m", "deg"))

            def conv(x, a):
                return bp.feast_conv_banded_pallas(params, x, a[0], a[1])
        else:
            arrs = tuple(jnp.asarray(s[k]) for k in
                         ("m", "rows_b", "nbr_b", "kmask_b", "src_b",
                          "rev_b", "deg"))

            def conv(x, a):
                return bp.feast_conv_hybrid(params, x, *a)

        @jax.jit
        def fwd_k(x, a, k):
            def body(_, xc):
                out = conv(xc, a)
                return xc.at[:, :c_out].add(out * 1e-3)

            return jax.lax.fori_loop(0, k, body, x)

        @jax.jit
        def fb_k(x, a, k):
            def loss(xc):
                return (conv(xc, a) ** 2).sum()

            def body(_, xc):
                g = jax.grad(loss)(xc)
                return xc - 1e-6 * g

            return jax.lax.fori_loop(0, k, body, x)

        t_f = measure_chained(lambda k: fwd_k(x0, arrs, k), 1, 5) * 1e3
        t_fb = measure_chained(lambda k: fb_k(x0, arrs, k), 1, 5) * 1e3
        tag = name + ("_nb" if skip_boundary else "")
        print(f"{tag:10s} fwd {t_f:8.2f} ms   fwd+bwd {t_fb:8.2f} ms   "
              f"({s.get('note', '')})", flush=True)

    for name, s in structs.items():
        if names and name not in names:
            continue
        run(name, s)
        if s["kind"] == "hyb":
            run(name, s, skip_boundary=True)


if __name__ == "__main__":
    main()
