"""Locate the dynamic-pooling 110x overhead (VERDICT r4 next #5).

Times the pieces of DualGNNDynamic's forward on the bench sample
(20480 faces, batch 1): the in-forward Luby matching, the in-graph
coalesce, the full-padded-size COO coarse convs, and the full dynamic
train step — so the 837 ms measured in examples/bench_dynamic.py can be
attributed and attacked.

Run: PYTHONPATH=/root/repo:/root/.axon_site python examples/probe_dynamic.py
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def main():
    from bench import _host_build
    from geobignn_tpu.data.builder import attach_tables, widths_for
    from geobignn_tpu.models.dual_gnn import FeaStConv
    from geobignn_tpu.ops import matching
    from geobignn_tpu.ops.coalesce import coalesce_edges
    from geobignn_tpu.structs import GraphLevel
    from geobignn_tpu.train.profiling import measure_chained
    from geobignn_tpu.utils import enable_compile_cache

    enable_compile_cache()
    bv, bf, meta, single = _host_build(5, tables_only=False)
    widths = widths_for(bv, bf, meta["fv_indices"], with_bands=True)
    sample = jax.device_put(attach_tables(single, widths))

    # facet level-1 graph: the biggest dynamic workload (n_pad ~ 20k)
    lvl = sample.f.levels[0]
    ei = jnp.asarray(lvl.edge_index)
    n_pad = int(lvl.node_mask.shape[0])
    e = ei.shape[1]
    w = jnp.abs(jnp.asarray(lvl.edge_weight)) + 0.1
    rng = jax.random.PRNGKey(0)
    x32 = jax.random.normal(rng, (n_pad, 32), jnp.float32)
    print(f"f L1: n_pad={n_pad} e={e}")

    rows = []

    def timeit(name, fn):
        # chain k applications; the carried scalar folds a piece of every
        # output back in at 1e-30 scale so XLA cannot dead-code the body
        # (see examples/profile_large.py: 0*x folds to zero)
        @jax.jit
        def run(k, seed):
            def body(_, c):
                out = fn(c[0])
                o = out if isinstance(out, tuple) else (out,)
                s = sum(jnp.sum(jnp.abs(t[..., :1].astype(jnp.float32)))
                        for t in o)
                return (c[0] + 1e-30 * s,)

            return jax.lax.fori_loop(0, k, body, (seed,))[0]

        dt = measure_chained(lambda k: run(k, jnp.float32(0.0)),
                             k_small=1, k_large=5)
        rows.append((name, dt))
        print(f"{name:44s} {dt * 1e3:9.2f} ms", flush=True)

    # one Luby matching application (8 rounds, the module default); the
    # seed perturbation keeps the body loop-variant (no LICM hoisting)
    timeit("parallel_matching (8 rounds)", lambda s:
           matching.parallel_matching(ei, w + 1e-30 * s, n_pad, 8))
    timeit("parallel_matching (4 rounds)", lambda s:
           matching.parallel_matching(ei, w + 1e-30 * s, n_pad, 4))
    timeit("parallel_matching (2 rounds)", lambda s:
           matching.parallel_matching(ei, w + 1e-30 * s, n_pad, 2))

    rep = matching.parallel_matching(ei, w, n_pad, 8)
    rei = rep[ei]
    timeit("coalesce_edges (one application)", lambda s:
           coalesce_edges(rei, w + 1e-30 * s, n_pad))
    timeit("pool_with_rep (segment_max)", lambda s:
           matching.pool_with_rep(x32 + 1e-30 * s, rep, "max"))

    # one coarse conv at FULL padded size, COO unsorted (the dynamic mode's
    # formulation) vs the same conv via the static level's fast path
    cei, cw = coalesce_edges(rei, w, n_pad)
    real = cei[0] != cei[1]
    from geobignn_tpu.ops import segment

    deg = segment.segment_count(
        jnp.where(real, cei[0], n_pad - 1), n_pad)
    glvl = GraphLevel(edge_index=cei, edge_weight=cw, deg=deg,
                      node_mask=jnp.ones(n_pad))
    conv = FeaStConv(64, 9, rows_sorted=False)
    p = conv.init(jax.random.PRNGKey(1), x32, glvl)

    def conv_fwd_bwd(s):
        g = jax.grad(
            lambda q: conv.apply(q, x32 + 1e-30 * s, glvl).sum())(p)
        return jax.tree.leaves(g)[0]

    timeit("coarse conv 32->64 COO@n_pad fwd+bwd", conv_fwd_bwd)


if __name__ == "__main__":
    main()
