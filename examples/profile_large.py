"""Fine-grained component timing of the training step at large-mesh scale.

Where examples/profile_step.py splits the step into fwd/bwd/optimizer and
per-branch U-Nets, this breaks each branch down further — per-level conv
stacks, pooling/unpool gathers, the FC heads, the cross-domain rebuild and
the loss — to locate the 327k-face bottleneck (VERDICT r1 missing #3: the
large-mesh perf cliff).  Sum-of-parts vs the whole step exposes any cost
not attributable to a profiled component.

Probe outputs feed back into the carry as `a + 1e-30 * b`, NOT `a + 0*b`:
XLA's algebraic simplifier folds mul-by-zero to zero and then dead-codes
the entire probed computation (observed: conv rows reading 0.03 ms).

Run: PYTHONPATH=.:/root/.axon_site PROF_SUBDIV=7 PROF_BATCH=1 \
     python examples/profile_large.py
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def main():
    import optax

    from geobignn_tpu.config import Config
    from geobignn_tpu.data.batching import union_batch
    from geobignn_tpu.data.builder import attach_tables, widths_for
    from geobignn_tpu.models import DualGNN
    from geobignn_tpu.models.dual_gnn import FeaStConv, pool_features
    from geobignn_tpu.ops import table as tbl
    from geobignn_tpu.train.profiling import measure_chained
    from geobignn_tpu.train.trainer import _metrics_of
    from geobignn_tpu.utils import enable_compile_cache

    enable_compile_cache()
    subdiv = int(os.environ.get("PROF_SUBDIV", "7"))
    batch = int(os.environ.get("PROF_BATCH", "1"))

    # host-build cache: the subdiv-7 hierarchy build costs minutes; sweeps
    # over kernel variants shouldn't repay it (band attachment is NOT
    # cached — it depends on GBN_BS_TILE/GBN_FORCE_BS).  Shared with
    # bench.py: repo-local, version+config-keyed (ADVICE r2: /tmp pickles).
    from bench import _host_build

    bv, bf, meta, single = _host_build(subdiv, tables_only=False)
    widths = widths_for(bv, bf, meta["fv_indices"], with_bands=True)
    sample = jax.device_put(
        attach_tables(union_batch([single] * batch), widths)
    )
    for tag, br in (("v", sample.v), ("f", sample.f)):
        for i, lvl in enumerate(br.levels):
            kind = (
                "blocksparse" if lvl.blk_idx is not None
                else "banded" if lvl.band is not None
                else "table" if lvl.nbr is not None else "coo"
            )
            extra = ""
            if lvl.band is not None:
                b, t, w = lvl.band.shape
                extra = f" band=({b},{t},{w}) {lvl.band.size / 1e6:.0f}MB"
            print(f"  {tag} L{i + 1}: n={lvl.node_mask.shape[0]} {kind}{extra}")

    cfg = Config(granularity=256)
    model = DualGNN()
    params = model.init(jax.random.PRNGKey(0), single)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def loss_fn(p, smp):
        vert_p, norm_p = model.apply(p, smp)
        return _metrics_of(vert_p, norm_p, smp, cfg)

    def chain(body, init, *data):
        @jax.jit
        def f(k, *d):
            def step(_, c):
                return body(c, *d)

            out = jax.lax.fori_loop(0, k, step, init)
            # sink EVERY carry leaf: XLA's while-loop tuple simplifier
            # dead-codes carry components that don't reach the return
            # value (observed: returning only leaf 0 — a bias whose grad
            # is a mask-sum constant — collapsed whole conv probes to 0 ms)
            return sum(
                l.ravel()[:1].astype(jnp.float32).sum()
                for l in jax.tree.leaves(out)
            ).reshape(1)

        return lambda k: f(k, *data)

    rows = []

    def timeit(name, body, init, *data):
        dt = measure_chained(chain(body, init, *data), k_small=1, k_large=3)
        rows.append((name, dt))
        print(f"{name:38s} {dt * 1e3:9.2f} ms", flush=True)

    # ---- whole step ----
    def full(c, smp):
        p, o = c
        (_, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, smp)
        u, o = tx.update(grads, o, p)
        return jax.tree.map(lambda a, b: a + b, p, u), o

    timeit("full step (fwd+bwd+adam)", full, (params, opt_state), sample)

    def fwd(c, smp):
        l, _ = loss_fn(c[0], smp)
        return (jax.tree.map(lambda a: a + l * 0, c[0]),)

    timeit("forward + loss", fwd, (params,), sample)

    # ---- per-level conv stacks (fwd+bwd wrt params AND x) ----
    # channel plan per GNNModule level (dual_gnn.py):
    #   L1: (x_dim->32), (64->32), (64->32);  L2: (32->64), (128->64) x2;
    #   L3: (64->128), (128->128)
    conv_plan = {1: [(None, 32), (64, 32), (64, 32)],
                 2: [(32, 64), (128, 64), (128, 64)],
                 3: [(64, 128), (128, 128)]}
    for tag, br, xdim in (("v", sample.v, 6), ("f", sample.f, 12)):
        for li in (1, 2, 3):
            lvl = br.levels[li - 1]
            n = lvl.node_mask.shape[0]
            convs = []
            for c_in, c_out in conv_plan[li]:
                ci = xdim if c_in is None else c_in
                m = FeaStConv(c_out)
                x0 = jnp.zeros((n, ci), jnp.float32)
                p0 = m.init(jax.random.PRNGKey(li), x0, lvl)
                convs.append((m, p0, ci))

            def stack(c, lvl_):
                (ps,) = c
                gs = []
                for (m, _, ci), p_ in zip(convs, ps):
                    x0 = jnp.ones((n, ci), jnp.float32)
                    g = jax.grad(
                        lambda q, x_: m.apply(q, x_, lvl_).sum(), argnums=(0, 1)
                    )(p_, x0)[0]
                    gs.append(jax.tree.map(lambda a, b: a + 1e-30 * b, p_, g))
                return (tuple(gs),)

            timeit(
                f"{tag} L{li} convs x{len(convs)} fwd+bwd",
                stack, ((tuple(p for _, p, _ in convs)),), lvl,
            )

    # ---- pooling + unpool (fwd+bwd wrt x) ----
    for tag, br in (("v", sample.v), ("f", sample.f)):
        n1 = br.levels[0].node_mask.shape[0]
        n2 = br.levels[1].node_mask.shape[0]
        n3 = br.levels[2].node_mask.shape[0]

        def pools(c, br_):
            (x1,) = c
            x2 = pool_features(x1, br_.steps[0:2])
            x2b = jnp.pad(x2, ((0, 0), (0, 32)))  # 64ch at L2
            x3 = pool_features(x2b, br_.steps[2:4])
            g = jax.grad(lambda a: pool_features(
                a, br_.steps[0:2]).sum() + 1e-30 * x3.sum())(x1)
            return (x1 + 1e-30 * g,)

        timeit(f"{tag} pool x4 fwd+bwd", pools, (jnp.ones((n1, 32)),), br)

        def unpools(c, br_):
            (x3,) = c
            u2 = tbl.gather_unpool(x3, br_.unpool2, br_.unpool2_rev) \
                if br_.unpool2_rev is not None else x3[br_.unpool2]

            def f(a):
                u2_ = tbl.gather_unpool(a, br_.unpool2, br_.unpool2_rev) \
                    if br_.unpool2_rev is not None else a[br_.unpool2]
                u2_ = jnp.pad(u2_, ((0, 0), (0, 0)))
                u1 = tbl.gather_unpool(
                    u2_[:, :64], br_.unpool1, br_.unpool1_rev
                ) if br_.unpool1_rev is not None else u2_[:, :64][br_.unpool1]
                return u1.sum() + u2_.sum()

            g = jax.grad(f)(x3)
            return (x3 + 1e-30 * g,)

        timeit(f"{tag} unpool x2 fwd+bwd", unpools, (jnp.ones((n3, 128)),), br)

    # ---- FC heads ----
    from flax import linen as nn

    for tag, n in (("v", sample.v.levels[0].node_mask.shape[0]),
                   ("f", sample.f.levels[0].node_mask.shape[0])):
        fc1 = nn.Dense(1024)
        x0 = jnp.zeros((n, 32), jnp.float32)
        pfc = fc1.init(jax.random.PRNGKey(2), x0)

        def fc(c):
            (p_,) = c
            g = jax.grad(
                lambda q: nn.leaky_relu(
                    fc1.apply(q, jnp.ones((n, 32))), 0.2).sum()
            )(p_)
            return (jax.tree.map(lambda a, b: a + 1e-30 * b, p_, g),)

        timeit(f"{tag} fc 32->1024 fwd+bwd", fc, (pfc,))

    # ---- cross-domain rebuild + loss ----
    from geobignn_tpu import geometry

    def rebuild(c, smp):
        (vp,) = c

        def f(v):
            corners = tbl.table_gather(v, smp.fv_indices, smp.fv_rev) \
                if smp.fv_rev is not None else v[smp.fv_indices]
            cent = corners.mean(axis=1)
            nrm = geometry.safe_normalize(
                jnp.cross(corners[:, 1] - corners[:, 0],
                          corners[:, 2] - corners[:, 0]))
            return cent.sum() + nrm.sum()

        g = jax.grad(f)(vp)
        return (vp + 1e-30 * g,)

    nv = sample.v.levels[0].node_mask.shape[0]
    timeit("cross-domain rebuild fwd+bwd", rebuild,
           (jnp.ones((nv, 3)),), sample)

    def loss_only(c, smp):
        (vp, np_) = c
        g = jax.grad(
            lambda a, b: _metrics_of(a, b, smp, cfg)[0], argnums=(0, 1)
        )(vp, np_)
        return (vp + 1e-30 * g[0], np_ + 1e-30 * g[1])

    nf = sample.f.levels[0].node_mask.shape[0]
    timeit("loss fwd+bwd", loss_only,
           (jnp.ones((nv, 3)), jnp.ones((nf, 3))), sample)

    print()
    full_ms = rows[0][1] * 1e3
    acct = sum(dt for name, dt in rows[2:]) * 1e3
    for name, dt in rows[1:]:
        print(f"{name:38s} {dt * 1e3 / full_ms * 100:6.1f}% of step")
    print(f"{'sum of parts (excl. fwd row)':38s} {acct / full_ms * 100:6.1f}%")


if __name__ == "__main__":
    main()
