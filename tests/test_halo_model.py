"""Halo-sharded full U-Net == single-device GNNModule (exact parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from geobignn_tpu import graphs, structs
from geobignn_tpu.data import synth
from geobignn_tpu.data.builder import _pad_branch, RawBranch
from geobignn_tpu.models.dual_gnn import GNNModule
from geobignn_tpu.parallel import halo_model as hm
from geobignn_tpu.parallel import partition as hp
from geobignn_tpu.parallel.api import make_mesh
from geobignn_tpu.pool.hierarchy import build_hierarchy


def test_halo_unet_matches_single_device():
    n_parts = 4
    m = synth.add_noise(synth.icosphere(3), 0.2, seed=0)  # 642 verts
    n = m.n_vertices
    ei = graphs.build_vertex_graph_1ring(m.ev_indices, n)
    _, w = graphs.weighted_graph(ei, n, m.points, np.ones_like(m.points))
    x = np.random.default_rng(0).normal(size=(n, 6)).astype(np.float32)

    owner = hp.partition_nodes(ei, n, n_parts, seed=1)
    specs = build_hierarchy(ei, w, x, n, owner=owner)

    # ---- single-device reference over the SAME (owner-constrained) specs
    raw = RawBranch(x=x, y=None, edge_index=ei, edge_weight=w,
                    specs=specs, n_nodes=n)
    plan = structs.BranchSizes.plan(raw.counts(), 32)
    branch = _pad_branch(raw, plan)
    model = GNNModule()
    params = model.init(jax.random.PRNGKey(0), branch, jnp.asarray(branch.x))
    ref = model.apply(params, branch, jnp.asarray(branch.x))

    # ---- halo-sharded version consuming the same parameter pytree
    hb = hm.build_halo_branch(ei, w, n, specs, owner)
    d = hm.branch_device_arrays(hb)
    x_loc = hp.shard_features(x, hb.levels[0])

    # unwrap linen param tree: params['params'][name][leaf]
    p_flat = {k: {lk: np.asarray(lv) for lk, lv in v.items()}
              for k, v in params["params"].items()}

    mesh = make_mesh(1, n_parts)
    specs_in = (
        P(),
        P("gp"),
        jax.tree.map(lambda _: P("gp"), d),
    )

    def fn(p, x_l, d_l):
        sliced = jax.tree.map(lambda a: a[0], d_l)
        out = hm.halo_gnn_module(p, x_l[0], sliced, axis="gp")
        return out[None]

    sharded = jax.jit(
        jax.shard_map(fn, mesh=mesh, in_specs=specs_in, out_specs=P("gp"),
                      check_vma=False)
    )
    out_loc = sharded(p_flat, jnp.asarray(x_loc), jax.tree.map(jnp.asarray, d))
    got = hp.unshard_features(np.asarray(out_loc), hb.levels[0], n)

    np.testing.assert_allclose(got, np.asarray(ref)[:n], atol=3e-5)
