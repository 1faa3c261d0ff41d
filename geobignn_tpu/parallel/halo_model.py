"""Halo-sharded graph U-Net: the full multi-level model over node shards.

Extends parallel/partition.py (single-conv halo exchange) to the whole
GNNModule: with partition-constrained pooling hierarchies
(pool/hierarchy.py `owner=`), every cluster lives on one chip, so pooling
and unpooling are purely local gathers/scatters in per-chip slot space;
only the convolutions exchange halos (one all_to_all per conv per level).

Communication per forward: 8 convs x one boundary all_to_all whose payload
is the per-level halo size — O(cut size), vs O(N) for the replicated-node
psum mode in parallel/api.py.

`build_halo_branch` precomputes the per-chip structure from an
owner-constrained hierarchy; `halo_gnn_module` consumes the SAME parameter
pytree as models.GNNModule (exact-parity test: tests/test_halo_model.py).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from geobignn_tpu.parallel import partition as hp
from geobignn_tpu.pool.hierarchy import PoolLevelSpec


@dataclasses.dataclass
class HaloBranch:
    """Per-chip (leading axis P) multi-level halo structure."""

    levels: list[hp.HaloSharding]  # 3 levels
    clusters_loc: list[np.ndarray]  # 4 x (P, n_loc_in) -> local coarse slot
    unpool1_loc: np.ndarray  # (P, n_loc_l1) -> local level-2 slot
    unpool2_loc: np.ndarray  # (P, n_loc_l2) -> local level-3 slot
    tables: list[dict] | None = None  # 3 x halo_tables dict (scatter-free convs)
    band0: dict | None = None  # level-1 halo_band_arrays (banded Pallas conv)


def _localize_map(
    global_map: np.ndarray,  # fine global id -> coarse global id
    sh_in: hp.HaloSharding,
    sh_out: hp.HaloSharding,
) -> np.ndarray:
    """Per-chip local index map: fine local slot -> coarse local slot.
    Requires owner(fine) == owner(coarse) (partition-constrained)."""
    p = sh_in.n_parts
    out = np.full((p, sh_in.n_loc), sh_out.n_loc - 1, dtype=np.int32)
    assert (sh_out.owner[global_map] == sh_in.owner).all(), "cluster crosses partitions"
    out[sh_in.owner, sh_in.slot_of] = sh_out.slot_of[global_map]
    return out


def build_halo_branch(
    edge_index: np.ndarray,
    edge_weight: np.ndarray | None,
    n_nodes: int,
    specs: list[PoolLevelSpec],
    owner: np.ndarray,
    granularity: int = 8,
    with_tables: bool = True,
    banded: bool = False,
) -> HaloBranch:
    """specs must come from build_hierarchy(..., owner=owner).

    `banded=True` RCM-orders each chip's local slot space and runs the
    level-1 convs through the banded Pallas kernel (intra edges) plus a
    dense-table boundary correction — see partition.halo_feast_conv_banded.
    Levels 2-3 keep the table path (they are ~16x smaller)."""
    band0 = None
    if banded:
        from geobignn_tpu.ops.banded import MAX_BAND_TILE, pick_tile

        pri, bw = hp.partition_rcm_priority(edge_index, n_nodes, owner)
        tile = pick_tile(bw)
        if tile > MAX_BAND_TILE:  # band too wide for scoped VMEM: fall back
            banded = False  # to the dense-table path (same gate as builder)
        else:
            sh1 = hp.build_halo_sharding(
                edge_index, edge_weight, n_nodes, owner, granularity,
                priority=pri, n_granularity=tile,
            )
            band0 = hp.halo_band_arrays(sh1, tile, granularity)
    if not banded:
        sh1 = hp.build_halo_sharding(
            edge_index, edge_weight, n_nodes, owner, granularity
        )
    s1, s2 = specs
    assert s1.owner_out is not None and s2.owner_out is not None

    # intermediate shardings after each matching round (edges only needed at
    # conv levels; intermediates just need slot spaces for the scatter)
    own_m1 = np.zeros(s1.step_sizes[0], dtype=owner.dtype)
    own_m1[s1.step_clusters[0]] = owner
    sh_m1 = hp.build_halo_sharding(
        np.zeros((2, 0), np.int64), None, s1.step_sizes[0], own_m1, granularity
    )
    sh2 = hp.build_halo_sharding(
        s1.edge_index, s1.edge_weight, s1.n_out, s1.owner_out, granularity
    )
    own_m2 = np.zeros(s2.step_sizes[0], dtype=owner.dtype)
    own_m2[s2.step_clusters[0]] = s1.owner_out
    sh_m2 = hp.build_halo_sharding(
        np.zeros((2, 0), np.int64), None, s2.step_sizes[0], own_m2, granularity
    )
    sh3 = hp.build_halo_sharding(
        s2.edge_index, s2.edge_weight, s2.n_out, s2.owner_out, granularity
    )

    clusters_loc = [
        _localize_map(s1.step_clusters[0], sh1, sh_m1),
        _localize_map(s1.step_clusters[1], sh_m1, sh2),
        _localize_map(s2.step_clusters[0], sh2, sh_m2),
        _localize_map(s2.step_clusters[1], sh_m2, sh3),
    ]
    unpool1 = _localize_map(s1.unpool, sh1, sh2)
    unpool2 = _localize_map(s2.unpool, sh2, sh3)
    tables = (
        # level 0 is covered by band0 in banded mode: its dense tables (the
        # largest arrays in the sample) would be dead HBM weight
        [None if band0 is not None and i == 0 else hp.halo_tables(sh, granularity)
         for i, sh in enumerate((sh1, sh2, sh3))]
        if with_tables
        else None
    )
    return HaloBranch(
        levels=[sh1, sh2, sh3],
        clusters_loc=clusters_loc,
        unpool1_loc=unpool1,
        unpool2_loc=unpool2,
        tables=tables,
        band0=band0,
    )


def branch_static(hb: HaloBranch) -> dict:
    """STATIC (non-array) exchange schedules per level — passed alongside
    branch_device_arrays into the shard_map step (rounds are python tuples
    baked into the traced program, not operands)."""
    return {f"rounds{i}": sh.rounds for i, sh in enumerate(hb.levels)}


def dual_static(hd: "HaloDual") -> dict:
    return dict(v=branch_static(hd.v), f=branch_static(hd.f),
                fv_rounds=hd.fv_rounds)


def branch_device_arrays(hb: HaloBranch) -> dict:
    """The (P, ...) arrays a shard_map step consumes, as one dict pytree."""
    d = {}
    for i, sh in enumerate(hb.levels):
        covered = (hb.band0 is not None and i == 0) or (
            hb.tables is not None and hb.tables[i] is not None
        )
        if not covered:  # COO list only shipped when it's the active path
            d[f"ei{i}"] = sh.edge_index
        d[f"deg{i}"] = sh.deg
        d[f"send{i}"] = sh.send_idx
        d[f"mask{i}"] = sh.node_mask
    if hb.tables is not None:
        for i, tab in enumerate(hb.tables):
            if tab is not None:
                d[f"tab{i}"] = tab
    if hb.band0 is not None:
        d["band0"] = hb.band0
    for i, cl in enumerate(hb.clusters_loc):
        d[f"cl{i}"] = cl
    d["unpool1"] = hb.unpool1_loc
    d["unpool2"] = hb.unpool2_loc
    return d


# --------------------------------------------------------------------------
# device side (per chip, inside shard_map over `axis`)
# --------------------------------------------------------------------------

def _pool_local(x, cl, n_out, pool_type="max"):
    import jax.numpy as jnp

    from geobignn_tpu.ops import segment

    if pool_type == "max":
        return segment.segment_max(x, cl, n_out)
    return segment.segment_mean(x, cl, n_out)


def halo_gnn_module(params, x_loc, d: dict, sd: dict, axis: str,
                    pool_type: str = "max", compute_dtype=None):
    """Functional halo U-Net consuming models.GNNModule's param pytree
    (keys l_conv1..4, r_conv1..4).  `d` = branch_device_arrays slice for
    this chip; `sd` = branch_static (per-level exchange schedules).
    `compute_dtype` (e.g. bf16) casts activations + conv params like
    models.GNNModule; the halo paths are scatter-free, so bf16 avoids the
    pathological XLA bf16 scatter-add documented in dual_gnn.py.
    Returns (n_loc_l1, 32) local features."""
    import jax.numpy as jnp
    from flax import linen as nn

    from geobignn_tpu.models.dual_gnn import LEAKY_SLOPE
    from geobignn_tpu.ops.feastconv import FeastParams

    dt = compute_dtype or jnp.float32
    x_loc = x_loc.astype(dt)

    def fp(name):
        q = params[name]
        return FeastParams(u=q["u"].astype(dt), c=q["c"].astype(dt),
                           w=q["w"].astype(dt), b=q["b"].astype(dt))

    def conv(name, x, lvl):
        rounds = sd[f"rounds{lvl}"]
        if f"band{lvl}" in d:  # banded Pallas + boundary-table correction
            return hp.halo_feast_conv_banded(
                fp(name), x, d[f"band{lvl}"], d[f"deg{lvl}"], d[f"send{lvl}"],
                axis, rounds, node_mask=d[f"mask{lvl}"],
            )
        if f"tab{lvl}" in d:  # scatter-free dense-table path (default)
            return hp.halo_feast_conv_table(
                fp(name), x, d[f"tab{lvl}"], d[f"deg{lvl}"], d[f"send{lvl}"],
                axis, rounds, node_mask=d[f"mask{lvl}"],
            )
        return hp.halo_feast_conv(
            fp(name), x, d[f"ei{lvl}"], d[f"deg{lvl}"], d[f"send{lvl}"], axis,
            rounds, node_mask=d[f"mask{lvl}"],
        )

    act = lambda v: nn.leaky_relu(v, LEAKY_SLOPE)

    x1 = act(conv("l_conv1", x_loc, 0))
    xm = _pool_local(x1, d["cl0"], d["cl1"].shape[0], pool_type)
    x2 = _pool_local(xm, d["cl1"], d["mask1"].shape[0], pool_type)
    x2 = act(conv("l_conv2", x2, 1))
    xm = _pool_local(x2, d["cl2"], d["cl3"].shape[0], pool_type)
    x3 = _pool_local(xm, d["cl3"], d["mask2"].shape[0], pool_type)
    x3 = act(conv("l_conv3", x3, 2))
    x3 = act(conv("l_conv4", x3, 2))

    u2 = x3[d["unpool2"]]
    u2 = conv("r_conv1", u2, 1)
    x2 = jnp.concatenate([x2, u2], axis=1)
    x2 = act(conv("r_conv2", x2, 1))

    u1 = x2[d["unpool1"]]
    u1 = conv("r_conv3", u1, 0)
    x1 = jnp.concatenate([x1, u1], axis=1)
    return act(conv("r_conv4", x1, 0))


# --------------------------------------------------------------------------
# full dual model: cross-domain vertex->facet gather across chips
# --------------------------------------------------------------------------

@dataclasses.dataclass
class HaloDual:
    """Both branches + the fv cross-domain halo relation."""

    v: HaloBranch
    f: HaloBranch
    fv_loc: np.ndarray  # (P, n_loc_f, 3) into [v local slots | fv halo bufs]
    send_fv: np.ndarray  # (P, h_total) vertex local slots sent, round-major
    fv_rounds: tuple = ()  # static exchange schedule for the fv gather
    fv_rev: np.ndarray | None = None  # (P, n_ext_v, R) reverse table of fv_loc
    send_fv_rev: np.ndarray | None = None  # (P, n_loc_v, R_s) rev of send_fv


def build_gather_halo(
    indices: np.ndarray,  # (M, K) global src ids per row
    owner_rows: np.ndarray,  # (M,) chip per row
    row_slot_of: np.ndarray,  # (M,) local slot per row
    n_loc_rows: int,
    sh_src: "hp.HaloSharding",
    granularity: int = 8,
):
    """Halo structure for an arbitrary gather relation (e.g. face->vertex
    corners): per destination chip, the remote src rows it needs, as
    send_idx (src side, round-major) + localized index table (dst side) +
    the static `rounds` exchange schedule (same sparse per-pair scheme as
    build_halo_sharding)."""
    p_cnt = sh_src.n_parts
    src_owner, src_slot = sh_src.owner, sh_src.slot_of
    m, k = indices.shape

    halo: list[list[np.ndarray]] = [[None] * p_cnt for _ in range(p_cnt)]
    cut = np.zeros((p_cnt, p_cnt), np.int64)
    for p in range(p_cnt):
        rows_p = owner_rows == p
        used = np.unique(indices[rows_p].reshape(-1))
        for q in range(p_cnt):
            if q == p:
                halo[p][q] = np.empty(0, dtype=np.int64)
                continue
            remote = used[src_owner[used] == q]
            halo[p][q] = remote
            cut[p, q] = remote.size
    rounds, offset_of, h_total = hp.color_rounds(cut, granularity)

    trash_src = sh_src.n_loc - 1
    send_idx = np.full((p_cnt, h_total), trash_src, dtype=np.int32)
    pos: list[dict] = [dict() for _ in range(p_cnt)]
    for p in range(p_cnt):
        for q in range(p_cnt):
            nodes = halo[p][q]
            if nodes.size:
                off = int(offset_of[p, q])
                send_idx[q, off : off + nodes.size] = src_slot[nodes]
                base = sh_src.n_loc + off
                for j, g in enumerate(nodes):
                    pos[p][int(g)] = base + j

    table = np.full((p_cnt, n_loc_rows, k), trash_src, dtype=np.int32)
    for r in range(m):
        p = owner_rows[r]
        s = row_slot_of[r]
        for c in range(k):
            g = int(indices[r, c])
            table[p, s, c] = src_slot[g] if src_owner[g] == p else pos[p][g]
    return table, send_idx, rounds


def build_halo_dual(
    ei_v, w_v, n_v, specs_v, owner_v,
    ei_f, w_f, fv_indices, specs_f,
    granularity: int = 8,
    banded: bool = False,
) -> HaloDual:
    """Faces are owned by the chip of their first corner; both hierarchies
    must be owner-constrained."""
    from geobignn_tpu.ops import table as tbl

    n_f = fv_indices.shape[0]
    owner_f = owner_v[fv_indices[:, 0]].astype(np.int32)
    hb_v = build_halo_branch(ei_v, w_v, n_v, specs_v, owner_v, granularity,
                             banded=banded)
    hb_f = build_halo_branch(ei_f, w_f, n_f, specs_f, owner_f, granularity,
                             banded=banded)
    fv_loc, send_fv, fv_rounds = build_gather_halo(
        fv_indices.astype(np.int64), owner_f,
        hb_f.levels[0].slot_of[:n_f].astype(np.int64),
        hb_f.levels[0].n_loc, hb_v.levels[0], granularity,
    )

    # reverse tables: make the corner gather + its halo send scatter-free in
    # backward (same machinery as partition.halo_tables)
    p_cnt = fv_loc.shape[0]
    n_loc_v = hb_v.levels[0].n_loc
    h_total = send_fv.shape[-1]
    n_ext_v = n_loc_v + h_total
    src_mask = np.ones(n_ext_v, bool)
    src_mask[n_loc_v - 1] = False
    revs, rev_sends, r_max, rs_max = [], [], 1, 1
    for p in range(p_cnt):
        r_p, rr = tbl.reverse_table_np(fv_loc[p], n_ext_v, src_mask=src_mask,
                                       granularity=granularity)
        s_p, rs = tbl.reverse_table_np(send_fv[p].reshape(-1, 1), n_loc_v,
                                       src_mask=src_mask[:n_loc_v],
                                       granularity=granularity)
        revs.append(r_p)
        rev_sends.append(s_p)
        r_max, rs_max = max(r_max, rr), max(rs_max, rs)

    def repad(a, r_out, pad_val):
        if a.shape[1] == r_out:
            return a
        pad = np.full((a.shape[0], r_out - a.shape[1]), pad_val, np.int32)
        return np.concatenate([a, pad], axis=1)

    fv_rev = np.stack(
        [repad(r, r_max, fv_loc[0].size) for r in revs]
    )
    send_fv_rev = np.stack(
        [repad(s, rs_max, h_total) for s in rev_sends]
    )
    return HaloDual(v=hb_v, f=hb_f, fv_loc=fv_loc, send_fv=send_fv,
                    fv_rounds=fv_rounds, fv_rev=fv_rev,
                    send_fv_rev=send_fv_rev)


def dual_device_arrays(hd: HaloDual) -> dict:
    d = dict(
        v=branch_device_arrays(hd.v),
        f=branch_device_arrays(hd.f),
        fv=hd.fv_loc,
        send_fv=hd.send_fv,
    )
    if hd.fv_rev is not None:
        d["fv_rev"] = hd.fv_rev
        d["send_fv_rev"] = hd.send_fv_rev
    return d


def halo_dual_gnn(params, x_v_loc, x_f_loc, d: dict, sd: dict, axis: str,
                  pool_type: str = "max", depth_direction=None,
                  compute_dtype=None):
    """Full DualGNN forward over halo shards; consumes models.DualGNN's
    parameter pytree.  `sd` = dual_static(hd) exchange schedules.

    `depth_direction` (n_loc_v, 3): the Kinect force_depth head
    (reference code/network.py:326-332) — engaged when the checkpoint's
    fc_v2 regresses 1 channel, the residual is then scalar * ray.
    `compute_dtype`: bf16 runs U-Nets + fc heads in bf16; residual add,
    cross-domain geometry, and normalization stay f32 (same contract as
    models.DualGNN).  Returns (vert_p_loc, norm_p_loc)."""
    import jax.numpy as jnp
    from flax import linen as nn

    from geobignn_tpu import geometry
    from geobignn_tpu.models.dual_gnn import LEAKY_SLOPE

    dt = compute_dtype or jnp.float32
    act = lambda v: nn.leaky_relu(v, LEAKY_SLOPE)

    def dense(name, x):
        q = params[name]
        return x @ q["kernel"].astype(x.dtype) + q["bias"].astype(x.dtype)

    xyz = x_v_loc[:, :3]
    feat_v = halo_gnn_module(params["gnn_v"], x_v_loc, d["v"], sd["v"], axis,
                             pool_type, compute_dtype=dt)
    h = act(dense("fc_v1", feat_v))
    out_v = dense("fc_v2", h).astype(jnp.float32)
    if params["fc_v2"]["kernel"].shape[-1] == 1:  # force_depth head
        if depth_direction is None:
            raise ValueError(
                "checkpoint has a force_depth (1-channel) vertex head but "
                "no depth_direction was provided (build with with_depth)"
            )
        out_v = out_v * depth_direction
    vert_p = out_v + xyz

    # cross-domain: exchange corner vertex positions, rebuild facet features
    # (reverse tables, when present, make both gathers scatter-free in bwd)
    ext_v = hp.halo_exchange(vert_p, d["send_fv"], axis, sd["fv_rounds"],
                             rev_send=d.get("send_fv_rev"))
    if "fv_rev" in d:
        from geobignn_tpu.ops import table as tbl

        corners = tbl.table_gather(ext_v, d["fv"], d["fv_rev"])
    else:
        corners = ext_v[d["fv"]]  # (n_loc_f, 3, 3)
    face_cent = corners.mean(axis=1)
    n_ = jnp.cross(corners[:, 1] - corners[:, 0], corners[:, 2] - corners[:, 0])
    face_norm = geometry.safe_normalize(n_)
    x_f = jnp.concatenate([x_f_loc, face_cent, face_norm], axis=1)

    feat_f = halo_gnn_module(params["gnn_f"], x_f, d["f"], sd["f"], axis,
                             pool_type, compute_dtype=dt)
    h = act(dense("fc_f1", feat_f))
    norm_p = geometry.safe_normalize(dense("fc_f2", h).astype(jnp.float32))
    return vert_p, norm_p
