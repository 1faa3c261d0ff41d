"""Node-sharded graph partitioning with halo exchange.

The next stage past the replicated-node edge-partition mode (parallel/api):
nodes are partitioned across chips, each chip owns the edges whose
DESTINATION is local, and the per-layer communication is an all-to-all of
just the BOUNDARY (halo) features instead of a psum over full node arrays
— the graph analog of ring/context parallelism, generalizing the
reference's submesh-overlap seam (SURVEY §2c).

Host side (this module): seeded BFS partitioning into balanced parts,
renumbering into per-chip slot spaces, per-pair halo send/recv index maps,
and locally-relabelled edge lists whose remote columns point into the halo
buffer region.  Device side: `halo_exchange` (one all_to_all) and
`halo_feast_conv` (exchange + purely local aggregation) under shard_map.

All per-chip arrays share one padded size, so the whole structure is a
stackable pytree: leading axis = chip, sharded over the mesh axis.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from geobignn_tpu.structs import round_up


def partition_nodes(
    edge_index: np.ndarray, n: int, n_parts: int, seed: int = 0
) -> np.ndarray:
    """Balanced BFS partitioning: grow parts breadth-first from spread
    seeds, capping each at ceil(n/n_parts).  Returns owner (n,) int32."""
    rng = np.random.default_rng(seed)
    cap = -(-n // n_parts)
    # CSR
    order = np.argsort(edge_index[0], kind="stable")
    rows, cols = edge_index[0][order].astype(np.int64), edge_index[1][order].astype(np.int64)
    ptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(rows, minlength=n), out=ptr[1:])

    owner = np.full(n, -1, dtype=np.int32)
    counts = np.zeros(n_parts, dtype=np.int64)
    frontiers: list[list[int]] = [[] for _ in range(n_parts)]
    for p in range(n_parts):
        free = np.where(owner < 0)[0]
        s = int(free[rng.integers(free.size)])
        owner[s] = p
        counts[p] = 1
        frontiers[p] = [s]
    active = True
    while active:
        active = False
        for p in range(n_parts):
            if counts[p] >= cap or not frontiers[p]:
                continue
            nxt = []
            for u in frontiers[p]:
                for v in cols[ptr[u] : ptr[u + 1]]:
                    if owner[v] < 0 and counts[p] < cap:
                        owner[v] = p
                        counts[p] += 1
                        nxt.append(int(v))
            frontiers[p] = nxt
            active = active or bool(nxt)
    # orphans (disconnected): assign to the emptiest parts
    for v in np.where(owner < 0)[0]:
        p = int(np.argmin(counts))
        owner[v] = p
        counts[p] += 1
    return owner


@dataclasses.dataclass
class HaloSharding:
    """Per-chip (leading axis P) halo-sharded graph structure."""

    n_parts: int
    n_loc: int  # padded local node count (incl. trash at n_loc-1)
    h_pad: int  # padded per-pair halo buffer length
    e_loc: int  # padded local edge count
    slot_of: np.ndarray  # (N,) global node -> local slot
    owner: np.ndarray  # (N,) global node -> chip
    gather_x: np.ndarray  # (P, n_loc) global row to load per slot (trash -> N)
    edge_index: np.ndarray  # (P, 2, e_loc): row local, col in [0, n_loc + P*h_pad)
    edge_weight: np.ndarray | None  # (P, e_loc)
    deg: np.ndarray  # (P, n_loc)
    node_mask: np.ndarray  # (P, n_loc)
    send_idx: np.ndarray  # (P, P, h_pad) local slots chip p sends to chip q


def build_halo_sharding(
    edge_index: np.ndarray,
    edge_weight: np.ndarray | None,
    n: int,
    owner: np.ndarray,
    granularity: int = 8,
) -> HaloSharding:
    p_cnt = int(owner.max()) + 1
    counts = np.bincount(owner, minlength=p_cnt)
    n_loc = round_up(int(counts.max()) + 1, granularity)
    trash_loc = n_loc - 1

    # vectorized slot assignment: nodes keep id order within their partition
    slot_of = np.zeros(n, dtype=np.int64)
    gather_x = np.full((p_cnt, n_loc), n, dtype=np.int64)  # n == global trash row
    order_n = np.argsort(owner[:n], kind="stable")
    starts = np.zeros(p_cnt, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    ranks = np.arange(n, dtype=np.int64) - starts[owner[order_n]]
    slot_of[order_n] = ranks
    gather_x[owner[order_n], ranks] = order_n

    row, col = edge_index[0].astype(np.int64), edge_index[1].astype(np.int64)
    # halo sets: for each (dst chip p, src chip q != p): globals of q used by p
    halo: list[list[np.ndarray]] = [[None] * p_cnt for _ in range(p_cnt)]
    h_max = 1
    for p in range(p_cnt):
        mask_p = owner[row] == p
        for q in range(p_cnt):
            if q == p:
                halo[p][q] = np.empty(0, dtype=np.int64)
                continue
            remote = np.unique(col[mask_p & (owner[col] == q)])
            halo[p][q] = remote
            h_max = max(h_max, remote.size)
    h_pad = round_up(h_max, granularity)

    # send_idx[q, p]: local slots (in q) of halo[p][q], padded with local trash
    send_idx = np.full((p_cnt, p_cnt, h_pad), trash_loc, dtype=np.int32)
    # halo position lookup: for dst p, node g owned by q -> halo buffer offset
    halo_pos: list[dict] = [dict() for _ in range(p_cnt)]
    for p in range(p_cnt):
        for q in range(p_cnt):
            nodes = halo[p][q]
            if nodes.size:
                send_idx[q, p, : nodes.size] = slot_of[nodes]
                base = n_loc + q * h_pad
                for k, g in enumerate(nodes):
                    halo_pos[p][int(g)] = base + k

    # local edge lists
    e_max = 1
    per_part_edges = []
    for p in range(p_cnt):
        sel = owner[row] == p
        r = slot_of[row[sel]]
        c_glob = col[sel]
        c = np.where(
            owner[c_glob] == p,
            slot_of[c_glob],
            [halo_pos[p].get(int(g), trash_loc) for g in c_glob],
        ).astype(np.int64)
        w = None if edge_weight is None else edge_weight[sel]
        per_part_edges.append((r, c, w))
        e_max = max(e_max, r.size)
    e_loc = round_up(e_max, granularity)

    ext_trash = n_loc - 1  # local trash slot (features zero)
    ei = np.full((p_cnt, 2, e_loc), ext_trash, dtype=np.int32)
    ew = None if edge_weight is None else np.zeros((p_cnt, e_loc), np.float32)
    deg = np.zeros((p_cnt, n_loc), np.float32)
    mask = np.zeros((p_cnt, n_loc), np.float32)
    for p, (r, c, w) in enumerate(per_part_edges):
        ei[p, 0, : r.size] = r
        ei[p, 1, : c.size] = c
        if w is not None:
            ew[p, : w.size] = w
        np.add.at(deg[p], r, 1.0)
        mask[p, : counts[p]] = 1.0

    return HaloSharding(
        n_parts=p_cnt, n_loc=n_loc, h_pad=h_pad, e_loc=e_loc,
        slot_of=slot_of, owner=np.asarray(owner, np.int32),
        gather_x=gather_x, edge_index=ei, edge_weight=ew,
        deg=deg, node_mask=mask, send_idx=send_idx,
    )


def shard_features(x: np.ndarray, sh: HaloSharding) -> np.ndarray:
    """(N, C) global features -> (P, n_loc, C) per-chip slot features."""
    ext = np.concatenate([x, np.zeros((1, x.shape[1]), x.dtype)], axis=0)
    return ext[sh.gather_x]


def unshard_features(x_loc: np.ndarray, sh: HaloSharding, n: int) -> np.ndarray:
    """(P, n_loc, C) -> (N, C) global order."""
    out = np.empty((n, x_loc.shape[-1]), x_loc.dtype)
    for v in range(n):
        out[v] = x_loc[sh.owner[v], sh.slot_of[v]]
    return out


# --------------------------------------------------------------------------
# device side (inside shard_map over the halo axis)
# --------------------------------------------------------------------------

def halo_exchange(x_local, send_idx_self, axis: str):
    """x_local (n_loc, C); send_idx_self (P, h_pad).  Returns the extended
    feature table (n_loc + P*h_pad, C): local slots then halo buffers laid
    out by source chip.  ONE all_to_all of boundary rows per call."""
    import jax
    import jax.numpy as jnp

    send = x_local[send_idx_self]  # (P, h_pad, C) rows destined per chip
    recv = jax.lax.all_to_all(send, axis, split_axis=0, concat_axis=0, tiled=False)
    p, h, c = recv.shape
    return jnp.concatenate([x_local, recv.reshape(p * h, c)], axis=0)


def halo_feast_conv(
    params, x_local, edge_index, deg, send_idx_self, axis: str, node_mask=None
):
    """FeaStConv over a halo-sharded graph: exchange boundary features once,
    then aggregate purely locally (rows are always local).  Pass node_mask
    to restore the zero-trash invariant (see models.dual_gnn.FeaStConv)."""
    import jax
    import jax.numpy as jnp

    from geobignn_tpu.ops import segment

    ext = halo_exchange(x_local, send_idx_self, axis)
    n = x_local.shape[0]
    row, col = edge_index[0], edge_index[1]
    x_i = x_local[row]
    x_j = ext[col]
    s = (x_j - x_i) @ params.u + params.c
    q = jax.nn.softmax(s, axis=-1)

    def one_head(w_h, q_h):
        # local rows inherit the global row-sort (slot order preserves id
        # order within a partition; trash padding is the max slot)
        z = segment.segment_sum(q_h[:, None] * x_j, row, n, sorted=True)
        return jnp.dot(z, w_h, preferred_element_type=x_local.dtype)

    out = one_head(params.w[0], q[:, 0])

    def body(acc, wq):
        return acc + one_head(*wq), None

    out, _ = jax.lax.scan(body, out, (params.w[1:], q[:, 1:].T))

    s_self = jax.nn.softmax(params.c)
    w_self = jnp.einsum("h,hio->io", s_self, params.w)
    out = out + jnp.dot(x_local, w_self, preferred_element_type=x_local.dtype)
    out = out / (deg + 1.0)[:, None] + params.b
    if node_mask is not None:
        out = out * node_mask.astype(out.dtype)[:, None]
    return out
