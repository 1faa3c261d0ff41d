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
buffer region.  Device side: `halo_exchange` (edge-colored per-pair
ppermute rounds, each padded only to its own max pair cut) and
`halo_feast_conv` (exchange + purely local aggregation) under shard_map.

All per-chip arrays share one padded size, so the whole structure is a
stackable pytree: leading axis = chip, sharded over the mesh axis.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from geobignn_tpu.structs import round_up


def partition_nodes(
    edge_index: np.ndarray, n: int, n_parts: int, seed: int = 0,
    method: str = "rcm",
) -> np.ndarray:
    """Balanced node partitioning.  Returns owner (n,) int32.

    method="rcm" (default): slice the whole-graph RCM order into P equal
    contiguous slabs.  RCM ranks nodes ring-by-ring, so slabs are compact,
    every boundary is ~one ring (O(sqrt N) rows), and the partition comm
    graph is nearly a PATH — each part talks to its order-neighbors, so
    the sparse exchange needs ~2 rounds with small uniform pads.  The BFS
    grower (method="bfs", the previous default) leaves its LAST parts the
    scattered leftovers of the frontier race; their boundaries are huge
    and the max-chip cut (which paces a bulk-synchronous step) was
    measured 5-10x the slab cut at P>=16 (docs/halo_scaling.json).

    method="bfs": breadth-first growth from spread seeds, capped at
    ceil(n/n_parts) — kept for comparison and irregular graphs."""
    if method == "rcm":
        from geobignn_tpu.ops.banded import rcm_order

        perm = rcm_order(edge_index.astype(np.int64), n)
        cap = -(-n // n_parts)
        owner = np.empty(n, dtype=np.int32)
        for p in range(n_parts):
            owner[perm[p * cap : (p + 1) * cap]] = p
        return owner
    if method != "bfs":
        raise ValueError(f"unknown partition method '{method}'")
    rng = np.random.default_rng(seed)
    cap = -(-n // n_parts)
    # CSR
    order = np.argsort(edge_index[0], kind="stable")
    rows, cols = edge_index[0][order].astype(np.int64), edge_index[1][order].astype(np.int64)
    ptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(rows, minlength=n), out=ptr[1:])

    owner = np.full(n, -1, dtype=np.int32)
    counts = np.zeros(n_parts, dtype=np.int64)
    frontiers: list[np.ndarray] = [None] * n_parts
    for p in range(n_parts):
        free = np.where(owner < 0)[0]
        s = int(free[rng.integers(free.size)])
        owner[s] = p
        counts[p] = 1
        frontiers[p] = np.asarray([s], dtype=np.int64)

    def neighbors_of(front: np.ndarray) -> np.ndarray:
        """Concatenated CSR neighbor lists of a frontier, in CSR order
        (vectorized repeat/arange — no per-node Python loop)."""
        degs = ptr[front + 1] - ptr[front]
        total = int(degs.sum())
        if total == 0:
            return np.empty(0, np.int64)
        starts_e = np.repeat(ptr[front], degs)
        offs = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(degs) - degs, degs
        )
        return cols[starts_e + offs]

    active = True
    while active:
        active = False
        for p in range(n_parts):
            front = frontiers[p]
            if counts[p] >= cap or front.size == 0:
                continue
            nbr = neighbors_of(front)
            cand = nbr[owner[nbr] < 0]
            # first occurrence in CSR order (matches the sequential visit
            # order of the original loop), capped at the remaining room
            uniq, first = np.unique(cand, return_index=True)
            taken = uniq[np.argsort(first, kind="stable")]
            room = int(cap - counts[p])
            taken = taken[:room]
            owner[taken] = p
            counts[p] += taken.size
            frontiers[p] = taken
            active = active or taken.size > 0
    # orphans (disconnected): assign to the emptiest parts
    for v in np.where(owner < 0)[0]:
        p = int(np.argmin(counts))
        owner[v] = p
        counts[p] += 1
    return owner


@dataclasses.dataclass
class HaloSharding:
    """Per-chip (leading axis P) halo-sharded graph structure.

    The exchange is SPARSE: the partition communication graph (nonzero
    cut pairs) is edge-colored into `rounds`; each round is one ppermute
    over a disjoint set of chip pairs, padded only to the max cut WITHIN
    that round — not to the global max pair like a dense all_to_all
    (which cost 31-33% modeled efficiency at P>=16; see
    parallel/accounting.py and docs/halo_scaling.json)."""

    n_parts: int
    n_loc: int  # padded local node count (incl. trash at n_loc-1)
    h_total: int  # total halo buffer length = sum of per-round pads
    e_loc: int  # padded local edge count
    slot_of: np.ndarray  # (N,) global node -> local slot
    owner: np.ndarray  # (N,) global node -> chip
    gather_x: np.ndarray  # (P, n_loc) global row to load per slot (trash -> N)
    edge_index: np.ndarray  # (P, 2, e_loc): row local, col in [0, n_loc + h_total)
    edge_weight: np.ndarray | None  # (P, e_loc)
    deg: np.ndarray  # (P, n_loc)
    node_mask: np.ndarray  # (P, n_loc)
    send_idx: np.ndarray  # (P, h_total) local slots to send, round-major
    rounds: tuple = ()  # ((perm pairs, h_c), ...) static exchange schedule


def color_rounds(
    cut: np.ndarray, granularity: int = 8, bin_ratio: float = 2.0
) -> tuple[tuple, np.ndarray, int]:
    """Size-binned greedy edge-coloring of the partition comm graph.

    cut (P, P): cut[p, q] = rows p must RECEIVE from q.  Pairs with any
    traffic in either direction become edges.  Pairs are first bucketed
    into geometric weight classes (ratio `bin_ratio`), then each class is
    edge-colored independently (heaviest-first greedy) — so a chip's
    LIGHT pairs never share a round with (and get padded to) somebody
    else's heavy pair; within a round the pad overshoot is bounded by the
    bin ratio.  Extra rounds cost only per-collective latency, which is
    tiny next to the padding bytes they save.

    Each round c is padded to h_c = round_up(max pair cut in c).  Returns
    (rounds, offset_of, h_total): rounds = ((perm, h_c), ...) with perm a
    tuple of (src, dst) chip pairs (both directions of every pair);
    offset_of[p, q] = halo-buffer offset where p's rows-from-q land
    (-1 when the pair never communicates)."""
    import math

    p_cnt = cut.shape[0]
    wpair: dict[tuple[int, int], int] = {}
    for p in range(p_cnt):
        for q in range(p + 1, p_cnt):
            w = int(max(cut[p, q], cut[q, p]))
            if w > 0:
                wpair[(p, q)] = w
    # geometric size classes; class id descends with weight so heavy
    # rounds come first (stable layout for debugging)
    def klass(w: int) -> int:
        return -int(math.floor(math.log(max(w, 1)) / math.log(bin_ratio)))

    colors: list[dict] = []
    by_class: dict[int, list] = {}
    for pq, w in sorted(wpair.items(), key=lambda kv: (-kv[1], kv[0])):
        by_class.setdefault(klass(w), []).append((pq, w))
    for k in sorted(by_class):
        class_colors: list[dict] = []
        for (p, q), w in by_class[k]:
            for col in class_colors:
                if p not in col["used"] and q not in col["used"]:
                    break
            else:
                col = {"pairs": [], "h": 0, "used": set()}
                class_colors.append(col)
            col["pairs"].append((p, q))
            col["used"] |= {p, q}
            col["h"] = max(col["h"], w)
        colors.extend(class_colors)
    rounds = []
    offset_of = np.full((p_cnt, p_cnt), -1, np.int64)
    off = 0
    for col in colors:
        h_c = round_up(col["h"], granularity)
        perm = []
        for p, q in col["pairs"]:
            perm += [(p, q), (q, p)]
            offset_of[p, q] = off
            offset_of[q, p] = off
        rounds.append((tuple(sorted(perm)), h_c))
        off += h_c
    return tuple(rounds), offset_of, off


def build_halo_sharding(
    edge_index: np.ndarray,
    edge_weight: np.ndarray | None,
    n: int,
    owner: np.ndarray,
    granularity: int = 8,
    priority: np.ndarray | None = None,
    n_granularity: int | None = None,
) -> HaloSharding:
    """`priority` (n,) optionally orders nodes WITHIN their partition (lower
    first) — e.g. a per-partition RCM rank (partition_rcm_priority), which
    makes every chip's local graph band-limited so the banded Pallas conv
    applies per shard.  Default: id order.

    `n_granularity` rounds n_loc separately (the banded kernel needs
    n_loc % tile == 0) while the halo-round pads / e_loc keep the small
    `granularity` — rounding halo buffers up to a 768-wide tile would
    multiply the exchange payload and the reverse tables for nothing."""
    p_cnt = int(owner.max()) + 1
    counts = np.bincount(owner, minlength=p_cnt)
    n_loc = round_up(int(counts.max()) + 1, n_granularity or granularity)
    trash_loc = n_loc - 1

    # vectorized slot assignment: nodes keep id (or priority) order within
    # their partition
    slot_of = np.zeros(n, dtype=np.int64)
    gather_x = np.full((p_cnt, n_loc), n, dtype=np.int64)  # n == global trash row
    if priority is None:
        order_n = np.argsort(owner[:n], kind="stable")
    else:
        order_n = np.lexsort((priority[:n], owner[:n]))
    starts = np.zeros(p_cnt, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    ranks = np.arange(n, dtype=np.int64) - starts[owner[order_n]]
    slot_of[order_n] = ranks
    gather_x[owner[order_n], ranks] = order_n

    row, col = edge_index[0].astype(np.int64), edge_index[1].astype(np.int64)
    orow = owner[row].astype(np.int64)
    ocol = owner[col].astype(np.int64)

    # halo sets, vectorized: one sort of the cross edges by (dst chip p,
    # src chip q, global col), then per-(p, q) segment dedup — O(E log E)
    # total instead of P^2 full-edge mask passes and per-node dict fills
    cross = orow != ocol
    ckey = (orow[cross] * p_cnt + ocol[cross]) * (n + 1) + col[cross]
    uniq = np.unique(ckey)  # sorted: (p, q)-major, col-minor
    u_pq = uniq // (n + 1)
    u_col = uniq % (n + 1)
    seg_counts = np.bincount(u_pq, minlength=p_cnt * p_cnt)
    seg_starts = np.zeros(p_cnt * p_cnt, np.int64)
    np.cumsum(seg_counts[:-1], out=seg_starts[1:])
    u_rank = np.arange(uniq.size, dtype=np.int64) - seg_starts[u_pq]
    u_p, u_q = u_pq // p_cnt, u_pq % p_cnt

    # sparse exchange schedule: per-round (disjoint-pair) ppermutes, each
    # padded only to its own max pair cut (not the global max pair)
    cut = seg_counts.reshape(p_cnt, p_cnt)  # [p, q] = p receives from q
    rounds, offset_of, h_total = color_rounds(cut, granularity)

    # send_idx[q]: round-major send buffer of chip q — at each round's
    # offset, the local slots its round-partner p needs from q
    send_idx = np.full((p_cnt, h_total), trash_loc, dtype=np.int32)
    if uniq.size:
        send_idx[u_q, offset_of[u_p, u_q] + u_rank] = slot_of[u_col]

    # ext-space column lookup per dst chip: global node -> halo buffer slot
    # (n_loc + round offset + rank); own nodes resolve via slot_of below
    halo_slot = np.full((p_cnt, n), trash_loc, dtype=np.int32)
    if uniq.size:
        halo_slot[u_p, u_col] = n_loc + offset_of[u_p, u_q] + u_rank

    # local edge lists: slice the row-owner-sorted edges per chip
    e_order = np.argsort(orow, kind="stable")
    e_counts = np.bincount(orow, minlength=p_cnt)
    e_max = max(1, int(e_counts.max()))
    e_loc = round_up(e_max, granularity)
    e_starts = np.zeros(p_cnt + 1, np.int64)
    np.cumsum(e_counts, out=e_starts[1:])
    per_part_edges = []
    for p in range(p_cnt):
        sel = e_order[e_starts[p] : e_starts[p + 1]]
        r = slot_of[row[sel]]
        c_glob = col[sel]
        c = np.where(
            ocol[sel] == p, slot_of[c_glob], halo_slot[p, c_glob]
        ).astype(np.int64)
        w = None if edge_weight is None else edge_weight[sel]
        per_part_edges.append((r, c, w))

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
        n_parts=p_cnt, n_loc=n_loc, h_total=h_total, e_loc=e_loc,
        slot_of=slot_of, owner=np.asarray(owner, np.int32),
        gather_x=gather_x, edge_index=ei, edge_weight=ew,
        deg=deg, node_mask=mask, send_idx=send_idx, rounds=rounds,
    )


def halo_tables(sh: HaloSharding, granularity: int = 8) -> dict:
    """Dense neighbor/reverse tables for the scatter-free halo conv
    (ops/table.py layout, per chip, stacked on a leading P axis with shared
    K/R pads so the dict is one shard_map-able pytree):

      nbr  (P, n_loc, K)   local row -> ext-space neighbor slots
      kmask(P, n_loc, K)
      rev  (P, n_ext, R)   ext slot -> flattened (n_loc*K) positions
      rev_send (P, h_total, R_s)  local slot -> positions in send_idx,
                                  making halo_exchange's send gather
                                  scatter-free in backward too
    """
    from geobignn_tpu.ops import table as tbl

    p_cnt, n_loc, h_total = sh.n_parts, sh.n_loc, sh.h_total
    n_ext = n_loc + h_total

    per = []
    k_max = r_max = rs_max = 1
    for p in range(p_cnt):
        nbr_p, kmask_p, k_p = tbl.neighbor_table_np(
            sh.edge_index[p], n_loc, granularity=granularity
        )
        per.append([nbr_p, kmask_p])
        k_max = max(k_max, k_p)
    k_pad = k_max
    src_mask = np.ones(n_ext, bool)
    src_mask[n_loc - 1] = False  # local trash: huge fan-in, zero gradient
    for p in range(p_cnt):
        nbr_p, kmask_p = per[p]
        if nbr_p.shape[1] < k_pad:  # re-pad to the shared K
            pad = np.full((n_loc, k_pad - nbr_p.shape[1]), n_loc - 1, np.int32)
            nbr_p = np.concatenate([nbr_p, pad], axis=1)
            kmask_p = np.concatenate(
                [kmask_p, np.zeros(pad.shape, np.float32)], axis=1
            )
        rev_p, r_p = tbl.reverse_table_np(
            nbr_p, n_ext, src_mask=src_mask, granularity=granularity
        )
        rs_p, rsp = tbl.reverse_table_np(
            sh.send_idx[p].reshape(-1, 1), n_loc, src_mask=src_mask[:n_loc],
            granularity=granularity,
        )
        per[p] = [nbr_p, kmask_p, rev_p, rs_p]
        r_max, rs_max = max(r_max, r_p), max(rs_max, rsp)

    def repad_rev(rev_p, r_out, pad_val):
        if rev_p.shape[1] == r_out:
            return rev_p
        pad = np.full((rev_p.shape[0], r_out - rev_p.shape[1]), pad_val, np.int32)
        return np.concatenate([rev_p, pad], axis=1)

    nbr = np.stack([q[0] for q in per])
    kmask = np.stack([q[1] for q in per])
    rev = np.stack([repad_rev(q[2], r_max, n_loc * k_pad) for q in per])
    rev_send = np.stack(
        [repad_rev(q[3], rs_max, h_total) for q in per]
    )
    return dict(nbr=nbr, kmask=kmask, rev=rev, rev_send=rev_send)


def partition_rcm_priority(
    edge_index: np.ndarray, n: int, owner: np.ndarray
) -> tuple[np.ndarray, int]:
    """Per-partition RCM rank of every node over its INTRA-partition
    subgraph (boundary edges don't constrain the ordering).  Feed the rank
    as build_halo_sharding's `priority` so each chip's local slot space is
    band-limited.  Returns (priority (n,), max slot bandwidth across
    partitions) — the bandwidth sizes the banded tile."""
    from geobignn_tpu.ops.banded import rcm_order

    p_cnt = int(owner.max()) + 1
    row = edge_index[0].astype(np.int64)
    col = edge_index[1].astype(np.int64)
    pri = np.zeros(n, np.int64)
    bw_max = 0
    for p in range(p_cnt):
        nodes = np.where(owner[:n] == p)[0]
        idx_of = np.full(n, -1, np.int64)
        idx_of[nodes] = np.arange(nodes.size)
        sel = (owner[row] == p) & (owner[col] == p) & (row != col)
        sub = np.stack([idx_of[row[sel]], idx_of[col[sel]]])
        perm = rcm_order(sub, nodes.size)  # old local index per new slot
        rank = np.empty(nodes.size, np.int64)
        rank[perm] = np.arange(nodes.size)
        pri[nodes] = rank
        if sub.shape[1]:
            bw_max = max(bw_max, int(np.abs(rank[sub[0]] - rank[sub[1]]).max()))
    return pri, bw_max


def halo_band_arrays(sh: HaloSharding, tile: int, granularity: int = 8) -> dict:
    """Banded structure for the per-shard Pallas conv: the local edge set
    splits into INTRA edges (both endpoints local — band-limited when the
    sharding was built with partition_rcm_priority) and BOUNDARY edges
    (column in the halo region).  The FeaSt softmax is per-edge, so the two
    sets aggregate additively (ops/banded.py rank-H factorization):

      m       (P, B, T, 3T) int8   band mask of the intra edges
      nbr_b   (P, n_loc, K_b)      boundary neighbor table (ext space)
      kmask_b (P, n_loc, K_b)
      rev_b   (P, n_ext, R)        reverse table for the boundary gather
      rev_send(P, n_loc, R_s)      as in halo_tables

    Requires sh.n_loc % tile == 0 (pass granularity=tile when building)."""
    from geobignn_tpu.ops import table as tbl
    from geobignn_tpu.ops.banded import band_mask_np

    p_cnt, n_loc, h_total = sh.n_parts, sh.n_loc, sh.h_total
    assert n_loc % tile == 0, (n_loc, tile)
    n_ext = n_loc + h_total
    src_mask = np.ones(n_ext, bool)
    src_mask[n_loc - 1] = False

    masks, nbrs, kmasks, revs, rev_sends = [], [], [], [], []
    k_max = r_max = rs_max = 1
    for p in range(p_cnt):
        ei_p = sh.edge_index[p].astype(np.int64)
        intra = ei_p[1] < n_loc  # includes row==col trash padding (dropped
        # inside band_mask_np / neighbor_table_np)
        masks.append(band_mask_np(ei_p[:, intra], n_loc, tile))
        nbr_p, km_p, k_p = tbl.neighbor_table_np(
            ei_p[:, ~intra], n_loc, granularity=granularity
        )
        nbrs.append(nbr_p)
        kmasks.append(km_p)
        k_max = max(k_max, k_p)
        rs_p, rsp = tbl.reverse_table_np(
            sh.send_idx[p].reshape(-1, 1), n_loc, src_mask=src_mask[:n_loc],
            granularity=granularity,
        )
        rev_sends.append(rs_p)
        rs_max = max(rs_max, rsp)
    for p in range(p_cnt):
        if nbrs[p].shape[1] < k_max:
            pad = np.full((n_loc, k_max - nbrs[p].shape[1]), n_loc - 1, np.int32)
            nbrs[p] = np.concatenate([nbrs[p], pad], axis=1)
            kmasks[p] = np.concatenate(
                [kmasks[p], np.zeros(pad.shape, np.float32)], axis=1
            )
        rev_p, r_p = tbl.reverse_table_np(
            nbrs[p], n_ext, src_mask=src_mask, granularity=granularity
        )
        revs.append(rev_p)
        r_max = max(r_max, r_p)

    def repad(a, r_out, pad_val):
        if a.shape[1] == r_out:
            return a
        pad = np.full((a.shape[0], r_out - a.shape[1]), pad_val, np.int32)
        return np.concatenate([a, pad], axis=1)

    return dict(
        m=np.stack(masks),
        nbr_b=np.stack(nbrs),
        kmask_b=np.stack(kmasks),
        rev_b=np.stack([repad(r, r_max, n_loc * k_max) for r in revs]),
        rev_send=np.stack([repad(s, rs_max, h_total) for s in rev_sends]),
    )


def shard_features(x: np.ndarray, sh: HaloSharding) -> np.ndarray:
    """(N, C) global features -> (P, n_loc, C) per-chip slot features."""
    ext = np.concatenate([x, np.zeros((1, x.shape[1]), x.dtype)], axis=0)
    return ext[sh.gather_x]


def unshard_features(x_loc: np.ndarray, sh: HaloSharding, n: int) -> np.ndarray:
    """(P, n_loc, C) -> (N, C) global order (one fancy-index gather)."""
    return np.asarray(x_loc)[sh.owner[:n], sh.slot_of[:n]]


# --------------------------------------------------------------------------
# device side (inside shard_map over the halo axis)
# --------------------------------------------------------------------------

def halo_exchange(x_local, send_idx_self, axis: str, rounds=(), rev_send=None):
    """x_local (n_loc, C); send_idx_self (h_total,) round-major send slots;
    `rounds` the STATIC schedule from the sharding (HaloSharding.rounds).
    Returns the extended feature table (n_loc + h_total, C): local slots
    then per-round halo buffers.

    SPARSE exchange: one `ppermute` per round over that round's disjoint
    chip pairs, each padded to its own max pair cut — total bytes are the
    sum of per-round pads (close to the real cut), not (P-1) x the global
    max pair like the previous dense all_to_all.  Chips without a partner
    in a round contribute nothing; non-destination chips receive zeros
    (== trash features, never addressed).

    With `rev_send` (halo_tables) the send gather backpropagates through a
    reverse-table gather instead of a scatter-add."""
    import jax
    import jax.numpy as jnp

    if not rounds:
        return x_local
    if rev_send is None:
        send = x_local[send_idx_self]  # (h_total, C)
    else:
        from geobignn_tpu.ops import table as tbl

        send = tbl.table_gather(
            x_local, send_idx_self.reshape(-1, 1), rev_send
        ).reshape(send_idx_self.shape[0], x_local.shape[1])
    parts = [x_local]
    off = 0
    for perm, h_c in rounds:
        parts.append(
            jax.lax.ppermute(send[off : off + h_c], axis, perm=list(perm))
        )
        off += h_c
    return jnp.concatenate(parts, axis=0)


def halo_feast_conv(
    params, x_local, edge_index, deg, send_idx_self, axis: str,
    rounds=(), node_mask=None,
):
    """FeaStConv over a halo-sharded graph: exchange boundary features once,
    then aggregate purely locally (rows are always local).  Pass node_mask
    to restore the zero-trash invariant (see models.dual_gnn.FeaStConv)."""
    import jax
    import jax.numpy as jnp

    from geobignn_tpu.ops import segment

    ext = halo_exchange(x_local, send_idx_self, axis, rounds)
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


def halo_feast_conv_banded(
    params, x_local, band: dict, deg, send_idx_self, axis: str,
    rounds=(), node_mask=None, compute_dtype=None,
):
    """Banded Pallas FeaStConv per halo shard: intra-partition edges run
    through the gather-free banded kernel (ops/banded_pallas.py, local
    slots RCM-ordered via partition_rcm_priority), boundary edges through a
    small dense-table correction over the halo buffers.  The FeaSt softmax
    is per-edge, so the two numerators are exactly additive; deg counts
    both sets.  `band` = this chip's slice of partition.halo_band_arrays."""
    import jax
    import jax.numpy as jnp

    from geobignn_tpu.ops import table as tbl
    from geobignn_tpu.ops.banded_pallas import banded_aggregate

    if compute_dtype is None:
        compute_dtype = jnp.bfloat16

    ext = halo_exchange(x_local, send_idx_self, axis, rounds,
                        rev_send=band["rev_send"])

    # intra-partition band edges: rank-H factorized softmax halves
    a = x_local @ params.u
    p = jnp.exp(a - jax.lax.stop_gradient(a.max(axis=1, keepdims=True)))
    ca = params.c - a
    r = jnp.exp(ca - jax.lax.stop_gradient(ca.max(axis=1, keepdims=True)))
    num = banded_aggregate(r, p, x_local, params.w, band["m"], compute_dtype,
                           frozenset((axis,)))

    # boundary edges: per-edge softmax over the gathered halo features
    xnb = tbl.table_gather(ext, band["nbr_b"], band["rev_b"])  # (n_loc, Kb, C)
    s = jnp.einsum("nkc,ch->nkh", xnb - x_local[:, None, :], params.u) + params.c
    q = jax.nn.softmax(s, axis=-1) * band["kmask_b"][..., None]
    z = jnp.einsum("nkh,nkc->nhc", q, xnb)
    num = num + jnp.einsum("nhc,hco->no", z, params.w)

    s_self = jax.nn.softmax(params.c)
    w_self = jnp.einsum("h,hio->io", s_self, params.w)
    out = num + jnp.dot(x_local, w_self, preferred_element_type=jnp.float32)
    out = out / (deg + 1.0)[:, None] + params.b
    if node_mask is not None:
        out = out * node_mask.astype(out.dtype)[:, None]
    return out


def halo_feast_conv_table(
    params, x_local, tabs: dict, deg, send_idx_self, axis: str,
    rounds=(), node_mask=None,
):
    """Scatter-free halo FeaStConv: one boundary exchange, then the dense
    neighbor-table formulation (ops/feastconv.feast_conv_table) over the
    extended [local | halo] feature table.  `tabs` = this chip's slice of
    partition.halo_tables.  Forward AND backward are gather-only (the
    measured 12x/5.6x single-chip win carries over; the only extra cost is
    the exchange pair, whose payload is the cut size)."""
    from geobignn_tpu.ops.feastconv import feast_conv_table

    ext = halo_exchange(x_local, send_idx_self, axis, rounds,
                        rev_send=tabs["rev_send"])
    out = feast_conv_table(
        params, x_local, tabs["nbr"], tabs["kmask"], tabs["rev"],
        deg=deg, x_src=ext,
    )
    if node_mask is not None:
        out = out * node_mask.astype(out.dtype)[:, None]
    return out
