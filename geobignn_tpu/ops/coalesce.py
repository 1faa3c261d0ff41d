"""Static-shape edge coalescing (sort + dedup + attr-mean) under jit.

The in-graph counterpart of torch_sparse.coalesce (reference
code/net_util.py:294): duplicate edges produced by cluster-relabelling are
replaced by trash padding IN PLACE (array sizes never change), duplicate
attributes are mean-reduced onto the surviving representative edge.  All
ops are sorts, cumsums and segment reductions — jit/TPU friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from geobignn_tpu.ops import segment


def coalesce_edges(
    edge_index: jax.Array,  # (2, E) int32, trash-padded (row==col==trash)
    edge_weight: jax.Array | None,  # (E,)
    n_pad: int,
    compact: bool = False,
):
    """Returns (edge_index, edge_weight) of the SAME shapes with duplicates
    and self-loops turned into trash padding; surviving edges keep sorted
    (row, col) order; duplicate weights are mean-combined.

    compact=True additionally moves the trashed slots to the END (one more
    stable sort), so the output rows are globally NON-DECREASING (trash =
    n_pad-1 is the max slot).  That makes the output a legal `rows_sorted`
    input for the scan-based matching and the sorted-scatter conv
    aggregates — the dynamic-pooling fast path."""
    e = edge_index.shape[1]
    trash = n_pad - 1
    row, col = edge_index[0], edge_index[1]

    # self-loops (incl. trash padding) sort last via a loop flag; int32-safe
    # (no row*n_pad+col key, which overflows past ~46k nodes)
    is_loop = row == col
    order = jnp.lexsort((col, row, is_loop))
    row_s0, col_s0, loop_s = row[order], col[order], is_loop[order]
    same = jnp.concatenate(
        [jnp.zeros((1,), bool), (row_s0[1:] == row_s0[:-1]) & (col_s0[1:] == col_s0[:-1])]
    )
    first = ~same & ~loop_s
    # group id per sorted edge (first occurrences define groups)
    gid = jnp.cumsum(first.astype(jnp.int32)) - 1
    gid = jnp.where(~loop_s, gid, e - 1)  # junk group for loops/padding

    row_s = jnp.where(first, row_s0, trash)
    col_s = jnp.where(first, col_s0, trash)
    out_ei = jnp.stack([row_s, col_s])

    out_w = None
    if edge_weight is not None:
        w_s = edge_weight[order]
        mean_w = segment.segment_mean(
            jnp.where(~loop_s, w_s, 0.0)[:, None], gid, e
        )[:, 0]
        out_w = jnp.where(first, mean_w[gid], 0.0)
    if compact:
        # stable: surviving edges keep their (row, col) sorted order
        order2 = jnp.argsort(~first, stable=True)
        out_ei = out_ei[:, order2]
        if out_w is not None:
            out_w = out_w[order2]
    return out_ei, out_w
