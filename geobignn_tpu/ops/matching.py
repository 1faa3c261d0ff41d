"""On-device parallel heavy-edge matching (the jit-compatible Graclus).

The reference's graclus is a sequential randomized greedy matching run on
the CPU inside every forward pass (code/net_util.py:127) — impossible under
XLA.  This kernel replaces it with a deterministic Luby-style handshake:

  repeat R rounds:
    every unmatched node points at its heaviest unmatched neighbour
    (ties broken toward the smaller node id);
    mutual proposals (i -> j and j -> i) become matched pairs.

Each round is pure segment-max/gather arithmetic with static shapes;
R = 8 rounds matches >95% of matchable nodes on mesh graphs (each round
matches a constant fraction in expectation).  Unmatched leftovers stay
singletons — exactly graclus's behaviour for isolated nodes.

The result is a representative map rep[i] = min(i, partner(i)) in
ORIGINAL slot space: dynamic pooling keeps the padded node array size at
every level (cluster counts are data-dependent and XLA shapes are not), so
"pooled" features live at representative slots and non-representatives
become unreferenced stale lanes.  This mode exists for exact parity of the
activation-dependent edge-weight types (3-5, 10); the shipped default is
the precomputed static hierarchy (pool/hierarchy.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from geobignn_tpu.ops import segment


@partial(jax.jit, static_argnames=("n_pad", "rounds", "rows_sorted"))
def parallel_matching(
    edge_index: jax.Array,  # (2, E) trash-padded, both directions present
    edge_weight: jax.Array | None,  # (E,) affinity; None -> uniform
    n_pad: int,
    rounds: int = 8,
    rows_sorted: bool = False,
) -> jax.Array:
    """Returns rep (n_pad,) int32: representative slot per node.

    Scatter-free rounds via a ONE-TIME lexsort by (row, weight asc, col
    desc): in that order, each node's heaviest free edge (weight ties
    broken toward the smaller col — the scatter formulation's exact
    semantics) is simply the free edge with the LARGEST sorted position
    inside the node's run.  Positions increase monotonically across rows,
    so the per-row argmax is one int32 `lax.cummax` over positions plus a
    run-end gather — no scatters at all.  A scatter segment_max measured
    2.2 ms at E=245k on v5e vs 0.22 ms for the cummax; the matching was
    95% scatter time (82 ms -> ~6 ms per 8-round application).  Bit-exact
    vs the scatter oracle (test_scan_matching_matches_scatter).

    `rows_sorted` (rows already non-decreasing — host level-1 graphs,
    compacted coalesce outputs) only cheapens the lexsort; the result is
    identical either way."""
    row, col = edge_index[0], edge_index[1]
    e = row.shape[0]
    w = jnp.ones((e,), jnp.float32) if edge_weight is None else edge_weight
    # (row, w asc, col desc): the last position of a row's free prefix
    # under this order IS "max weight, tie -> min col"
    order = jnp.lexsort((-col, w, row), axis=0)
    row, col, w = row[order], col[order], w[order]
    real = (row != col)  # excludes self loops AND trash padding

    iota = jnp.arange(n_pad)
    pos1 = jnp.arange(1, e + 1, dtype=jnp.int32)
    # last sorted index of each node's run (clip keeps gathers in range;
    # validity is re-checked against the carried cummax below)
    row_end = jnp.clip(
        jnp.searchsorted(row, iota, side="right") - 1, 0, e - 1
    )

    def body(_, state):
        matched, partner = state  # matched: f32 0/1 (n_pad,)
        # edge-wide state reads go through a WIDTH-2 f32 gather: 1-wide
        # (and especially bool) gathers waste the vector lanes — measured
        # 1.77 ms (f32) / 15.8 ms (pred) vs 0.48 ms at width >= 2 for
        # E=245k on v5e.  One (2E, 2) gather covers both endpoints.
        m2 = jnp.broadcast_to(matched[:, None], (n_pad, 2))
        ends = m2[jnp.concatenate([row, col])][:, 0]
        free_edge = real & (ends[:e] + ends[e:] == 0.0)
        # best free edge per node = max sorted position among its free
        # edges; cummax carries across rows, so a node whose run has no
        # free edge inherits an EARLIER position — detected by checking
        # the row at that position
        key = jnp.where(free_edge, pos1, 0)
        best = jax.lax.cummax(key)[row_end] - 1  # (n_pad,) position or -1
        best_c = jnp.clip(best, 0, e - 1)
        has = (best >= 0) & (row[best_c] == iota)
        prop_c = jnp.clip(jnp.where(has, col[best_c], n_pad - 1),
                          0, n_pad - 1)
        # handshake: mutual proposals match this round
        mutual = (
            has & (jnp.take(prop_c, prop_c) == iota) & (matched == 0.0)
        )
        partner = jnp.where(mutual, prop_c, partner)
        return jnp.maximum(matched, mutual.astype(matched.dtype)), partner

    # carry seeded from the inputs so its varying-axes type matches the
    # body outputs inside shard_map (a plain zeros/iota init is axis-
    # invariant while the body is batch-varying — scan would reject it)
    matched0 = jnp.zeros((n_pad,), jnp.float32) + 0.0 * w[0]
    partner0 = iota + 0 * row[0]
    matched, partner = jax.lax.fori_loop(0, rounds, body, (matched0, partner0))
    return jnp.minimum(iota, partner).astype(jnp.int32)


def _parallel_matching_scatter(
    edge_index: jax.Array, edge_weight: jax.Array | None, n_pad: int,
    rounds: int = 8,
) -> jax.Array:
    """The original segment-scatter formulation, kept as the semantics
    oracle for the scan version (and for backends without a fast scan)."""
    row, col = edge_index[0], edge_index[1]
    e = row.shape[0]
    w = jnp.ones((e,), jnp.float32) if edge_weight is None else edge_weight
    real = (row != col)
    iota = jnp.arange(n_pad)

    def body(_, state):
        matched, partner = state
        free_edge = real & ~matched[row] & ~matched[col]
        wv = jnp.where(free_edge, w, -jnp.inf)
        m = jax.ops.segment_max(wv, row, num_segments=n_pad)
        is_best = free_edge & (wv >= m[row])
        cand = jnp.where(is_best, col, n_pad)
        prop = jax.ops.segment_min(cand, row, num_segments=n_pad)
        has = prop < n_pad
        prop_c = jnp.clip(prop, 0, n_pad - 1)
        mutual = has & (jnp.take(prop_c, prop_c) == iota) & ~matched
        partner = jnp.where(mutual, prop_c, partner)
        return matched | mutual, partner

    matched, partner = jax.lax.fori_loop(
        0, rounds, body, (jnp.zeros((n_pad,), bool), iota)
    )
    return jnp.minimum(iota, partner).astype(jnp.int32)


def pool_with_rep(x: jax.Array, rep: jax.Array, pool_type: str = "max") -> jax.Array:
    """Scatter node features onto representative slots (same array size)."""
    n = x.shape[0]
    if pool_type == "max":
        return segment.segment_max(x, rep, n)
    return segment.segment_mean(x, rep, n)


def pool_edges_with_rep(
    edge_index: jax.Array, edge_weight: jax.Array | None, rep: jax.Array, n_pad: int
):
    """Relabel edges through rep, trash self-collapsed edges, coalesce.
    compact=True: the output rows come back globally sorted, so the next
    matching and the coarse convs take their scan/sorted fast paths."""
    from geobignn_tpu.ops.coalesce import coalesce_edges

    ei = rep[edge_index]
    return coalesce_edges(ei, edge_weight, n_pad, compact=True)
