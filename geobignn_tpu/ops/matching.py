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


@partial(jax.jit, static_argnames=("n_pad", "rounds"))
def parallel_matching(
    edge_index: jax.Array,  # (2, E) trash-padded, both directions present
    edge_weight: jax.Array | None,  # (E,) affinity; None -> uniform
    n_pad: int,
    rounds: int = 8,
) -> jax.Array:
    """Returns rep (n_pad,) int32: representative slot per node."""
    row, col = edge_index[0], edge_index[1]
    e = row.shape[0]
    w = jnp.ones((e,), jnp.float32) if edge_weight is None else edge_weight
    real = (row != col)  # excludes self loops AND trash padding

    iota = jnp.arange(n_pad)

    def body(_, state):
        matched, partner = state
        free_edge = real & ~matched[row] & ~matched[col]
        wv = jnp.where(free_edge, w, -jnp.inf)
        # heaviest free neighbour per node ...
        m = jax.ops.segment_max(wv, row, num_segments=n_pad)
        # ... breaking weight ties toward the smallest neighbour id
        is_best = free_edge & (wv >= m[row])
        cand = jnp.where(is_best, col, n_pad)
        prop = jax.ops.segment_min(cand, row, num_segments=n_pad)
        has = prop < n_pad
        prop_c = jnp.clip(prop, 0, n_pad - 1)
        # handshake: mutual proposals match this round
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
    """Relabel edges through rep, trash self-collapsed edges, coalesce."""
    from geobignn_tpu.ops.coalesce import coalesce_edges

    ei = rep[edge_index]
    return coalesce_edges(ei, edge_weight, n_pad)
