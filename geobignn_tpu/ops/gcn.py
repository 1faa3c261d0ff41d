"""GCN convolution — symmetric-normalized adjacency aggregation.

Capability parity target: torch_geometric GCNConv as used by the legacy
FacetAttentionGNN (code/network.py:34-36,63-64).  Semantics:

    out = D^{-1/2} (A + I) D^{-1/2} X W + b,   deg counts the self-loop.

Same trash-padding contract as feastconv: edge lists carry no self-loops
(the identity term is added explicitly); padded edges point at the zero
trash row."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from geobignn_tpu.ops import segment


class GCNParams(NamedTuple):
    w: jax.Array  # (C_in, C_out)
    b: jax.Array  # (C_out,)


def init_gcn_params(key, c_in, c_out, dtype=jnp.float32) -> GCNParams:
    lim = (6.0 / (c_in + c_out)) ** 0.5
    w = jax.random.uniform(key, (c_in, c_out), dtype, -lim, lim)
    return GCNParams(w=w, b=jnp.zeros((c_out,), dtype))


def gcn_conv(params: GCNParams, x: jax.Array, edge_index: jax.Array) -> jax.Array:
    n = x.shape[0]
    row, col = edge_index[0], edge_index[1]
    deg = segment.segment_count(row, n, dtype=x.dtype) + 1.0  # + self-loop
    dinv = jax.lax.rsqrt(deg)
    h = jnp.dot(x, params.w, preferred_element_type=x.dtype)
    msg = (dinv[col] * dinv[row])[:, None] * h[col]
    out = segment.segment_sum(msg, row, n)
    out = out + dinv[:, None] * dinv[:, None] * h  # identity term
    return out + params.b
