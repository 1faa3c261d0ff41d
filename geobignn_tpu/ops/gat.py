"""GAT convolution — per-edge attention with segment softmax.

Capability parity target: torch_geometric GATConv as used by the legacy
GATGNN (code/network.py:108-124).  Per head h:

    e_ij   = LeakyReLU(a_l . W_h x_i + a_r . W_h x_j, 0.2)
    alpha  = softmax over j in N(i) ∪ {i}
    out_i  = concat_h sum_j alpha_ij W_h x_j

The numerically stable segment softmax (max-shift, exp, segment-sum
normalize) is exposed separately — it is the building block for any
edge-softmax op.  Implicit self-loops; trash-padding contract as usual
(padded edges attend into the trash row only)."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from geobignn_tpu.ops import segment


def segment_softmax(scores: jax.Array, seg_ids: jax.Array, num_segments: int):
    """Softmax of `scores` (E, ...) grouped by seg_ids."""
    m = jax.ops.segment_max(scores, seg_ids, num_segments=num_segments)
    m = jnp.where(jnp.isneginf(m), 0.0, m)
    e = jnp.exp(scores - m[seg_ids])
    denom = segment.segment_sum(e, seg_ids, num_segments)
    return e / jnp.maximum(denom[seg_ids], 1e-16)


class GATParams(NamedTuple):
    w: jax.Array  # (C_in, H, C_out)
    a_l: jax.Array  # (H, C_out)
    a_r: jax.Array  # (H, C_out)
    b: jax.Array  # (H * C_out,)


def init_gat_params(key, c_in, c_out, heads, dtype=jnp.float32) -> GATParams:
    k1, k2, k3 = jax.random.split(key, 3)
    lim = (6.0 / (c_in + c_out)) ** 0.5
    return GATParams(
        w=jax.random.uniform(k1, (c_in, heads, c_out), dtype, -lim, lim),
        a_l=jax.random.normal(k2, (heads, c_out), dtype) * 0.1,
        a_r=jax.random.normal(k3, (heads, c_out), dtype) * 0.1,
        b=jnp.zeros((heads * c_out,), dtype),
    )


def gat_conv(
    params: GATParams, x: jax.Array, edge_index: jax.Array, slope: float = 0.2
) -> jax.Array:
    n = x.shape[0]
    heads, c_out = params.a_l.shape
    row, col = edge_index[0], edge_index[1]
    # add implicit self-loops by concatenating a loop edge per node
    loops = jnp.arange(n, dtype=row.dtype)
    row = jnp.concatenate([row, loops])
    col = jnp.concatenate([col, loops])

    h = jnp.einsum("nc,cho->nho", x, params.w)  # (N, H, C_out)
    al = (h * params.a_l).sum(-1)  # (N, H)
    ar = (h * params.a_r).sum(-1)
    e = jax.nn.leaky_relu(al[row] + ar[col], slope)  # (E+N, H)
    alpha = segment_softmax(e, row, n)
    msg = alpha[:, :, None] * h[col]
    out = segment.segment_sum(msg, row, n)  # (N, H, C_out)
    return out.reshape(n, heads * c_out) + params.b
