"""Edge-weight strategies for graph-coarsening affinity.

Capability parity target: the 11 `edge_weight_type` strategies (-1..10) of
the reference's PoolingLayer (code/net_util.py:160-240).  The shipped model
uses type 10: stored bilateral weight + exp(-||x_i - x_j||^2 / 2).

Two call sites:
  * host (numpy) — when building precomputed pooling hierarchies at data
    prep time.  Types that depend on *layer activations* (1,2,5,7..10) are
    evaluated on a feature proxy (the input node features, pooled along the
    hierarchy), and types needing learned parameters (3,4,5) degrade to the
    stored weight — the static hierarchy is a pooling *policy*, and cluster
    quality, not identity, is the contract (see SURVEY §3.5);
  * device (JAX) — for the dynamic on-device matching mode, where all types
    including the learned-attention ones (3-5) are exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _minmax(w, eps=1e-12):
    mod = jnp if isinstance(w, jax.Array) else np
    return (w - w.min()) / (w.max() - w.min() + eps)


def _feat_gauss(x, edge_index, param):
    mod = jnp if isinstance(x, jax.Array) else np
    d = x[edge_index[0]] - x[edge_index[1]]
    return mod.exp((d * d).sum(-1) / (-param))


def _gat_scores(x, edge_index, att_l, att_r):
    """Symmetrized GAT-style attention logit -> sigmoid."""
    mod = jnp if isinstance(x, jax.Array) else np
    al = (x * att_l).sum(-1)
    ar = (x * att_r).sum(-1)
    row, col = edge_index[0], edge_index[1]
    alpha = (al[row] + ar[col]) + (al[col] + ar[row])
    return 1.0 / (1.0 + mod.exp(-alpha))


def compute_edge_weight(
    weight_type: int,
    edge_index,
    stored_weight,
    x=None,
    wei_param: float = 2.0,
    att_l=None,
    att_r=None,
    lin=None,
):
    """Evaluate one strategy; works on numpy or jax arrays.

    edge_index: (2, E) with NO self-loops (the reference strips them before
    weighting, code/net_util.py:163)."""
    t = weight_type
    if t == -1:
        return None  # random matching
    if t == 0:
        return stored_weight
    if t == 1:
        return _feat_gauss(x, edge_index, wei_param)
    if t == 2:
        return stored_weight * _feat_gauss(x, edge_index, wei_param)
    if t in (3, 4, 5):
        if att_l is None:  # host fallback for learned types
            return stored_weight
        xx = x
        if t in (4, 5) and lin is not None:
            xx = jax.nn.leaky_relu(lin(x), 0.2)
        w = _gat_scores(xx, edge_index, att_l, att_r)
        return (w + stored_weight) / 2.0 if t == 5 else w
    if t == 6:
        return _minmax(stored_weight)
    if t == 7:
        d = x[edge_index[0]] - x[edge_index[1]]
        return _minmax(-(d * d).sum(-1))
    if t == 8:
        return _minmax(_feat_gauss(x, edge_index, 2.0))
    if t == 9:
        return _minmax(stored_weight) + _minmax(_feat_gauss(x, edge_index, 2.0))
    if t == 10:  # shipped default
        return stored_weight + _feat_gauss(x, edge_index, 2.0)
    raise ValueError(f"unknown edge_weight_type {t}")
