"""DualFusionLayer — symmetric cross-domain feature exchange.

Capability parity target: code/net_util.py:248-278 (imported by the shipped
model but never instantiated — preserved here as an optional fusion mode,
per SURVEY C15).  Each side aggregates the other domain's features across
the vertex<->facet incidence pairs (scatter-mean), concatenates, and mixes
through two dense layers."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from geobignn_tpu.ops import segment
from geobignn_tpu.structs import DualSample


class DualFusionLayer(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x_v: jax.Array, x_f: jax.Array, sample: DualSample):
        n_v, n_f = x_v.shape[0], x_f.shape[0]
        ev, ef = sample.edge_dual_v, sample.edge_dual_f

        # vertex side: mean of incident faces' features
        from_f = segment.segment_mean(x_f[ef], ev, n_v)
        # facet side: mean of corner vertices' features
        from_v = segment.segment_mean(x_v[ev], ef, n_f)

        act = lambda v: nn.leaky_relu(v, 0.2)
        h_v = jnp.concatenate([x_v, from_f], axis=1)
        h_v = act(nn.Dense(self.features, name="lin_v1")(h_v))
        h_v = act(nn.Dense(self.features, name="lin_v2")(h_v))
        h_f = jnp.concatenate([x_f, from_v], axis=1)
        h_f = act(nn.Dense(self.features, name="lin_f1")(h_f))
        h_f = act(nn.Dense(self.features, name="lin_f2")(h_f))
        return h_v, h_f
