"""Dynamic (in-forward) pooling — full parity for activation-dependent
edge-weight strategies.

The reference's PoolingLayer (code/net_util.py:56-245) recomputes its
coarsening from LAYER ACTIVATIONS on every forward: edge weights by one of
11 strategies (types 3-5 with learnable attention parameters), then
pool_step graclus rounds.  The precomputed static hierarchy (the shipped
default here) approximates those affinities with input features; this
module is the exact-parity mode: weights from live activations (learned
params included), coarsening via the on-device parallel matching
(ops/matching.py), edges coalesced in-graph (ops/coalesce.py).
Per-sample by construction, so dp/dcn data-parallel replication applies
unchanged (Trainer routes it); gp graph-partitioning does not.

Trade-off, by design: every level keeps the padded level-1 array size
(XLA static shapes), so coarse convs do ~4x/16x extra lane work vs the
static mode.  Use it when training the learned pooling types; use the
static hierarchy for production throughput.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from geobignn_tpu.ops import matching
from geobignn_tpu.pool import edge_weight as ew


class DynamicPooling(nn.Module):
    """One PoolingLayer application: weight strategy + pool_step matchings.

    Returns (x_pooled, edge_index, edge_weight, unpool_map); all arrays
    keep their padded sizes, nodes live at representative slots."""

    in_channel: int
    pool_type: str = "max"
    pool_step: int = 2
    edge_weight_type: int = 10
    wei_param: float = 2.0
    rounds: int = 8

    @nn.compact
    def __call__(self, x, edge_index, edge_weight):
        n_pad = x.shape[0]
        att_l = att_r = lin = None
        if self.edge_weight_type in (3, 4, 5):
            att_l = self.param(
                "att_l", nn.initializers.glorot_uniform(), (1, self.in_channel)
            )
            att_r = self.param(
                "att_r", nn.initializers.glorot_uniform(), (1, self.in_channel)
            )
        if self.edge_weight_type in (4, 5):
            dense = nn.Dense(self.in_channel, name="lin")
            lin = lambda v: dense(v)

        w = ew.compute_edge_weight(
            self.edge_weight_type, edge_index, edge_weight, x,
            self.wei_param, att_l, att_r, lin,
        )

        unpool = jnp.arange(n_pad, dtype=jnp.int32)
        for _ in range(self.pool_step):
            # rows_sorted: level-1 graphs are host-sorted; coarser inputs
            # come from pool_edges_with_rep's compacted coalesce
            rep = matching.parallel_matching(
                edge_index, w, n_pad, self.rounds, rows_sorted=True)
            x = matching.pool_with_rep(x, rep, self.pool_type)
            edge_index, w = matching.pool_edges_with_rep(edge_index, w, rep, n_pad)
            unpool = rep[unpool]
        return x, edge_index, w, unpool


class GNNModuleDynamic(nn.Module):
    """The graph U-Net with in-forward pooling (reference GNNModule parity
    for all edge_weight_types).  Consumes only the level-1 graph."""

    pool_type: str = "max"
    heads: int = 9
    edge_weight_type: int = 10
    wei_param: float = 2.0

    @nn.compact
    def __call__(self, x, edge_index, edge_weight, level1=None):
        from geobignn_tpu.models.dual_gnn import FeaStConv, LEAKY_SLOPE
        from geobignn_tpu.structs import GraphLevel

        act = lambda v: nn.leaky_relu(v, LEAKY_SLOPE)
        n_pad = x.shape[0]

        def lvl(ei):
            from geobignn_tpu.ops import segment

            real = ei[0] != ei[1]
            deg = segment.segment_count(
                jnp.where(real, ei[0], n_pad - 1), n_pad
            )
            return GraphLevel(
                edge_index=ei, edge_weight=jnp.zeros(ei.shape[1]), deg=deg,
                node_mask=jnp.ones(n_pad),
            )

        # pooling only changes the COARSE graphs: when the sample carries a
        # precomputed level-1 GraphLevel (dense tables / band mask from
        # attach_tables), the three level-1 convs take the fast formulations
        # while levels 2-3 stay fully dynamic
        lvl1 = level1 if level1 is not None else lvl(edge_index)

        x1 = act(FeaStConv(32, self.heads, rows_sorted=True, name="l_conv1")(x, lvl1))
        x2, ei2, w2, un1 = DynamicPooling(
            32, self.pool_type, 2, self.edge_weight_type, self.wei_param,
            name="pooling1",
        )(x1, edge_index, edge_weight)
        x2 = act(FeaStConv(64, self.heads, rows_sorted=True, name="l_conv2")(x2, lvl(ei2)))
        x3, ei3, w3, un2 = DynamicPooling(
            64, self.pool_type, 2, self.edge_weight_type, self.wei_param,
            name="pooling2",
        )(x2, ei2, w2)
        x3 = act(FeaStConv(128, self.heads, rows_sorted=True, name="l_conv3")(x3, lvl(ei3)))
        x3 = act(FeaStConv(128, self.heads, rows_sorted=True, name="l_conv4")(x3, lvl(ei3)))

        u2 = x3[un2]
        u2 = FeaStConv(64, self.heads, rows_sorted=True, name="r_conv1")(u2, lvl(ei2))
        x2 = jnp.concatenate([x2, u2], axis=1)
        x2 = act(FeaStConv(64, self.heads, rows_sorted=True, name="r_conv2")(x2, lvl(ei2)))

        u1 = x2[un1]
        u1 = FeaStConv(32, self.heads, rows_sorted=True, name="r_conv3")(u1, lvl1)
        x1 = jnp.concatenate([x1, u1], axis=1)
        return act(FeaStConv(32, self.heads, rows_sorted=True, name="r_conv4")(x1, lvl1))


class DualGNNDynamic(nn.Module):
    """DualGNN with dynamic pooling in both branches (any edge_weight_type,
    including the learned 3-5).  Consumes a DualSample but only its level-1
    graphs — no precomputed hierarchy required."""

    force_depth: bool = False
    pool_type: str = "max"
    heads: int = 9
    edge_weight_type: int = 10
    wei_param: float = 2.0

    @nn.compact
    def __call__(self, sample):
        from geobignn_tpu import geometry
        from geobignn_tpu.models.dual_gnn import LEAKY_SLOPE

        act = lambda v: nn.leaky_relu(v, LEAKY_SLOPE)
        xyz = sample.v.x[:, :3]
        gv = GNNModuleDynamic(
            self.pool_type, self.heads, self.edge_weight_type, self.wei_param,
            name="gnn_v",
        )
        feat_v = gv(
            sample.v.x, sample.v.levels[0].edge_index,
            sample.v.levels[0].edge_weight, level1=sample.v.levels[0],
        )
        h = act(nn.Dense(1024, name="fc_v1")(feat_v))
        d = nn.Dense(1 if self.force_depth else 3, name="fc_v2")(h)
        if self.force_depth:
            d = d * sample.v.depth_direction
        vert_p = d + xyz

        face_cent = vert_p[sample.fv_indices].mean(axis=1)
        face_norm = geometry.face_normals(vert_p, sample.fv_indices)
        x_f = jnp.concatenate([sample.f.x, face_cent, face_norm], axis=1)

        gf = GNNModuleDynamic(
            self.pool_type, self.heads, self.edge_weight_type, self.wei_param,
            name="gnn_f",
        )
        feat_f = gf(
            x_f, sample.f.levels[0].edge_index,
            sample.f.levels[0].edge_weight, level1=sample.f.levels[0],
        )
        h = act(nn.Dense(1024, name="fc_f1")(feat_f))
        n = nn.Dense(3, name="fc_f2")(h)
        return vert_p, geometry.safe_normalize(n)
