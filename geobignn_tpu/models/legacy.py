"""Legacy model family (capability preservation; reference C19).

These models are dead code in the reference's shipped training path but part
of its API surface (code/network.py:30-250): FacetAttentionGNN (GCN +
global-max-pool channel attention, facet-only), GATGNN (GAT U-Net),
FGCNet (FeaStConv U-Net with functional pooling, slope 0.1), and
FeaStGNN_PrePool (6-head FeaStConv U-Net over precomputed pooling — whose
precomputed-hierarchy idea is exactly what this framework generalizes).

All consume a BranchGraph (static pooling hierarchy) — the functional /
precomputed pooling distinction of the reference collapses here because
every hierarchy is precomputed."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from geobignn_tpu import geometry
from geobignn_tpu.models.dual_gnn import FeaStConv, pool_features
from geobignn_tpu.ops.gat import GATParams, gat_conv, init_gat_params
from geobignn_tpu.ops.gcn import GCNParams, gcn_conv, init_gcn_params
from geobignn_tpu.structs import BranchGraph


class GCNLayer(nn.Module):
    c_out: int

    @nn.compact
    def __call__(self, x, level):
        c_in = x.shape[-1]
        w = self.param("w", nn.initializers.glorot_uniform(), (c_in, self.c_out))
        b = self.param("b", nn.initializers.zeros, (self.c_out,))
        return gcn_conv(GCNParams(w, b), x, level.edge_index)


class GATLayer(nn.Module):
    c_out: int
    heads: int = 2

    @nn.compact
    def __call__(self, x, level):
        c_in = x.shape[-1]
        p = GATParams(
            self.param("w", nn.initializers.glorot_uniform(), (c_in, self.heads, self.c_out)),
            self.param("a_l", lambda k, s: jax.random.normal(k, s) * 0.1, (self.heads, self.c_out)),
            self.param("a_r", lambda k, s: jax.random.normal(k, s) * 0.1, (self.heads, self.c_out)),
            self.param("b", nn.initializers.zeros, (self.heads * self.c_out,)),
        )
        return gat_conv(p, x, level.edge_index)


class FacetAttentionGNN(nn.Module):
    """GCN encoder + global-feature channel attention; predicts normals."""

    @nn.compact
    def __call__(self, branch: BranchGraph, x: jax.Array) -> jax.Array:
        l1 = branch.levels[0]
        mask = l1.node_mask[:, None]
        feat = nn.relu(GCNLayer(16, name="gcn1")(x, l1))
        feat = nn.relu(GCNLayer(32, name="gcn3")(feat, l1))

        g = nn.relu(nn.Dense(64, name="g1")(feat))
        g = nn.relu(nn.Dense(128, name="g2")(g))
        # masked global max pool, broadcast back
        g_max = jnp.where(mask > 0, g, -jnp.inf).max(axis=0)
        g = jnp.broadcast_to(g_max, g.shape)
        aug = jnp.concatenate([feat, g], axis=1)
        aug = nn.relu(nn.Dense(128, name="f1")(aug))
        aug = nn.relu(nn.Dense(32, name="f2")(aug))

        diff = feat - aug
        diff = nn.relu(nn.Dense(32, name="d1")(diff))
        diff = nn.relu(nn.Dense(32, name="d2")(diff))
        chan = jnp.stack([diff.max(axis=1), diff.mean(axis=1)], axis=1)
        att = nn.relu(nn.Dense(32, name="a1")(chan))
        att = nn.Dense(1, name="a2")(att)
        aug = aug * jax.nn.sigmoid(att)

        aug = GCNLayer(32, name="gcn5")(aug, l1)
        aug = GCNLayer(128, name="gcn6")(aug, l1)
        aug = nn.Dense(32, name="fc1")(aug)
        aug = nn.Dense(3, name="fc2")(aug)
        return geometry.safe_normalize(aug)


class _UNetBase(nn.Module):
    """Shared U-Net skeleton for the legacy conv families."""

    slope: float = 0.1

    def make_conv(self, c: int, name: str):
        raise NotImplementedError

    def unet(self, branch: BranchGraph, x):
        l1, l2, l3 = branch.levels
        act = lambda v: nn.leaky_relu(v, self.slope)
        x1 = act(self.make_conv(32, "l_conv1")(x, l1))
        x2 = pool_features(x1, branch.steps[0:2], "max")
        x2 = act(self.make_conv(64, "l_conv2")(x2, l2))
        x3 = pool_features(x2, branch.steps[2:4], "max")
        x3 = act(self.make_conv(128, "l_conv3")(x3, l3))
        x3 = act(self.make_conv(128, "l_conv4")(x3, l3))
        u2 = self.make_conv(64, "r_conv1")(x3[branch.unpool2], l2)
        x2 = act(self.make_conv(64, "r_conv2")(jnp.concatenate([x2, u2], 1), l2))
        u1 = self.make_conv(32, "r_conv3")(x2[branch.unpool1], l1)
        return act(self.make_conv(32, "r_conv4")(jnp.concatenate([x1, u1], 1), l1))


class FGCNet(_UNetBase):
    """FeaStConv U-Net (9 heads, slope 0.1) -> unit normals."""

    def make_conv(self, c, name):
        return FeaStConv(c, 9, name=name)

    @nn.compact
    def __call__(self, branch: BranchGraph, x: jax.Array) -> jax.Array:
        h = self.unet(branch, x)
        h = nn.leaky_relu(nn.Dense(1024, name="fc1")(h), self.slope)
        return geometry.safe_normalize(nn.Dense(3, name="fc2")(h))


class FeaStGNNPrePool(_UNetBase):
    """6-head FeaStConv U-Net over the precomputed hierarchy."""

    def make_conv(self, c, name):
        return FeaStConv(c, 6, name=name)

    @nn.compact
    def __call__(self, branch: BranchGraph, x: jax.Array) -> jax.Array:
        h = self.unet(branch, x)
        h = nn.leaky_relu(nn.Dense(512, name="fc1")(h), self.slope)
        return geometry.safe_normalize(nn.Dense(3, name="fc2")(h))


class GATGNN(_UNetBase):
    """GAT U-Net (2 heads) -> tanh -> unit normals."""

    def make_conv(self, c, name):
        return GATLayer(c, 2, name=name)

    @nn.compact
    def __call__(self, branch: BranchGraph, x: jax.Array) -> jax.Array:
        h = self.unet(branch, x)
        h = nn.relu(nn.Dense(512, name="fc1")(h))
        h = nn.relu(nn.Dense(128, name="fc2")(h))
        h = jnp.tanh(nn.Dense(3, name="fc3")(h))
        return geometry.safe_normalize(h)
