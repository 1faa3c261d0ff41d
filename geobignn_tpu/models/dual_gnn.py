"""The shipped model family: graph U-Net branches + bi-domain cascade.

Capability parity targets:
  * GNNModule — the FeaStConv encoder/decoder with 2 pooling layers and
    copy-back unpooling + skip concats (code/network.py:254-300);
  * DualGNN — vertex branch regresses residual positions; facet features
    are rebuilt from the *denoised* vertices (differentiable centroids +
    cross-product normals, the cross-domain coupling); facet branch
    regresses unit normals (code/network.py:303-343), with the
    `force_depth` Kinect head (out = scalar * depth_direction).

TPU re-design: pooling consumes precomputed static PoolStep scatter maps
(no in-forward graclus); shapes are static per SizePlan; the trash-slot
padding convention (structs.py) removes all in-network masking.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from geobignn_tpu import geometry
from geobignn_tpu.ops import segment
from geobignn_tpu.ops import table as tbl
from geobignn_tpu.ops.feastconv import FeastParams, feast_conv, feast_conv_table
from geobignn_tpu.structs import BranchGraph, DualSample, GraphLevel, PoolStep

LEAKY_SLOPE = 0.2  # reference uses F.leaky_relu(x, 0.2) throughout

# Canonical conv channel schedule of one GNNModule branch, in call order:
# (param name, level index 0/1/2, c_in, c_out).  c_in None = branch input
# width (6 for the vertex branch, 12 for the facet branch).  Consumed by
# parallel/accounting.py (comm-volume model) and pinned against the real
# initialized parameter shapes in tests/test_accounting.py so it cannot
# silently drift from the module below.
CONV_SCHEDULE = (
    ("l_conv1", 0, None, 32),
    ("l_conv2", 1, 32, 64),
    ("l_conv3", 2, 64, 128),
    ("l_conv4", 2, 128, 128),
    ("r_conv1", 1, 128, 64),
    ("r_conv2", 1, 128, 64),
    ("r_conv3", 0, 64, 32),
    ("r_conv4", 0, 64, 32),
)


def _steer_init(scale=0.1):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * scale

    return init


class FeaStConv(nn.Module):
    """Linen wrapper over ops.feastconv with per-head Glorot weights."""

    c_out: int
    heads: int = 9
    gp_axis: str | None = None  # edge-partition mesh axis (graph parallel)
    remat: bool = True  # recompute gathers in backward (AD residuals of the
    # per-conv (E, C) gathered features otherwise dominate HBM on big meshes)
    rows_sorted: bool = True  # host-built GraphLevels are row-sorted; the
    # dynamic-pooling path passes False (coalesced edges are not)

    @nn.compact
    def __call__(self, x: jax.Array, level: GraphLevel) -> jax.Array:
        c_in = x.shape[-1]
        u = self.param("u", _steer_init(), (c_in, self.heads))
        c = self.param("c", nn.initializers.zeros, (self.heads,))
        w = self.param(
            "w", nn.initializers.glorot_uniform(), (self.heads, c_in, self.c_out)
        )
        b = self.param("b", nn.initializers.zeros, (self.c_out,))
        p = FeastParams(u=u.astype(x.dtype), c=c.astype(x.dtype),
                        w=w.astype(x.dtype), b=b.astype(x.dtype))

        def conv(p_, x_):
            if level.band is not None and self.gp_axis is None:
                # gather-free Pallas paths with custom VJPs; no remat needed
                # — the kernels recompute their (T, W) intermediates
                # in-backward.  blk_idx set -> block-sparse windows
                # (ops/blocksparse.py, no bandwidth limit); else contiguous
                # band (ops/banded_pallas.py)
                n1 = x_.shape[0]
                n_band = level.band.shape[0] * level.band.shape[1]
                xp = jnp.pad(x_, ((0, n_band - n1), (0, 0)))
                dp = jnp.pad(level.deg.astype(jnp.float32), (0, n_band - n1))
                if level.blk_idx is not None:
                    from geobignn_tpu.ops import blocksparse

                    out = blocksparse.feast_conv_blocksparse(
                        p_, xp, level.band, level.blk_idx, dp
                    )[:n1].astype(x_.dtype)
                elif level.jnodes is not None:
                    # band + banded-sub-graph hybrid (slab-RCM order):
                    # boundary edges run the SAME kernel at a tiny tile
                    from geobignn_tpu.ops import banded_pallas

                    out = banded_pallas.feast_conv_hybrid_band(
                        p_, xp, level.band, level.jnodes, level.jband,
                        level.jpos, dp,
                    )[:n1].astype(x_.dtype)
                elif level.nbr_b is not None:
                    # band + boundary-table hybrid (fallback when the
                    # boundary sub-graph's own bandwidth is too large)
                    from geobignn_tpu.ops import banded_pallas

                    out = banded_pallas.feast_conv_hybrid(
                        p_, xp, level.band, level.rows_b, level.nbr_b,
                        level.kmask_b, level.src_b, level.rev_b, dp,
                    )[:n1].astype(x_.dtype)
                else:
                    from geobignn_tpu.ops import banded_pallas

                    out = banded_pallas.feast_conv_banded_pallas(
                        p_, xp, level.band, dp
                    )[:n1].astype(x_.dtype)
            elif level.nbr is not None and self.gp_axis is None:
                # scatter-free dense-table fast path (ops/table.py)
                out = feast_conv_table(
                    p_, x_, level.nbr, level.kmask, level.rev,
                    deg=level.deg.astype(x.dtype),
                )
            else:
                out = feast_conv(
                    p_, x_, level.edge_index,
                    deg=None if self.gp_axis else level.deg.astype(x.dtype),
                    psum_axis=self.gp_axis,
                    rows_sorted=self.rows_sorted,
                )
            # restore the zero-trash invariant: the bias/self terms make
            # padded lanes nonzero, and the trash lane would otherwise
            # accumulate ALL padded (trash->trash) edges with deg 0 —
            # an unnormalized sum that amplifies ~E_pad per conv and
            # overflows f32 within a few layers (masked losses then see
            # 0 * inf = NaN)
            return out * level.node_mask.astype(out.dtype)[:, None]

        if self.remat and level.band is None:
            # banded path excluded: its custom VJP already recomputes the
            # (T, W) intermediates in-kernel, and its AD residuals are only
            # (N, H) strips — checkpointing would just run the fwd twice
            conv = jax.checkpoint(conv)
        return conv(p, x)


def pool_features(
    x: jax.Array, steps: tuple[PoolStep, ...], pool_type: str = "max"
) -> jax.Array:
    """Apply coarsening rounds as segment reductions over static maps, or —
    when member tables are attached — as scatter-free member gathers."""
    for st in steps:
        if st.members is not None:
            if pool_type == "max":
                x = tbl.gather_pool_max(x, st.members, st.rev, st.mmask)
            elif pool_type == "mean":
                x = tbl.gather_pool_mean(x, st.members, st.rev, st.mmask)
            else:
                raise ValueError(pool_type)
        elif pool_type == "max":
            x = segment.segment_max(x, st.cluster, st.n_out)
        elif pool_type == "mean":
            x = segment.segment_mean(x, st.cluster, st.n_out)
        else:
            raise ValueError(pool_type)
    return x


class GNNModule(nn.Module):
    """FeaStConv U-Net: 32 -> (pool) 64 -> (pool) 128 -> 128, then unpool
    with skip concatenation back to 32 output channels."""

    pool_type: str = "max"
    heads: int = 9
    gp_axis: str | None = None
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, branch: BranchGraph, x: jax.Array) -> jax.Array:
        x = x.astype(self.compute_dtype)
        l1, l2, l3 = branch.levels
        act = lambda v: nn.leaky_relu(v, LEAKY_SLOPE)

        x1 = act(FeaStConv(32, self.heads, self.gp_axis, name="l_conv1")(x, l1))
        x2 = pool_features(x1, branch.steps[0:2], self.pool_type)
        x2 = act(FeaStConv(64, self.heads, self.gp_axis, name="l_conv2")(x2, l2))
        x3 = pool_features(x2, branch.steps[2:4], self.pool_type)
        x3 = act(FeaStConv(128, self.heads, self.gp_axis, name="l_conv3")(x3, l3))
        x3 = act(FeaStConv(128, self.heads, self.gp_axis, name="l_conv4")(x3, l3))

        # copy-back unpooling (gather; scatter-free backward via rev tables)
        if branch.unpool2_rev is not None:
            u2 = tbl.gather_unpool(x3, branch.unpool2, branch.unpool2_rev)
        else:
            u2 = x3[branch.unpool2]
        u2 = FeaStConv(64, self.heads, self.gp_axis, name="r_conv1")(u2, l2)
        x2 = jnp.concatenate([x2, u2], axis=1)
        x2 = act(FeaStConv(64, self.heads, self.gp_axis, name="r_conv2")(x2, l2))

        if branch.unpool1_rev is not None:
            u1 = tbl.gather_unpool(x2, branch.unpool1, branch.unpool1_rev)
        else:
            u1 = x2[branch.unpool1]
        u1 = FeaStConv(32, self.heads, self.gp_axis, name="r_conv3")(u1, l1)
        x1 = jnp.concatenate([x1, u1], axis=1)
        return act(FeaStConv(32, self.heads, self.gp_axis, name="r_conv4")(x1, l1))


class DualGNN(nn.Module):
    """Bi-domain cascade; returns (vertex_positions, face_normals)."""

    force_depth: bool = False
    pool_type: str = "max"
    heads: int = 9
    gp_axis: str | None = None
    fusion: int = 0  # >0: run a DualFusionLayer of this width over the
    # vertex<->facet incidence (sample.edge_dual_*) and CONCAT the fused
    # features onto both branch inputs — the reference preserves the layer
    # but never instantiates it (code/net_util.py:248-278, SURVEY C15);
    # this makes it a usable opt-in mode (Config.fusion_features)
    compute_dtype: jnp.dtype = jnp.float32  # bf16 activations; f32 params,
    # residual/geometry (cross products, normalize) and losses stay f32.
    # NOTE (measured on v5e): keep the default — XLA's bf16 scatter-add path
    # is pathologically slow (3.3 s/step vs 0.98 ms at f32), and f32 matmuls
    # already ride bf16 MXU passes, so bf16 activations buy nothing here.
    # The mode exists for numerics experiments, not throughput.
    fc_chunk_rows: int = 1 << 18  # fc heads nn.scan over row chunks when
    # N exceeds this (the (N, 1024) hidden was the largest allocation of
    # the 1.31M-face step, 2.5 GB); numerically identity — rows are
    # independent (tests/test_model.py::test_chunked_heads_match)
    fc_dtype: jnp.dtype | None = None  # override for the fc HEADS only
    # (None -> compute_dtype).  The heads are dense (N,32)x(32,1024)x
    # (1024,3) matmuls with no scatter in their path, so bf16 here dodges
    # the scatter pathology above; parity-insensitive (params stay f32,
    # outputs cast back).  Measured via GBN_FC_BF16=1 in bench.py.

    @nn.compact
    def __call__(self, sample: DualSample) -> tuple[jax.Array, jax.Array]:
        act = lambda v: nn.leaky_relu(v, LEAKY_SLOPE)
        dt = self.compute_dtype
        xyz = sample.v.x[:, :3]

        # fc heads run under remat: the (N, 1024) pre-act/act residuals are
        # ~2 GB of f32 HBM round-trips per step at bench scale, while the
        # recompute is two dense matmuls (~0.3 ms) — measured win in
        # bench.py.  nn.remat on a (module, x) function keeps the param
        # tree (fc_*1/fc_*2) unchanged.
        fdt = self.fc_dtype or dt

        def head_v(mdl, feat):
            h = act(nn.Dense(1024, dtype=fdt, name="fc_v1")(feat))
            out_dim = 1 if mdl.force_depth else 3
            return nn.Dense(out_dim, dtype=fdt, name="fc_v2")(h)

        def head_f(mdl, feat):
            h = act(nn.Dense(1024, dtype=fdt, name="fc_f1")(feat))
            return nn.Dense(3, dtype=fdt, name="fc_f2")(h)

        def run_head(head_fn, feat):
            """remat'd head; for very large N additionally nn.scan over
            row chunks so the (chunk, 1024) hidden never materializes at
            full N — the f-branch head temp alone is 2.5 GB at 1.31M
            faces (the single largest allocation in the OOM'd 1M-mesh
            step).  Chunking changes nothing numerically (rows are
            independent) and the reshape requires only divisibility."""
            n = feat.shape[0]
            n_chunks = 1
            while (n // n_chunks > self.fc_chunk_rows
                   and n % (n_chunks * 2) == 0 and n_chunks < 32):
                n_chunks *= 2
            if n_chunks == 1:
                return nn.remat(head_fn)(self, feat)

            def body(mdl, carry, xs):
                return carry, head_fn(mdl, xs)

            _, out = nn.scan(
                nn.remat(body),
                variable_broadcast="params",
                split_rngs={"params": False},
            )(self, 0, feat.reshape(n_chunks, n // n_chunks, feat.shape[1]))
            return out.reshape(n, -1)

        h_v = h_f = None
        if self.fusion:
            from geobignn_tpu.models.fusion import DualFusionLayer

            h_v, h_f = DualFusionLayer(self.fusion, name="fusion")(
                sample.v.x, sample.f.x, sample
            )
        x_v_in = (
            jnp.concatenate([sample.v.x, h_v], axis=1)
            if h_v is not None
            else sample.v.x
        )
        feat_v = GNNModule(
            self.pool_type, self.heads, self.gp_axis, dt, name="gnn_v"
        )(sample.v, x_v_in)
        d = run_head(head_v, feat_v).astype(jnp.float32)
        if self.force_depth:
            d = d * sample.v.depth_direction
        vert_p = d + xyz

        # rebuild facet features from the denoised vertices (differentiable,
        # f32 — cross products are cancellation-sensitive)
        if sample.fv_rev is not None:  # scatter-free corner-gather backward
            corners = tbl.table_gather(vert_p, sample.fv_indices, sample.fv_rev)
            face_cent = corners.mean(axis=1)
            face_norm = geometry.safe_normalize(
                jnp.cross(corners[:, 1] - corners[:, 0], corners[:, 2] - corners[:, 0])
            )
        else:
            face_cent = vert_p[sample.fv_indices].mean(axis=1)
            face_norm = geometry.face_normals(vert_p, sample.fv_indices)
        parts_f = [sample.f.x, face_cent, face_norm]
        if h_f is not None:
            parts_f.append(h_f)
        x_f = jnp.concatenate(parts_f, axis=1)

        feat_f = GNNModule(
            self.pool_type, self.heads, self.gp_axis, dt, name="gnn_f"
        )(sample.f, x_f)
        n = run_head(head_f, feat_f).astype(jnp.float32)
        norm_p = geometry.safe_normalize(n)
        return vert_p, norm_p
