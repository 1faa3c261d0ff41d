"""Device-side graph containers: immutable pytrees with static padded shapes.

The reference flows `torch_geometric.data.Data` objects with data-dependent
shapes through the model (code/dataset.py:217-229); under XLA that would
recompile every step.  Here every array is padded to a static size from a
`SizePlan`, with one reserved TRASH slot per axis:

  * padded edges carry row == col == trash node        -> scatters land in
    the trash row, gathers read the zero trash features;
  * padded cluster/unpool entries point at the coarse trash slot;
  * padded faces index the trash vertex (zero cross products).

Under this convention no per-op masks are needed inside the network; only
losses/metrics mask (via `node_mask`).  A whole dual U-Net forward+backward
compiles to a single XLA program per SizePlan; samples that share a plan
share the compile (plans are bucketed, or maxed over a dataset for a single
compile).
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from flax import struct


def round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class BranchSizes:
    """Padded sizes for one branch (vertex or facet) of the dual graph.

    n1/e1: finest level nodes/edges; m1: after pooling-layer-1 step 1;
    n2/e2: level 2; m2: after pooling-layer-2 step 1; n3/e3: level 3."""

    n1: int
    e1: int
    m1: int
    n2: int
    e2: int
    m2: int
    n3: int
    e3: int

    @staticmethod
    def plan(counts: dict, granularity: int = 128) -> "BranchSizes":
        g = granularity
        return BranchSizes(
            **{k: round_up(int(v) + 1, g) for k, v in counts.items()}
        )

    def merge(self, other: "BranchSizes") -> "BranchSizes":
        return BranchSizes(
            *[max(a, b) for a, b in zip(dataclasses.astuple(self), dataclasses.astuple(other))]
        )


@dataclasses.dataclass(frozen=True)
class SizePlan:
    v: BranchSizes
    f: BranchSizes

    def merge(self, other: "SizePlan") -> "SizePlan":
        return SizePlan(self.v.merge(other.v), self.f.merge(other.f))


class GraphLevel(struct.PyTreeNode):
    """One resolution level of a graph: trash-padded COO edges + per-node
    metadata.  N_pad == node_mask.shape[0]; trash slot == N_pad - 1.

    The optional dense-table fields (ops/table.py) enable the scatter-free
    FeaStConv fast path; `data.builder.attach_tables` fills them."""

    edge_index: jax.Array  # (2, E_pad) int32
    edge_weight: jax.Array  # (E_pad,) f32, 0 on padding
    deg: jax.Array  # (N_pad,) f32 — real-edge in-degree
    node_mask: jax.Array  # (N_pad,) f32 — 1.0 on valid nodes
    nbr: jax.Array | None = None  # (N_pad, K) int32 neighbor table
    kmask: jax.Array | None = None  # (N_pad, K) f32
    rev: jax.Array | None = None  # (N_pad, R) int32 reverse table
    band: jax.Array | None = None  # (B, T, W) int8 window mask for the
    # gather-free banded/block-sparse FeaStConv (ops/banded*.py W=3T, or
    # ops/blocksparse.py W=K*T when blk_idx is set; needs RCM node order)
    blk_idx: jax.Array | None = None  # (B, K) int32 column-block ids for
    # the block-sparse formulation (None = contiguous 3T band)
    # hybrid band+boundary mode (ops/banded.hybrid_arrays_np, slab-RCM
    # order): band holds the in-window edges, the compact tables below the
    # out-of-window rest — additive because the FeaSt softmax is per-edge
    rows_b: jax.Array | None = None  # (M_b,) int32 boundary rows
    nbr_b: jax.Array | None = None  # (M_b, K_b) int32 boundary neighbors
    kmask_b: jax.Array | None = None  # (M_b, K_b) f32
    src_b: jax.Array | None = None  # (S_b,) int32 distinct boundary sources
    rev_b: jax.Array | None = None  # (S_b, R_b) int32 compact reverse table
    # banded sub-graph correction (ops/banded.boundary_band_np) — the
    # preferred boundary mode; the compact tables above are the fallback
    # when the boundary sub-graph's own bandwidth is too large
    jnodes: jax.Array | None = None  # (S,) int32 boundary nodes, sub-RCM
    jband: jax.Array | None = None  # (Bs, Ts, 3Ts) int8 sub-band mask
    jpos: jax.Array | None = None  # (n_band,) int32 inverse of jnodes
    # (sentinel S elsewhere) — gather-only scatter transposes


class PoolStep(struct.PyTreeNode):
    """One coarsening round: fine-slot -> coarse-slot scatter map.

    With the optional member tables the reduction becomes a gather over
    <=m_pad members per coarse slot (scatter-free both directions)."""

    cluster: jax.Array  # (N_in_pad,) int32; padding -> coarse trash
    n_out: int = struct.field(pytree_node=False)  # coarse padded size (static)
    members: jax.Array | None = None  # (n_out, m_pad) int32 fine slots
    mmask: jax.Array | None = None  # (n_out, m_pad) f32
    rev: jax.Array | None = None  # (N_in_pad, 1) int32 position in members


class BranchGraph(struct.PyTreeNode):
    """One full branch: features, 3 levels, 4 pooling steps, 2 unpool maps."""

    x: jax.Array  # (N1_pad, C)
    y: jax.Array | None  # (N1_pad, 3) target (positions / normals)
    levels: tuple[GraphLevel, GraphLevel, GraphLevel]
    steps: tuple[PoolStep, PoolStep, PoolStep, PoolStep]
    unpool1: jax.Array  # (N1_pad,) int32 -> level-2 slot
    unpool2: jax.Array  # (N2_pad,) int32 -> level-3 slot
    depth_direction: jax.Array | None = None  # (N1_pad, 3) Kinect depth rays
    unpool1_rev: jax.Array | None = None  # (N2_pad, R) scatter-free unpool bwd
    unpool2_rev: jax.Array | None = None  # (N3_pad, R)


class DualSample(struct.PyTreeNode):
    """A vertex-branch + facet-branch pair with the cross-domain coupling."""

    v: BranchGraph
    f: BranchGraph
    fv_indices: jax.Array  # (Nf_pad, 3) int32 into padded vertex slots
    edge_dual_v: jax.Array  # (3Ff_pad,) vertex side of incidence pairs
    edge_dual_f: jax.Array  # (3Ff_pad,) face side of incidence pairs
    centroid: jax.Array  # (1, 3)
    scale: jax.Array  # () f32
    fv_rev: jax.Array | None = None  # (Nv_pad, R) scatter-free fv-gather bwd


# --------------------------------------------------------------------------
# host-side padding helpers (numpy in, numpy out)
# --------------------------------------------------------------------------

def pad_rows(arr: np.ndarray, size: int, fill=0):
    out = np.full((size,) + arr.shape[1:], fill, dtype=arr.dtype)
    out[: arr.shape[0]] = arr
    return out


def pad_edges(edge_index: np.ndarray, e_pad: int, trash: int) -> np.ndarray:
    out = np.full((2, e_pad), trash, dtype=np.int32)
    out[:, : edge_index.shape[1]] = edge_index
    return out


def make_level(
    edge_index: np.ndarray,
    edge_weight: np.ndarray | None,
    n_valid: int,
    n_pad: int,
    e_pad: int,
) -> GraphLevel:
    assert n_valid < n_pad, f"no trash slot: {n_valid} >= {n_pad}"
    assert edge_index.shape[1] <= e_pad, "edge overflow"
    trash = n_pad - 1
    deg = np.zeros(n_pad, dtype=np.float32)
    np.add.at(deg, edge_index[0].astype(np.int64), 1.0)
    mask = np.zeros(n_pad, dtype=np.float32)
    mask[:n_valid] = 1.0
    w = np.zeros(edge_index.shape[1], np.float32) if edge_weight is None else edge_weight
    return GraphLevel(
        edge_index=pad_edges(edge_index, e_pad, trash),
        edge_weight=pad_rows(w.astype(np.float32), e_pad),
        deg=deg,
        node_mask=mask,
    )


def make_pool_step(cluster: np.ndarray, n_in_pad: int, n_out_pad: int) -> PoolStep:
    c = np.full(n_in_pad, n_out_pad - 1, dtype=np.int32)
    c[: cluster.shape[0]] = cluster
    return PoolStep(cluster=c, n_out=n_out_pad)


def make_index_map(idx: np.ndarray, n_in_pad: int, n_out_pad: int) -> np.ndarray:
    out = np.full(n_in_pad, n_out_pad - 1, dtype=np.int32)
    out[: idx.shape[0]] = idx
    return out
