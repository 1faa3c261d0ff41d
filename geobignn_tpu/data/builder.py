"""Build padded device-ready DualSamples from raw meshes.

The TPU-native counterpart of the reference's preprocessing
(code/dataset.py:196-243 `process_one_submesh` + :245-269
`post_processing`), fused into one host pass that additionally precomputes
the pooling hierarchies and pads everything to a `SizePlan`:

  vertex graph: x = [(pos - centroid) * scale, vertex_normal] (6),
                1-ring undirected edges (self-loops implicit),
                bilateral weights on raw positions, y = normalized GT pos;
  facet graph:  x = [(face_centroid - centroid) * scale, face_normal] (6),
                faces-sharing-a-vertex edges, bilateral weights on raw
                centroids, y = GT face normals;
  plus fv_indices (cross-domain gather), vertex<->facet incidence pairs,
  depth_direction for Kinect-style data, and 2x2-step pooling hierarchies
  per branch.

Deliberate deviations from the reference, documented:
  * pooling hierarchies are precomputed with seeded deterministic matching
    (see pool/hierarchy.py) instead of per-forward graclus;
  * activation-dependent pooling affinities use input features as proxy.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from geobignn_tpu import geometry, graphs, structs
from geobignn_tpu.meshio import TriMesh
from geobignn_tpu.pool import hierarchy as H


@dataclasses.dataclass(frozen=True)
class BuildConfig:
    weight_type: int = 10
    wei_param: float = 2.0
    pool_type: str = "max"
    pool_step: int = 2
    n_levels: int = 2
    seed: int = 0
    with_depth: bool = False  # Kinect_v1/v2: keep depth_direction
    scale_type: int = 0
    granularity: int = 128  # padded-size rounding


@dataclasses.dataclass
class RawBranch:
    """Unpadded single-branch data + hierarchy (host)."""

    x: np.ndarray
    y: np.ndarray | None
    edge_index: np.ndarray
    edge_weight: np.ndarray
    specs: list[H.PoolLevelSpec]
    n_nodes: int
    depth_direction: np.ndarray | None = None

    def counts(self) -> dict:
        s1, s2 = self.specs
        return dict(
            n1=self.n_nodes, e1=self.edge_index.shape[1],
            m1=s1.step_sizes[0], n2=s1.n_out, e2=s1.edge_index.shape[1],
            m2=s2.step_sizes[0], n3=s2.n_out, e3=s2.edge_index.shape[1],
        )


def _build_branch(x, y, ei, w, n, cfg: BuildConfig, seed, depth=None) -> RawBranch:
    specs = H.build_hierarchy(
        ei, w, x, n,
        n_levels=cfg.n_levels, pool_step=cfg.pool_step,
        weight_type=cfg.weight_type, wei_param=cfg.wei_param,
        pool_type=cfg.pool_type, seed=seed,
    )
    return RawBranch(x, y, ei, w, specs, n, depth)


def build_raw(
    mesh_n: TriMesh,
    mesh_o: TriMesh | None,
    cfg: BuildConfig,
    centroid: np.ndarray | None = None,
    scale: float | None = None,
) -> tuple[RawBranch, RawBranch, dict]:
    """Host geometry + graphs + hierarchies, unpadded.

    centroid/scale may be passed in (submesh patches normalize with the
    FULL mesh's frame, reference code/dataset.py:140,151-152)."""
    pts = mesh_n.points
    if centroid is None or scale is None:
        _, centroid, scale = geometry.center_and_scale_np(
            pts, mesh_n.ev_indices, cfg.scale_type
        )
    vn = geometry.vertex_normals_np(pts, mesh_n.fv_indices)
    fn = geometry.face_normals_np(pts, mesh_n.fv_indices)
    fc = pts[mesh_n.fv_indices].mean(1)

    # vertex branch
    ei_v = graphs.build_vertex_graph_1ring(mesh_n.ev_indices, mesh_n.n_vertices)
    _, w_v = graphs.weighted_graph(ei_v, mesh_n.n_vertices, pts, vn)
    x_v = np.concatenate([(pts - centroid) * scale, vn], axis=1).astype(np.float32)
    y_v = None
    if mesh_o is not None:
        y_v = ((mesh_o.points - centroid) * scale).astype(np.float32)
    depth = None
    if cfg.with_depth:
        d = np.maximum(np.linalg.norm(pts, axis=1, keepdims=True), 1e-12)
        depth = (pts / d).astype(np.float32)
    bv = _build_branch(x_v, y_v, ei_v, w_v, mesh_n.n_vertices, cfg, cfg.seed, depth)

    # facet branch
    ei_f = graphs.build_facet_graph(mesh_n.fv_indices, mesh_n.vf_indices)
    _, w_f = graphs.weighted_graph(ei_f, mesh_n.n_faces, fc, fn)
    x_f = np.concatenate([(fc - centroid) * scale, fn], axis=1).astype(np.float32)
    y_f = None
    if mesh_o is not None:
        y_f = geometry.face_normals_np(mesh_o.points, mesh_o.fv_indices)
    bf = _build_branch(x_f, y_f, ei_f, w_f, mesh_n.n_faces, cfg, cfg.seed + 7)

    meta = dict(centroid=centroid, scale=scale, fv_indices=mesh_n.fv_indices)
    return bv, bf, meta


def plan_for(bv: RawBranch, bf: RawBranch, granularity: int = 128) -> structs.SizePlan:
    return structs.SizePlan(
        v=structs.BranchSizes.plan(bv.counts(), granularity),
        f=structs.BranchSizes.plan(bf.counts(), granularity),
    )


def _pad_branch(b: RawBranch, s: structs.BranchSizes) -> structs.BranchGraph:
    sp1, sp2 = b.specs
    lvl1 = structs.make_level(b.edge_index, b.edge_weight, b.n_nodes, s.n1, s.e1)
    lvl2 = structs.make_level(sp1.edge_index, sp1.edge_weight, sp1.n_out, s.n2, s.e2)
    lvl3 = structs.make_level(sp2.edge_index, sp2.edge_weight, sp2.n_out, s.n3, s.e3)
    steps = (
        structs.make_pool_step(sp1.step_clusters[0], s.n1, s.m1),
        structs.make_pool_step(sp1.step_clusters[1], s.m1, s.n2),
        structs.make_pool_step(sp2.step_clusters[0], s.n2, s.m2),
        structs.make_pool_step(sp2.step_clusters[1], s.m2, s.n3),
    )
    x = structs.pad_rows(b.x.astype(np.float32), s.n1)
    y = None if b.y is None else structs.pad_rows(b.y.astype(np.float32), s.n1)
    depth = (
        None
        if b.depth_direction is None
        else structs.pad_rows(b.depth_direction, s.n1)
    )
    return structs.BranchGraph(
        x=x,
        y=y,
        levels=(lvl1, lvl2, lvl3),
        steps=steps,
        unpool1=structs.make_index_map(sp1.unpool.astype(np.int32), s.n1, s.n2),
        unpool2=structs.make_index_map(sp2.unpool.astype(np.int32), s.n2, s.n3),
        depth_direction=depth,
    )


def build_dual_sample(
    mesh_n: TriMesh,
    mesh_o: TriMesh | None,
    cfg: BuildConfig = BuildConfig(),
    plan: structs.SizePlan | None = None,
) -> tuple[structs.DualSample, structs.SizePlan]:
    """Full pipeline: meshes -> padded DualSample (numpy leaves; feed to jit
    directly or jax.device_put)."""
    bv, bf, meta = build_raw(mesh_n, mesh_o, cfg)
    if plan is None:
        plan = plan_for(bv, bf, cfg.granularity)
    gv = _pad_branch(bv, plan.v)
    gf = _pad_branch(bf, plan.f)

    trash_v = plan.v.n1 - 1
    fv = np.full((plan.f.n1, 3), trash_v, dtype=np.int32)
    fv[: mesh_n.n_faces] = meta["fv_indices"]

    pairs = graphs.build_edge_fv(meta["fv_indices"])  # (2, 3F): (face, vertex)
    n_pairs_pad = 3 * plan.f.n1
    edv = structs.make_index_map(pairs[1], n_pairs_pad, plan.v.n1)
    edf = structs.make_index_map(pairs[0], n_pairs_pad, plan.f.n1)

    sample = structs.DualSample(
        v=gv,
        f=gf,
        fv_indices=fv,
        edge_dual_v=edv,
        edge_dual_f=edf,
        centroid=meta["centroid"].astype(np.float32),
        scale=np.float32(meta["scale"]),
    )
    return sample, plan
