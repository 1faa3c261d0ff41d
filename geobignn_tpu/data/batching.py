"""Disjoint-union graph batching.

Capability parity target: torch_geometric's `Batch.from_data_list` used by
the reference's Collater (code/dataset.py:19-36).  B padded samples merge
into ONE sample whose node arrays are concatenations and whose index
arrays are offset by their sample's slot base — a single graph with B
connected components.  Every segment/gather op then runs unchanged at B×
size: far better MXU/VPU utilization than per-sample stepping, and (unlike
vmap-over-model) no blowup of the compiled HLO.

Each component keeps its own trash lane; `batch_ids_*` name the owning
sample per node slot so losses can reduce per-sample (the reference's
grad-accumulation weighting) instead of per-node.
"""

from __future__ import annotations

import numpy as np

from geobignn_tpu.structs import BranchGraph, DualSample, GraphLevel, PoolStep


def _cat(arrs):
    return np.concatenate([np.asarray(a) for a in arrs], axis=0)


def _union_levels(levels: list[GraphLevel]) -> GraphLevel:
    n_pad = np.asarray(levels[0].node_mask).shape[0]
    ei = np.concatenate(
        [np.asarray(l.edge_index) + k * n_pad for k, l in enumerate(levels)], axis=1
    ).astype(np.int32)
    return GraphLevel(
        edge_index=ei,
        edge_weight=_cat([l.edge_weight for l in levels]),
        deg=_cat([l.deg for l in levels]),
        node_mask=_cat([l.node_mask for l in levels]),
    )


def _union_steps(steps: list[PoolStep]) -> PoolStep:
    n_out = steps[0].n_out
    cl = np.concatenate(
        [np.asarray(s.cluster) + k * n_out for k, s in enumerate(steps)]
    ).astype(np.int32)
    return PoolStep(cluster=cl, n_out=n_out * len(steps))


def _union_branch(branches: list[BranchGraph]) -> BranchGraph:
    b0 = branches[0]
    n2 = np.asarray(b0.levels[1].node_mask).shape[0]
    n3 = np.asarray(b0.levels[2].node_mask).shape[0]
    return BranchGraph(
        x=_cat([b.x for b in branches]),
        y=None if b0.y is None else _cat([b.y for b in branches]),
        levels=tuple(
            _union_levels([b.levels[i] for b in branches]) for i in range(3)
        ),
        steps=tuple(
            _union_steps([b.steps[i] for b in branches]) for i in range(4)
        ),
        unpool1=np.concatenate(
            [np.asarray(b.unpool1) + k * n2 for k, b in enumerate(branches)]
        ).astype(np.int32),
        unpool2=np.concatenate(
            [np.asarray(b.unpool2) + k * n3 for k, b in enumerate(branches)]
        ).astype(np.int32),
        depth_direction=(
            None
            if b0.depth_direction is None
            else _cat([b.depth_direction for b in branches])
        ),
    )


def union_batch(samples: list[DualSample]) -> DualSample:
    """Merge same-SizePlan samples into one disjoint-union DualSample."""
    s0 = samples[0]
    nv = np.asarray(s0.v.x).shape[0]
    nf = np.asarray(s0.f.x).shape[0]
    fv = np.concatenate(
        [np.asarray(s.fv_indices) + k * nv for k, s in enumerate(samples)]
    ).astype(np.int32)
    edv = np.concatenate(
        [np.asarray(s.edge_dual_v) + k * nv for k, s in enumerate(samples)]
    ).astype(np.int32)
    edf = np.concatenate(
        [np.asarray(s.edge_dual_f) + k * nf for k, s in enumerate(samples)]
    ).astype(np.int32)
    return DualSample(
        v=_union_branch([s.v for s in samples]),
        f=_union_branch([s.f for s in samples]),
        fv_indices=fv,
        edge_dual_v=edv,
        edge_dual_f=edf,
        centroid=np.stack([np.asarray(s.centroid).reshape(3) for s in samples]),
        scale=np.stack([np.asarray(s.scale) for s in samples]),
    )


def batch_ids(n_samples: int, n_pad: int) -> np.ndarray:
    """(n_samples * n_pad,) owning-sample id per node slot."""
    return np.repeat(np.arange(n_samples, dtype=np.int32), n_pad)
