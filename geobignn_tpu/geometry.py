"""Mesh geometry operators — host (numpy) and device (JAX) variants.

Capability parity targets in the reference:
  * face normals           — code/data_util.py:182-198 (`computer_face_normal`)
  * vertex normals         — OpenMesh `update_vertex_normals`
                             (code/dataset.py:199), re-implemented as
                             normalize(sum of incident unit face normals)
  * center & scale         — code/data_util.py:201-230 (`center_and_scale`)
  * bilateral edge weights — code/data_util.py:383-399 (`calc_weight`)

The JAX variants are shape-polymorphic over padded arrays: padded faces must
index a zero "trash" vertex row so their cross products vanish; safe
normalization keeps them finite.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

EPS_NORMALIZE = 1e-12


# --------------------------------------------------------------------------
# device (JAX) — differentiable, jit-safe
# --------------------------------------------------------------------------

def safe_normalize(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """x / max(||x||, eps) — matches torch.nn.functional.normalize.

    Written via a clamped squared norm so the gradient at x == 0 is exactly
    zero instead of NaN (d sqrt at 0 is infinite; padded zero rows flow
    through here)."""
    sq = (x * x).sum(axis=axis, keepdims=True)
    n = jnp.sqrt(jnp.maximum(sq, EPS_NORMALIZE**2))
    return x / n


def face_normals(points: jnp.ndarray, fv_indices: jnp.ndarray) -> jnp.ndarray:
    """Unit face normals: normalize(cross(v1-v0, v2-v0)); (F, 3).

    Differentiable — gradients flow from normal losses back into vertex
    positions (the cross-domain coupling, reference code/network.py:336)."""
    fv = points[fv_indices]  # (F, 3, 3)
    n = jnp.cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0])
    return safe_normalize(n)


def face_centroids(points: jnp.ndarray, fv_indices: jnp.ndarray) -> jnp.ndarray:
    """(F, 3) mean of the three corner positions."""
    return points[fv_indices].mean(axis=1)


# --------------------------------------------------------------------------
# host (numpy) — preprocessing-time
# --------------------------------------------------------------------------

def face_normals_np(points: np.ndarray, fv_indices: np.ndarray) -> np.ndarray:
    fv = points[fv_indices]
    n = np.cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0])
    d = np.maximum(np.linalg.norm(n, axis=1, keepdims=True), EPS_NORMALIZE)
    return (n / d).astype(np.float32)


def vertex_normals_np(
    points: np.ndarray,
    fv_indices: np.ndarray,
    n_vertices: int | None = None,
    weighting: str = "uniform",
) -> np.ndarray:
    """Unit vertex normals: normalize(weighted sum of incident face normals).

    weighting="uniform" (default) sums UNIT face normals — exactly OpenMesh's
    `update_vertex_normals` (code/dataset.py:199), whose default
    `calc_vertex_normal` delegates to `calc_vertex_normal_fast`:
    `for vf_it: n += normal(*vf_it)` over unit face normals
    (OpenMesh PolyMeshT_impl.hh).  So the reference's vertex-branch inputs
    use uniform weighting, not angle/area weighting.

    weighting="area" sums UNNORMALIZED cross products (magnitude = 2x face
    area), provided for robustness experiments on meshes with skewed
    triangle sizes."""
    if n_vertices is None:
        n_vertices = points.shape[0]
    if weighting == "uniform":
        fn = face_normals_np(points, fv_indices)
    elif weighting == "area":
        fv = points[fv_indices]
        fn = np.cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0])
    else:
        raise ValueError(f"unknown weighting '{weighting}'")
    acc = np.zeros((n_vertices, 3), dtype=np.float64)
    for c in range(3):
        np.add.at(acc, fv_indices[:, c], fn)
    d = np.maximum(np.linalg.norm(acc, axis=1, keepdims=True), EPS_NORMALIZE)
    return (acc / d).astype(np.float32)


def mean_edge_length_np(points: np.ndarray, ev_indices: np.ndarray) -> float:
    e = points[ev_indices.astype(np.int64)]
    return float(np.linalg.norm(e[:, 0] - e[:, 1], axis=1).mean())


def center_and_scale_np(
    points: np.ndarray, ev_indices: np.ndarray, s_type: int = 0
) -> tuple[np.ndarray, np.ndarray, float]:
    """Translate to centroid and scale; returns (scaled_points, centroid, scale).

    `scale` is the multiplicative factor (1/size measure), exactly the
    quantity the reference stores and later divides by at inference
    (code/test_dual.py:63).  Four size measures, matching s_type 0..3."""
    points = np.asarray(points, dtype=np.float32)
    centroid = points.mean(axis=0, keepdims=True)
    centered = points - centroid
    if s_type == 0:  # mean edge length
        size = mean_edge_length_np(centered, ev_indices)
    elif s_type == 1:  # bounding-box diagonal
        size = float(np.linalg.norm(centered.max(0) - centered.min(0)))
    elif s_type == 2:  # max abs coordinate
        size = float(np.abs(centered).max())
    elif s_type == 3:  # furthest distance from centroid
        size = float(np.sqrt((centered**2).sum(1).max()))
    else:
        raise ValueError(f"unknown s_type {s_type}")
    scale = 1.0 / size
    return centered * scale, centroid.astype(np.float32), scale


def bilateral_edge_weights_np(
    node_pos: np.ndarray, node_normal: np.ndarray, edge_index: np.ndarray
) -> np.ndarray:
    """Per-edge bilateral affinity:
        w = clamp(n_i . n_j, min=1e-3) * exp(-||p_i - p_j||^2 / (2*mean_len))

    where mean_len is the mean edge length over *this* edge list.  When the
    list includes self-loops their zero lengths participate in the mean,
    reproducing the reference's convention (code/data_util.py:389-398:
    weights are computed after self-loop insertion).
    edge_index: (2, E)."""
    eps = 0.001
    p = node_pos[edge_index]  # (2, E, 3)
    sq_len = ((p[0] - p[1]) ** 2).sum(axis=1)
    mean_len = np.sqrt(sq_len).mean()
    n = node_normal[edge_index]
    dn = (n[0] * n[1]).sum(axis=1)
    dp = np.exp(sq_len / (-2.0 * mean_len + 1e-12))
    return (np.maximum(dn, eps) * dp).astype(np.float32)
