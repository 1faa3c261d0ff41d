"""Synthetic analytic meshes — test fixtures and benchmark inputs.

The reference ships only dataset file lists (dataset/*/train_list.txt); the
actual CNR/Kinect meshes are external downloads.  These generators provide
meshes with analytically known normals/curvature for golden-value tests
(octahedron, icosphere) and arbitrarily large inputs for throughput
benchmarks, plus the Gaussian noise model used by the benchmark corpora
(sigma expressed as a fraction of mean edge length).
"""

from __future__ import annotations

import numpy as np

from geobignn_tpu import geometry
from geobignn_tpu.meshio import TriMesh


def octahedron() -> TriMesh:
    pts = np.array(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
        dtype=np.float32,
    )
    fv = np.array(
        [[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
         [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]],
        dtype=np.int32,
    )
    return TriMesh(pts, fv)


def icosahedron() -> TriMesh:
    t = (1.0 + 5**0.5) / 2.0
    pts = np.array(
        [[-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
         [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
         [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]],
        dtype=np.float64,
    )
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    fv = np.array(
        [[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
         [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
         [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
         [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]],
        dtype=np.int32,
    )
    return TriMesh(pts.astype(np.float32), fv)


def icosphere(subdivisions: int = 3, radius: float = 1.0) -> TriMesh:
    """Subdivided icosahedron projected to the sphere.
    F = 20 * 4^subdivisions (sub=5 -> 20480 faces, the reference's submesh
    scale; sub=7 -> 327680 faces for large-mesh benchmarks)."""
    mesh = icosahedron()
    pts = mesh.points.astype(np.float64)
    fv = mesh.fv_indices.astype(np.int64)
    for _ in range(subdivisions):
        e0, e1, e2 = fv[:, [0, 1]], fv[:, [1, 2]], fv[:, [2, 0]]
        edges = np.concatenate([e0, e1, e2], axis=0)
        lo = np.minimum(edges[:, 0], edges[:, 1])
        hi = np.maximum(edges[:, 0], edges[:, 1])
        key = lo * pts.shape[0] + hi
        uniq, inv = np.unique(key, return_inverse=True)
        mid = pts[uniq // pts.shape[0]] + pts[uniq % pts.shape[0]]
        mid /= np.linalg.norm(mid, axis=1, keepdims=True)
        mid_ids = pts.shape[0] + np.arange(uniq.shape[0])
        pts = np.concatenate([pts, mid], axis=0)
        m01, m12, m20 = np.split(mid_ids[inv], 3)
        fv = np.concatenate(
            [np.stack([fv[:, 0], m01, m20], 1),
             np.stack([fv[:, 1], m12, m01], 1),
             np.stack([fv[:, 2], m20, m12], 1),
             np.stack([m01, m12, m20], 1)],
            axis=0,
        )
    return TriMesh((pts * radius).astype(np.float32), fv.astype(np.int32))


def grid_patch(nx: int = 16, ny: int = 16) -> TriMesh:
    """Open planar triangle grid (tests boundary/ragged incidence)."""
    xs, ys = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    pts = np.stack([xs, ys, np.zeros_like(xs)], axis=-1).reshape(-1, 3)
    quads = []
    for i in range(nx - 1):
        for j in range(ny - 1):
            a = i * ny + j
            b = (i + 1) * ny + j
            quads += [[a, b, a + 1], [b, b + 1, a + 1]]
    return TriMesh(pts.astype(np.float32), np.asarray(quads, dtype=np.int32))


def add_noise(
    mesh: TriMesh, sigma_ratio: float = 0.2, seed: int = 0
) -> TriMesh:
    """Gaussian vertex noise, sigma = sigma_ratio * mean edge length (the
    noise model of the CNR Synthetic corpus's _n1/_n2/_n3 levels)."""
    rng = np.random.default_rng(seed)
    mel = geometry.mean_edge_length_np(mesh.points, mesh.ev_indices)
    noisy = mesh.points + rng.normal(
        0.0, sigma_ratio * mel, size=mesh.points.shape
    ).astype(np.float32)
    return TriMesh(noisy.astype(np.float32), mesh.fv_indices.copy())
