"""Surface reconstruction from point clouds: normals + greedy triangulation.

Replaces the reference's PCL meshing capability: its unit test runs normal
estimation + GreedyProjectionTriangulation (`UnitTest/pcl/UnitTestPCL.cpp:9-63`)
and the visualizer offers Poisson meshing with statistical-outlier and voxel
filters (`src/PointCloudVisualizer.cpp:533-738`). Here:

  - `estimate_normals`: PCA over k-nearest neighbours, distances as one
    matmul (TPU-shaped), batched 3x3 eigendecompositions;
  - `remove_outliers` / `voxel_downsample`: the PassThrough /
    StatisticalOutlierRemoval / VoxelGrid filter chain (:607-641);
  - `greedy_projection_mesh`: project the cloud onto its dominant plane,
    2D Delaunay, drop long-edge/sliver triangles — the greedy-projection
    family of surface reconstruction, suited to the mostly-2.5D clouds
    SLAM produces.
"""

from __future__ import annotations

import numpy as np


def knn_indices(points: np.ndarray, k: int) -> np.ndarray:
    """(N, k) nearest-neighbour indices (excluding self) via a dense
    distance matmul — fine to ~50k points."""
    X = np.asarray(points, np.float64)
    sq = (X**2).sum(axis=1)
    D = sq[:, None] + sq[None, :] - 2.0 * (X @ X.T)
    np.fill_diagonal(D, np.inf)
    return np.argpartition(D, k, axis=1)[:, :k]


def estimate_normals(points: np.ndarray, k: int = 12) -> np.ndarray:
    """Per-point unit normals from PCA of the k-NN neighbourhood, oriented
    toward the cloud centroid's exterior (consistent hemisphere)."""
    X = np.asarray(points, np.float64)
    idx = knn_indices(X, k)
    nbrs = X[idx]  # (N, k, 3)
    mu = nbrs.mean(axis=1, keepdims=True)
    C = np.einsum("nki,nkj->nij", nbrs - mu, nbrs - mu) / k
    _, vecs = np.linalg.eigh(C)
    normals = vecs[:, :, 0]  # smallest-eigenvalue direction
    # orient away from centroid
    out = X - X.mean(axis=0)
    flip = np.einsum("ni,ni->n", normals, out) < 0
    normals[flip] *= -1.0
    return normals


def remove_outliers(points: np.ndarray, k: int = 8, std_ratio: float = 2.0):
    """Statistical outlier removal (PCL StatisticalOutlierRemoval semantics):
    drop points whose mean k-NN distance exceeds mean + std_ratio * std."""
    X = np.asarray(points, np.float64)
    idx = knn_indices(X, k)
    d = np.linalg.norm(X[idx] - X[:, None], axis=-1).mean(axis=1)
    keep = d <= d.mean() + std_ratio * d.std()
    return X[keep], keep


def voxel_downsample(points: np.ndarray, voxel: float):
    """VoxelGrid filter: one centroid per occupied voxel."""
    X = np.asarray(points, np.float64)
    keys = np.floor(X / voxel).astype(np.int64)
    _, inv, counts = np.unique(keys, axis=0, return_inverse=True, return_counts=True)
    sums = np.zeros((counts.size, 3))
    np.add.at(sums, inv, X)
    return sums / counts[:, None]


def greedy_projection_mesh(
    points: np.ndarray, max_edge: float | None = None, min_angle_deg: float = 10.0
):
    """Triangulate a mostly-2.5D cloud: PCA plane projection + 2D Delaunay +
    long-edge/sliver filtering. Returns (vertices (N, 3), faces (M, 3))."""
    from scipy.spatial import Delaunay

    X = np.asarray(points, np.float64)
    mu = X.mean(axis=0)
    C = (X - mu).T @ (X - mu) / len(X)
    _, vecs = np.linalg.eigh(C)
    basis = vecs[:, 1:]  # two largest principal directions
    UV = (X - mu) @ basis
    tri = Delaunay(UV)
    faces = tri.simplices

    # filter: long edges and slivers
    def edge_lens(f):
        a, b, c = X[f[:, 0]], X[f[:, 1]], X[f[:, 2]]
        return np.stack(
            [np.linalg.norm(a - b, axis=1), np.linalg.norm(b - c, axis=1),
             np.linalg.norm(c - a, axis=1)], axis=1,
        )

    L = edge_lens(faces)
    if max_edge is None:
        max_edge = 4.0 * np.median(L)
    keep = (L.max(axis=1) <= max_edge)
    # min angle via law of cosines
    a2, b2, c2 = L[:, 0] ** 2, L[:, 1] ** 2, L[:, 2] ** 2
    with np.errstate(invalid="ignore", divide="ignore"):
        cosines = np.stack(
            [
                (b2 + c2 - a2) / (2 * np.sqrt(b2 * c2) + 1e-12),
                (a2 + c2 - b2) / (2 * np.sqrt(a2 * c2) + 1e-12),
                (a2 + b2 - c2) / (2 * np.sqrt(a2 * b2) + 1e-12),
            ],
            axis=1,
        )
    min_ang = np.degrees(np.arccos(np.clip(cosines, -1, 1))).min(axis=1)
    keep &= min_ang >= min_angle_deg
    return X, faces[keep]
