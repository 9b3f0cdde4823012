"""Point-cloud preprocessing: distance/z filters, RANSAC ground removal,
statistical outlier removal (numpy/scipy — replaces the reference's open3d
usage in ``nvsf/nerf/utils.py:110-268``)."""

from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree


def distance_filter(pc: np.ndarray, dist_min: float, dist_max: float):
    d = np.linalg.norm(pc[:, :2], axis=1)
    return pc[(d > dist_min) & (d < dist_max)]


def z_filter(pc: np.ndarray, z_limit):
    return pc[(pc[:, 2] > z_limit[0]) & (pc[:, 2] < z_limit[1])]


def ransac_plane(pc: np.ndarray, n_iters: int = 100,
                 dist_thresh: float = 0.15, seed: int = 0):
    """Fit a dominant plane with RANSAC; returns (inlier_mask, (n, d)).

    Mirrors open3d ``segment_plane`` as used for ground removal
    (``utils.py:231-268``).
    """
    rng = np.random.default_rng(seed)
    N = len(pc)
    best_mask = np.zeros(N, bool)
    best_count = -1
    for _ in range(n_iters):
        idx = rng.choice(N, 3, replace=False)
        p0, p1, p2 = pc[idx]
        n = np.cross(p1 - p0, p2 - p0)
        norm = np.linalg.norm(n)
        if norm < 1e-9:
            continue
        n = n / norm
        d = -np.dot(n, p0)
        dist = np.abs(pc @ n + d)
        mask = dist < dist_thresh
        c = int(mask.sum())
        if c > best_count:
            best_count = c
            best_mask = mask
            best_plane = (n, d)
    return best_mask, best_plane


def statistical_outlier_removal(pc: np.ndarray, nb_neighbors: int = 20,
                                std_ratio: float = 2.0):
    """Remove points whose mean kNN distance exceeds mean + std_ratio * std
    (open3d ``remove_statistical_outlier`` semantics)."""
    if len(pc) <= nb_neighbors:
        return pc
    tree = cKDTree(pc)
    d, _ = tree.query(pc, k=nb_neighbors + 1)
    mean_d = d[:, 1:].mean(axis=1)
    thresh = mean_d.mean() + std_ratio * mean_d.std()
    return pc[mean_d < thresh]


def point_removal(pc_raw: np.ndarray, dist_min: float = 1.0,
                  dist_max: float = 55.0, z_limit=(-2.5, 4.0),
                  ransac_iters: int = 100, seed: int = 0):
    """Ground/outlier removal pipeline for the flow loss
    (``utils.py:110-268`` / ``trainer.py:1872-1878``).

    Returns (non_ground_points, ground_points), both (N, 3) lidar-frame.
    """
    pc = distance_filter(pc_raw[:, :3], dist_min, dist_max)
    pc = z_filter(pc, z_limit)
    if len(pc) < 10:
        return pc, np.zeros((0, 3))
    ground_mask, _ = ransac_plane(pc, n_iters=ransac_iters, seed=seed)
    ground = pc[ground_mask]
    points = pc[~ground_mask]
    points = statistical_outlier_removal(points)
    return points, ground


def pad_pointclouds(pcs, max_points=None):
    """Pad a list of (Ni, 3) clouds to [F, P, 3] + mask [F, P] for jit."""
    if max_points is None:
        max_points = max((len(p) for p in pcs), default=1)
    max_points = max(max_points, 1)
    F = len(pcs)
    out = np.zeros((F, max_points, 3), np.float32)
    mask = np.zeros((F, max_points), bool)
    for i, p in enumerate(pcs):
        n = min(len(p), max_points)
        out[i, :n] = p[:n]
        mask[i, :n] = True
    return out, mask
