"""Foreground/background object masks from 3D annotations.

Rebuilds ``nvsf/nerf/utils.py:750-873``: LiDAR pano masks via convex-hull
membership of the predicted point cloud in annotation boxes (world-frame
8-vertex hulls), and camera image masks via projected 2D bounding boxes.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import Delaunay

from nvsf_tpu.lib import convert


def check_in_hull(points: np.ndarray, hull_vertices: np.ndarray):
    """Points inside the convex hull of ``hull_vertices``
    (``nvsf/lib/tools.py:138-160`` semantics via Delaunay)."""
    if len(hull_vertices) < 4:
        return points[:0], np.zeros(len(points), bool)
    try:
        hull = Delaunay(hull_vertices)
    except Exception:
        return points[:0], np.zeros(len(points), bool)
    mask = hull.find_simplex(points[:, :3]) >= 0
    return points[mask], mask


def compute_object_masks_pano(depth_pano: np.ndarray, pose_lidar_scaled:
                              np.ndarray, annotations, *, scale: float,
                              offset, intrinsics_lidar, intrinsics_hoz_lidar,
                              max_depth: float = 80.0):
    """(static_mask, dynamic_mask) over the pano [H, W] given world-frame
    annotation vertices (``utils.py:750-807``).

    depth_pano is in scene (scaled) units; pose_lidar_scaled is the scaled
    lidar2world used in training.
    """
    H, W = depth_pano.shape
    T = np.array(pose_lidar_scaled, np.float64, copy=True)
    T[:3, 3] = T[:3, 3] / scale + np.asarray(offset)

    pts = convert.pano_to_lidar_with_intensities(
        np.asarray(depth_pano) / scale, np.zeros((H, W, 1)),
        intrinsics_lidar, intrinsics_hoz_lidar)
    if len(pts) == 0 or not annotations:
        dyn = np.zeros((H, W))
        return np.ones((H, W)) - dyn, dyn

    dyn_mask = np.zeros(len(pts), bool)
    Tinv = np.linalg.inv(T)
    for ann in annotations:
        v = np.asarray(ann["vertices"], np.float64)
        vh = np.column_stack([v, np.ones(len(v))])
        v_lidar = (Tinv @ vh.T).T[:, :3]
        _, m = check_in_hull(pts[:, :3], v_lidar)
        dyn_mask |= m

    pano, inten = convert.lidar_to_pano_with_intensities(
        np.column_stack([pts[:, :3], dyn_mask.astype(np.float64)]),
        H, W, intrinsics_lidar, intrinsics_hoz_lidar, max_depth=max_depth)
    dyn_pano = inten
    static_pano = np.where(dyn_pano == 0, 1.0, 0.0)
    return static_pano, dyn_pano


def compute_object_masks_image(pose_cam_scaled: np.ndarray, K: np.ndarray,
                               annotations, H: int, W: int, *, scale: float,
                               offset):
    """(static_mask, dynamic_mask) over the image [H, W] via projected 2D
    boxes of the 3D annotations (``utils.py:810-873``)."""
    T = np.array(pose_cam_scaled, np.float64, copy=True)
    T[:3, 3] = T[:3, 3] / scale + np.asarray(offset)
    Tinv = np.linalg.inv(T)
    static = np.ones((H, W), bool)
    for ann in (annotations or []):
        v = np.asarray(ann["vertices"], np.float64)
        vh = np.column_stack([v, np.ones(len(v))])
        vc = (Tinv @ vh.T).T[:, :3]
        uv = (np.asarray(K) @ vc.T).T
        if np.all(uv[:, 2] > 0):
            uv = uv[:, :2] / uv[:, 2:3]
            x0 = max(0, int(uv[:, 0].min()))
            y0 = max(0, int(uv[:, 1].min()))
            x1 = min(W - 1, int(uv[:, 0].max()))
            y1 = min(H - 1, int(uv[:, 1].max()))
            static[y0:y1 + 1, x0:x1 + 1] = False
    return static, ~static
