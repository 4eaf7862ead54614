"""Synthetic LiDAR-like scene generator for tests.

Builds point clouds with pillar/wall structures of varying heights so the
multi-level contour extraction has nontrivial work, plus a pose-transformable
"world" so loop-closure tests can revisit places.
"""

from __future__ import annotations

import numpy as np


def make_world(seed: int, n_structs: int = 40, extent: float = 120.0):
    """A set of box structures: (cx, cy, sx, sy, height)."""
    rng = np.random.default_rng(seed)
    cx = rng.uniform(-extent, extent, n_structs)
    cy = rng.uniform(-extent, extent, n_structs)
    sx = rng.uniform(1.0, 8.0, n_structs)
    sy = rng.uniform(1.0, 8.0, n_structs)
    h = rng.uniform(0.5, 8.0, n_structs)
    return np.stack([cx, cy, sx, sy, h], axis=1)


def render_scan(world: np.ndarray, pose_xyt, seed: int = 0,
                pts_per_struct: int = 400, max_range: float = 70.0,
                noise: float = 0.03) -> np.ndarray:
    """Sample points from structures visible from pose (x, y, theta).

    Returns (N, 3) float32 points in the sensor frame (z: ground at -2.0,
    matching the KITTI lidar_height=2.0 convention).
    """
    px, py, pth = pose_xyt
    rng = np.random.default_rng(seed)
    pts = []
    for cx, cy, sx, sy, h in world:
        if np.hypot(cx - px, cy - py) > max_range:
            continue
        n = pts_per_struct
        xs = rng.uniform(cx - sx / 2, cx + sx / 2, n)
        ys = rng.uniform(cy - sy / 2, cy + sy / 2, n)
        zs = rng.uniform(0.0, h, n)
        pts.append(np.stack([xs, ys, zs], axis=1))
    # ground points
    ang = rng.uniform(0, 2 * np.pi, 4000)
    rad = rng.uniform(2.0, max_range, 4000)
    pts.append(np.stack([px + rad * np.cos(ang), py + rad * np.sin(ang),
                         np.zeros(4000)], axis=1))
    allp = np.concatenate(pts, axis=0)
    # world -> sensor frame
    c, s = np.cos(-pth), np.sin(-pth)
    dx, dy = allp[:, 0] - px, allp[:, 1] - py
    out = np.stack([c * dx - s * dy, s * dx + c * dy, allp[:, 2] - 2.0], axis=1)
    out += rng.normal(0, noise, out.shape)
    return out.astype(np.float32)


def se3_from_xyt(pose_xyt) -> np.ndarray:
    x, y, th = pose_xyt
    T = np.eye(4)
    c, s = np.cos(th), np.sin(th)
    T[0, 0], T[0, 1], T[1, 0], T[1, 1] = c, -s, s, c
    T[0, 3], T[1, 3] = x, y
    return T
