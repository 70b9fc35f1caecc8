"""Calibrated camera geometry: KITTI calib parsing + depth back-projection.

Functional equivalent of the reference's dormant depth-weighting
geometry (``common/drop_depth_map.py`` / ``common/depth_drop.py``,
SURVEY.md C15): parse KITTI ``calib_cam_to_cam.txt`` rectified
projection matrices and back-project a depth map to camera-frame 3-D
points — the machinery behind per-drop depth-occlusion weighting of the
envmap (disabled in the reference via ``USE_DEPTH_WEIGHTING=0``,
``generator.py:20``). Unlike the reference, shapes are not hardcoded
(the reference pins 352x1216, ``drop_depth_map.py:66``) and the heavy
math is jittable JAX.
"""

from __future__ import annotations

import dataclasses


import jax.numpy as jnp
import numpy as np

CAMERA_HEIGHT_M = 1.65  # KITTI cam0 mounting height above ground


@dataclasses.dataclass
class KittiCalib:
    p_rect: np.ndarray      # (3, 4) rectified projection (P_rect_0X)
    r_rect: np.ndarray      # (3, 3) rectifying rotation (R_rect_0X)

    @property
    def projection(self) -> np.ndarray:
        """(3, 4) combined P_rect @ [R_rect 0; 0 1]."""
        r44 = np.eye(4)
        r44[:3, :3] = self.r_rect
        return self.p_rect @ r44

    @property
    def cam_offset_x(self) -> float:
        """Lateral offset of this camera w.r.t. cam0 (meters)."""
        return float(self.p_rect[0, 3] / (-self.p_rect[0, 0]))


def parse_kitti_calib(path: str, camera: int = 2) -> KittiCalib:
    """Read P_rect_0N / R_rect_0N from a calib_cam_to_cam.txt file."""
    p_rect = r_rect = None
    with open(path) as fh:
        for line in fh:
            key, _, rest = line.partition(":")
            vals = rest.split()
            if key == f"P_rect_{camera:02d}":
                p_rect = np.asarray(vals, float).reshape(3, 4)
            elif key == f"R_rect_{camera:02d}":
                r_rect = np.asarray(vals, float).reshape(3, 3)
    if p_rect is None or r_rect is None:
        raise ValueError(f"Missing P_rect/R_rect for cam {camera} in {path}")
    return KittiCalib(p_rect=p_rect, r_rect=r_rect)


def backproject_depth(depth: jnp.ndarray, projection: np.ndarray
                      ) -> jnp.ndarray:
    """Depth (H, W) meters -> camera-frame 3-D points (H, W, 3).

    Pixel (u, v) rays come from the pseudo-inverse of the projection;
    points are scaled so their z equals the depth value, with the y axis
    flipped to the renderer's y-up convention
    (``drop_depth_map.py:80``).
    """
    h, w = depth.shape
    pinv = jnp.asarray(np.linalg.pinv(projection), jnp.float32)  # (4, 3)
    uu, vv = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                          jnp.arange(h, dtype=jnp.float32))
    pix = jnp.stack([uu, vv, jnp.ones_like(uu)], -1)             # (H, W, 3)
    rays = jnp.einsum("ij,hwj->hwi", pinv, pix)[..., :3]
    scale = depth / jnp.where(rays[..., 2] == 0, 1e-9, rays[..., 2])
    pts = rays * scale[..., None]
    return pts * jnp.asarray([1.0, -1.0, 1.0])


def drop_distance_map(points: jnp.ndarray, drop_pos: jnp.ndarray
                      ) -> jnp.ndarray:
    """Distance from each back-projected scene point to each drop.

    points (H, W, 3); drop_pos (N, 3) -> (N, H, W). The per-drop
    occlusion weighting the reference intended: scene points nearer
    than the drop do not light it.
    """
    d = points[None] - drop_pos[:, None, None]
    return jnp.sqrt(jnp.sum(d * d, axis=-1))


def pixel_ray_ground_intersection(u: jnp.ndarray, v: jnp.ndarray,
                                  projection: np.ndarray,
                                  camera_height: float = CAMERA_HEIGHT_M
                                  ) -> jnp.ndarray:
    """Intersect pixel rays with the ground plane (y = -camera_height).

    Vectorized equivalent of the reference's unused ``depth_drop.py``
    ray/ground utility. u, v: (...,) pixel coords -> (..., 3) points.
    """
    pinv = jnp.asarray(np.linalg.pinv(projection), jnp.float32)
    pix = jnp.stack([u, v, jnp.ones_like(u)], -1)
    rays = jnp.einsum("ij,...j->...i", pinv, pix)[..., :3]
    # y grows downward in the camera frame; ground at +camera_height.
    t = camera_height / jnp.where(rays[..., 1] == 0, 1e-9, rays[..., 1])
    return rays * t[..., None]
