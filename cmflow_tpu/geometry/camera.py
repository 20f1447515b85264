"""Camera projection geometry for the cross-modal optical-flow loss.

Equivalents of ``project_radar_to_image`` (utils/util.py:16-28) and
``point_ray_distance`` (utils/util.py:31-58), channels-last and with the
calibration matrices passed explicitly (no global args object / no host
constants captured at trace time beyond the two matrices).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class CameraCalib:
    """VoD radar→camera calibration (dataset/vod_radar_calib.txt)."""

    # 3x4 intrinsic projection matrix P.
    projection: np.ndarray
    # 4x4 extrinsic transform radar frame -> camera frame.
    t_camera_radar: np.ndarray

    @staticmethod
    def from_kitti_file(path: str) -> "CameraCalib":
        """Parse the KITTI-style calib file (dataset/vod.py:127-134)."""
        with open(path, "r") as f:
            lines = f.readlines()
        intrinsic = np.array(
            lines[2].strip().split(" ")[1:], dtype=np.float32
        ).reshape(3, 4)
        extrinsic = np.array(
            lines[5].strip().split(" ")[1:], dtype=np.float32
        ).reshape(3, 4)
        extrinsic = np.concatenate([extrinsic, [[0, 0, 0, 1]]], axis=0)
        return CameraCalib(projection=intrinsic,
                           t_camera_radar=extrinsic.astype(np.float32))


def project_radar_to_image(pcs: Array, projection: Array,
                           t_camera_radar: Array) -> Array:
    """Project radar-frame points to pixel coordinates.

    Args:
      pcs: ``[B, N, 3]`` radar-frame points.
      projection: ``[3, 4]`` camera projection matrix.
      t_camera_radar: ``[4, 4]`` radar→camera transform.
    Returns:
      ``[B, N, 2]`` (u, v) pixels.
    """
    b, n, _ = pcs.shape
    ones = jnp.ones((b, n, 1), pcs.dtype)
    radar_h = jnp.concatenate([pcs, ones], axis=-1)  # [B, N, 4]
    cam = jnp.einsum("ij,bnj->bni", t_camera_radar, radar_h)
    uvz = jnp.einsum("ij,bnj->bni", projection, cam)
    return uvz[..., :2] / uvz[..., 2:3]


def point_ray_distance(warped_pcs: Array, pixels: Array, projection: Array,
                       t_camera_radar: Array) -> Array:
    """Distance from warped 3-D radar points to the camera rays through
    target pixels (utils/util.py:31-58).

    Args:
      warped_pcs: ``[B, N, 3]`` radar-frame points (pc1 + predicted flow).
      pixels: ``[B, N, 2]`` target pixel coordinates on the image plane.
      projection: ``[3, 4]``.
      t_camera_radar: ``[4, 4]``.
    Returns:
      ``[B, N]`` perpendicular point-to-ray distances.
    """
    b, n, _ = pixels.shape
    ones = jnp.ones((b, n, 1), pixels.dtype)
    pixels_h = jnp.concatenate([pixels, ones], axis=-1)  # depth-1 homogeneous

    k = projection[:3, :3]
    k_inv = jnp.linalg.inv(k)
    cam_dirs = jnp.einsum("ij,bnj->bni", k_inv, pixels_h)
    unit = cam_dirs / jnp.linalg.norm(cam_dirs, axis=-1, keepdims=True)

    warped_h = jnp.concatenate([warped_pcs, ones], axis=-1)
    warped_cam = jnp.einsum("ij,bnj->bni", t_camera_radar, warped_h)[..., :3]

    # zero-subgradient norm: a warped point exactly on its ray has cross
    # product 0, where jnp.linalg.norm's gradient is NaN (torch: 0)
    cr = jnp.cross(unit, warped_cam)
    sq = jnp.sum(cr * cr, axis=-1)
    nz = sq > 0
    return jnp.where(nz, jnp.sqrt(jnp.where(nz, sq, 1.0)), 0.0)
