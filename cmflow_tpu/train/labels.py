"""Train-time pseudo-label generation, run *inside* the jitted train step
(the reference runs these on-GPU before the forward pass,
main_util.py:63-67,209-265)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from cmflow_tpu.geometry import se3

Array = jax.Array


def extract_dynamic_from_fg(
    fg_mask: Array, pc1: Array, trans: Array, flow_label: Array
) -> Array:
    """Refine the LiDAR-MOT foreground mask into a static/moving mask
    (main_util.py:209-224).

    Foreground points whose labelled flow is within 0.05 m of the rigid
    (ego) flow are re-classified static.  Returns 1 = static, 0 = moving.

    Args:
      fg_mask: ``[B, N]`` pseudo FG mask (1 = background/static).
      pc1: ``[B, N, 3]``.
      trans: ``[B, 4, 4]`` gt ego transform.
      flow_label: ``[B, N, 3]`` pseudo flow labels.
    """
    gt_sf_rg = se3.rigid_to_flow(pc1, trans)
    flow_nr = gt_sf_rg - flow_label
    fg = fg_mask != 1
    nr_norm = jnp.linalg.norm(flow_nr * fg[..., None], axis=-1)
    static = jnp.logical_or(fg_mask == 1, nr_norm < 0.05)
    return static.astype(jnp.float32)


def mseg_label_rrv(
    pc1: Array,
    trans: Array,
    vel1: Array,
    interval: Array,
    vr_thres: float,
) -> Tuple[Array, Array]:
    """Motion-seg pseudo labels from relative radial velocity
    (main_util.py:253-265).  Returns (label, residual); 1 = static."""
    gt_sf_rg = se3.rigid_to_flow(pc1, trans)
    proj = jnp.sum(gt_sf_rg * pc1, axis=-1) / jnp.linalg.norm(pc1, axis=-1)
    residual = jnp.abs(vel1 - proj / interval[:, None])
    bs = jnp.mean(residual, axis=1, keepdims=True)
    label = ((residual - bs) < vr_thres).astype(jnp.float32)
    return label, residual


def merge_mseg_labels(mseg_rrv: Array, dyn_mask: Array) -> Array:
    """Combine RRV labels with the FG-derived mask (main_util.py:66-67):
    where dyn_mask says moving (0), force moving; else keep the RRV label."""
    return jnp.where(dyn_mask == 1, mseg_rrv, dyn_mask)


# --- experimental label variants kept for parity with the reference's
# --- inventory (main_util.py:227-278; unused by its training recipe, and
# --- their sigma_opt/sigma_rrv/opt_thres args are not in configs.yaml)


def probabilistic_label_rrv(
    pc1: Array, trans: Array, vel1: Array, interval: Array, sigma_rrv: float
) -> Array:
    """Soft static probability from the RRV residual
    (main_util.py:242-251)."""
    gt_sf_rg = se3.rigid_to_flow(pc1, trans)
    proj = jnp.sum(gt_sf_rg * pc1, axis=-1) / jnp.linalg.norm(pc1, axis=-1)
    residual = vel1 * interval[:, None] - proj
    return jnp.exp(-(residual**2) / (2 * sigma_rrv**2))


def probabilistic_label_opt(
    pc1: Array, trans: Array, radar_u: Array, radar_v: Array,
    opt_flow: Array, projection: Array, t_camera_radar: Array,
    sigma_opt: float,
) -> Array:
    """Soft static probability from optical-flow reprojection residual
    (main_util.py:227-239)."""
    from cmflow_tpu.geometry import camera as cam

    gt_wp_rg = se3.rigid_to_flow(pc1, trans) + pc1
    end_pixels = jnp.stack([radar_u, radar_v], axis=-1) + opt_flow
    rg_proj = cam.project_radar_to_image(gt_wp_rg, projection,
                                         t_camera_radar)
    residual = jnp.linalg.norm(rg_proj - end_pixels, axis=-1)
    return jnp.exp(-(residual**2) / (2 * sigma_opt**2))


def mseg_label_opt(
    pc1: Array, trans: Array, radar_u: Array, radar_v: Array,
    opt_flow: Array, projection: Array, t_camera_radar: Array,
    opt_thres: float,
) -> Array:
    """Hard static/moving labels from optical-flow reprojection residual
    (main_util.py:267-278)."""
    from cmflow_tpu.geometry import camera as cam

    gt_wp_rg = se3.rigid_to_flow(pc1, trans) + pc1
    end_pixels = jnp.stack([radar_u, radar_v], axis=-1) + opt_flow
    rg_proj = cam.project_radar_to_image(gt_wp_rg, projection,
                                         t_camera_radar)
    residual = jnp.linalg.norm(rg_proj - end_pixels, axis=-1)
    return (residual < opt_thres).astype(jnp.float32)
