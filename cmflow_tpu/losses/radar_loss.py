"""Multi-task radar scene-flow losses (losses/radar_loss.py equivalents).

All losses are pure jittable functions of arrays — no modules, no state.
Layout is channels-last ``[B, N, 3]`` (the reference uses ``[B, 3, N]``).

Reference line citations:
  * soft_chamfer_loss        — losses/radar_loss.py:17-58
  * spatial_smoothness_loss  — losses/radar_loss.py:60-98
  * radial_displacement_loss — losses/radar_loss.py:100-122
  * self_supervised_loss     — losses/radar_loss.py:124-161
  * ego_motion_loss          — losses/radar_loss.py:163-182
  * motion_seg_loss          — losses/radar_loss.py:184-205
  * optical_flow_loss        — losses/radar_loss.py:207-242
  * dynamic_flow_loss        — losses/radar_loss.py:244-258
  * radar_flow_loss          — losses/radar_loss.py:260-292
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from cmflow_tpu.geometry import camera as cam
from cmflow_tpu.geometry import se3
from cmflow_tpu.ops import pointops

Array = jax.Array


def _l2_norm(x: Array, axis: int = -1) -> Array:
    """L2 norm with torch's zero-subgradient convention.

    ``jnp.linalg.norm`` has a NaN gradient at exactly 0; torch defines the
    subgradient there as 0.  Zero differences genuinely occur: the loader
    duplicates points when a cloud has fewer than ``num_points``
    (dataset/vod.py:104-111), so a point's k-NN set can contain its own
    duplicate with an identical predicted flow.
    """
    sq = jnp.sum(x * x, axis=axis)
    nz = sq > 0
    return jnp.where(nz, jnp.sqrt(jnp.where(nz, sq, 1.0)), 0.0)


def soft_chamfer_loss(
    pc1: Array, pc2: Array, pc1_warp: Array, zeta: float = 0.005
) -> Array:
    """Density-gated soft Chamfer distance (radar_loss.py:17-58).

    KDE densities gate out low-density (likely noise) points; nearest
    squared distances below 0.01 are free (soft threshold).
    """
    dens12 = se3.kde_density(pc1, pc2, 1.0)
    dens21 = se3.kde_density(pc2, pc1, 1.0)
    mask1 = (dens12 > zeta).astype(pc1.dtype)
    mask2 = (dens21 > zeta).astype(pc1.dtype)

    sqrdist = pointops.square_distance(pc1_warp, pc2)  # [B, N, M]
    dist1 = jnp.min(sqrdist, axis=-1)  # warp -> pc2
    dist2 = jnp.min(sqrdist, axis=1)  # pc2 -> warp
    dist1 = jax.nn.relu(dist1 - 0.01) * mask1
    dist2 = jax.nn.relu(dist2 - 0.01) * mask2
    return jnp.mean(dist1) + jnp.mean(dist2)


def spatial_smoothness_loss(
    pc1: Array, pred_flow: Array, alpha: float = 0.5, num_nb: int = 8
) -> Array:
    """Distance-weighted local flow smoothness (radar_loss.py:60-98)."""
    b, n, _ = pc1.shape
    sqrdist = pointops.square_distance(pc1, pc1)
    neg, kidx = lax.top_k(-sqrdist, num_nb + 1)  # ascending distances
    dists = jnp.maximum(-neg[:, :, 1:], 0.0)  # drop self
    kidx = kidx[:, :, 1:]

    w = jax.nn.softmax(
        jnp.exp(-dists / alpha).reshape(b, n * num_nb), axis=1
    ).reshape(b, n, num_nb)

    grouped = pointops.group_points(pred_flow, kidx)  # [B, N, K, 3]
    diff = _l2_norm(grouped - pred_flow[:, :, None, :])
    per_point = jnp.sum(n * w * diff, axis=2)
    return jnp.mean(per_point)


def radial_displacement_loss(
    pc1: Array, pred_f: Array, vel1: Array, interval: float = 0.1
) -> Array:
    """Doppler radial-projection consistency (radar_loss.py:100-122).

    NOTE the reference hardcodes interval=0.1 regardless of the sample's
    measured frame interval (radar_loss.py:104, `self.interval = 0.1`);
    VoD's interval is 0.1 s so the constant is kept as the default.
    """
    pred_fr = jnp.sum(pred_f * pc1, axis=-1) / jnp.linalg.norm(pc1, axis=-1)
    return jnp.mean(jnp.abs(vel1 * interval - pred_fr))


def self_supervised_loss(
    pc1: Array,
    pc2: Array,
    pred_f: Array,
    vel1: Array,
    w_sc: float = 1.0,
    w_ss: float = 1.0,
    w_rd: float = 1.0,
) -> Tuple[Array, Dict[str, Array]]:
    """Composite self-supervised loss (radar_loss.py:124-161)."""
    pc1_warp = pc1 + pred_f
    sc = soft_chamfer_loss(pc1, pc2, pc1_warp)
    ss = spatial_smoothness_loss(pc1, pred_f)
    rd = radial_displacement_loss(pc1, pred_f, vel1)
    total = w_sc * sc + w_ss * ss + w_rd * rd
    items = {
        "Loss": total,
        "chamferLoss": sc,
        "smoothnessLoss": ss,
        "veloLoss": rd,
    }
    return total, items


def ego_motion_loss(pc1: Array, pre_trans: Array, gt_trans: Array) -> Array:
    """Mean distance between pc1 moved by predicted vs gt transform
    (radar_loss.py:163-182)."""
    p_pre = se3.apply_transform(pc1, pre_trans)
    p_gt = se3.apply_transform(pc1, gt_trans)
    return jnp.mean(_l2_norm(p_pre - p_gt))


def _global_ratio(num: Array, den: Array, axis_name: Optional[str]) -> Array:
    """Count-normalized loss term with exact global-batch semantics under
    data parallelism.

    The reference computes these terms on the gathered full batch
    (nn.DataParallel gathers outputs before the loss).  Under shard_map each
    shard sees only its slice, so ``num/den`` locally then ``pmean`` is NOT
    the global ratio.  Since the denominators are label counts (zero
    gradient), the correctly-scaled per-shard term is
    ``G * num_local / max(psum(den), 1)``:
      * its pmean equals the global ratio (value parity), and
      * pmean of its gradient equals the global-batch gradient.
    """
    if axis_name is None:
        return num / jnp.maximum(den, 1.0)
    den_g = lax.psum(den, axis_name)
    g = lax.axis_size(axis_name)
    return g * num / jnp.maximum(den_g, 1.0)


def binary_cross_entropy(p: Array, y: Array) -> Array:
    """Elementwise BCE on probabilities, torch.nn.BCELoss-compatible
    (log clamped at -100)."""
    logp = jnp.maximum(jnp.log(p), -100.0)
    log1p = jnp.maximum(jnp.log1p(-p), -100.0)
    return -(y * logp + (1.0 - y) * log1p)


def motion_seg_loss(
    mseg_pre: Array, mseg_gt: Array, axis_name: Optional[str] = None
) -> Array:
    """Class-balanced BCE (radar_loss.py:184-205): mean over static points
    plus mean over moving points, halved."""
    bce = binary_cross_entropy(mseg_pre, mseg_gt)
    is0 = (mseg_gt == 0).astype(bce.dtype)
    is1 = (mseg_gt == 1).astype(bce.dtype)
    # the reference's fancy-indexed means assume both classes are present;
    # guard the denominators so an absent class contributes 0, not NaN
    mean0 = _global_ratio(jnp.sum(bce * is0), jnp.sum(is0), axis_name)
    mean1 = _global_ratio(jnp.sum(bce * is1), jnp.sum(is1), axis_name)
    return 0.5 * (mean0 + mean1)


def optical_flow_loss(
    opt: Array,
    radar_u: Array,
    radar_v: Array,
    pc1_warp: Array,
    mseg_gt: Array,
    projection: Array,
    t_camera_radar: Array,
    lower_bound: float = 0.25,
    axis_name: Optional[str] = None,
) -> Array:
    """Point-to-camera-ray reprojection loss on moving points
    (radar_loss.py:207-242)."""
    end_pixels = jnp.stack([radar_u, radar_v], axis=-1) + opt
    opt_div = cam.point_ray_distance(
        pc1_warp, end_pixels, projection, t_camera_radar
    )
    opt_div = jax.nn.relu(opt_div - lower_bound)
    moving = 1.0 - lax.stop_gradient(mseg_gt.astype(opt_div.dtype))
    return _global_ratio(jnp.sum(moving * opt_div), jnp.sum(moving),
                         axis_name)


def dynamic_flow_loss(
    pred_f: Array, gt_f: Array, dyn_mask: Array,
    axis_name: Optional[str] = None,
) -> Array:
    """Supervised flow loss on (pseudo-labelled) moving points
    (radar_loss.py:244-258).  ``dyn_mask``: 1 = static, 0 = moving."""
    moving = 1.0 - dyn_mask
    err = _l2_norm(gt_f - pred_f)
    return _global_ratio(jnp.sum(moving * err), jnp.sum(moving), axis_name)


def radar_flow_loss(
    model: str,
    pc1: Array,
    pc2: Array,
    pred_f: Array,
    vel1: Array,
    *,
    gt_f: Optional[Array] = None,
    pre_trans: Optional[Array] = None,
    mseg_pre: Optional[Array] = None,
    gt_trans: Optional[Array] = None,
    mseg_gt: Optional[Array] = None,
    dyn_mask: Optional[Array] = None,
    radar_u: Optional[Array] = None,
    radar_v: Optional[Array] = None,
    opt: Optional[Array] = None,
    projection: Optional[Array] = None,
    t_camera_radar: Optional[Array] = None,
    w_self: float = 1.0,
    w_em: float = 1.0,
    w_ms: float = 1.0,
    w_opt: float = 0.1,
    w_dyn: float = 1.0,
    axis_name: Optional[str] = None,
) -> Tuple[Array, Dict[str, Array]]:
    """Composite loss dispatcher (radar_loss.py:260-292).

    ``axis_name`` makes the count-normalized terms exact on the global
    batch under data parallelism (see :func:`_global_ratio`).
    """
    total, items = self_supervised_loss(pc1, pc2, pred_f, vel1)
    total = w_self * total

    if model in ("cmflow", "cmflow_t"):
        em = ego_motion_loss(pc1, pre_trans, gt_trans)
        ms = motion_seg_loss(mseg_pre, mseg_gt, axis_name)
        dyn = dynamic_flow_loss(pred_f, gt_f, dyn_mask, axis_name)
        opt_l = optical_flow_loss(
            opt, radar_u, radar_v, pc1 + pred_f, mseg_gt,
            projection, t_camera_radar, axis_name=axis_name,
        )
        total = total + w_em * em + w_ms * ms + w_opt * opt_l + w_dyn * dyn
        items.update(
            egoLoss=em, maskLoss=ms, opticalLoss=opt_l, superviseLoss=dyn
        )

    items["Loss"] = total
    return total, items


# Loss-item keys per model (losses/loss_dict.py equivalent)
LOSS_ITEMS = {
    "raflow": ("Loss", "chamferLoss", "veloLoss", "smoothnessLoss"),
    "cmflow": (
        "Loss", "chamferLoss", "veloLoss", "smoothnessLoss",
        "egoLoss", "maskLoss", "superviseLoss", "opticalLoss",
    ),
    "cmflow_t": (
        "Loss", "chamferLoss", "veloLoss", "smoothnessLoss",
        "egoLoss", "maskLoss", "superviseLoss", "opticalLoss",
    ),
}
