"""On-device (jnp) per-frame metric battery for the production eval loop.

Same math as :mod:`cmflow_tpu.evaluation.metrics` (utils/eval_util.py:4-112)
but jittable, so the eval loop can ACCUMULATE metric sums on device and pay
ONE fetch RPC per epoch instead of one per batch — on the tunneled runtime
each fetch costs ~70-170 ms of pure latency regardless of size, which was
the entire end-to-end bottleneck (consume 5.4 s of a 6.0 s 2048-frame
epoch).  Parity with the host battery is pinned by
tests/test_metrics.py::TestDeviceMetricsParity.

Differences from the host path, both below f32 noise for real inputs:
  * computed in f32 (the host path upcasts to f64);
  * the RPE rotation angle uses atan2(|skew(R)|/2, (tr(R)-1)/2) instead of
    scipy's rotvec — algebraically identical, and accurate for small
    angles where arccos would lose half the significant digits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cmflow_tpu.evaluation.metrics import LIDAR_RES, RADAR_RES

Array = jax.Array

# metric slot order in the packed [B, 14] per-frame vector
METRIC_KEYS = ("rne", "50-50 rne", "mov_rne", "stat_rne", "sas", "ras",
               "epe", "accs", "accr", "acc", "miou", "sen", "RTE", "RAE")


def _cartesian_res(pc: Array, res) -> Array:
    rv = jnp.array([res["r_res"], res["theta_res"], res["phi_res"]],
                   pc.dtype)
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    r = jnp.sqrt(x * x + y * y + z * z)
    theta = jnp.arcsin(z / r)
    phi = jnp.arctan2(y, x)
    grad_x = jnp.stack(
        (jnp.cos(phi) * jnp.cos(theta), -r * jnp.sin(theta) * jnp.cos(phi),
         -r * jnp.cos(theta) * jnp.sin(phi)), axis=-1)
    grad_y = jnp.stack(
        (jnp.sin(phi) * jnp.cos(theta), -r * jnp.sin(phi) * jnp.sin(theta),
         r * jnp.cos(theta) * jnp.cos(phi)), axis=-1)
    grad_z = jnp.stack(
        (jnp.sin(theta), r * jnp.cos(theta), jnp.zeros_like(r)), axis=-1)
    x_res = jnp.sum(jnp.abs(grad_x) * rv, axis=-1)
    y_res = jnp.sum(jnp.abs(grad_y) * rv, axis=-1)
    z_res = jnp.sum(jnp.abs(grad_z) * rv, axis=-1)
    return jnp.stack((x_res, y_res, z_res), axis=-1)


def frame_metrics(pc1: Array, pred_f: Array, labels: Array, mask: Array,
                  valid: Array, gt_trans: Array, pred_trans: Array,
                  pred_m: Array) -> Array:
    """Per-frame metric vector ``[B, 14]`` in METRIC_KEYS order."""
    valid = valid.astype(jnp.float32)
    nv = jnp.sum(valid, axis=1)

    error = jnp.sqrt(jnp.sum((pred_f - labels) ** 2, -1) + 1e-20)
    gtflow_len = jnp.sqrt(jnp.sum(labels * labels, -1) + 1e-20)

    def fmean(x):
        return jnp.sum(x * valid, 1) / nv

    epe = fmean(error)
    accs = fmean(jnp.logical_or(error <= 0.05,
                                error / gtflow_len <= 0.05))
    accr = fmean(jnp.logical_or(error <= 0.10,
                                error / gtflow_len <= 0.10))

    res_r = jnp.sqrt(jnp.sum(_cartesian_res(pc1, RADAR_RES), -1) + 1e-20)
    res_l = jnp.sqrt(jnp.sum(_cartesian_res(pc1, LIDAR_RES), -1) + 1e-20)
    re_error = error / (res_r / res_l)
    re_error = jnp.where(valid > 0, re_error, 0.0)  # pc=0 padding -> nan

    is_mov = (mask == 0) * valid
    is_stat = (mask == 1) * valid
    rne = fmean(re_error)
    mov_rne = jnp.sum(re_error * is_mov, 1) / (jnp.sum(is_mov, 1) + 1e-6)
    stat_rne = jnp.sum(re_error * is_stat, 1) / jnp.sum(is_stat, 1)
    avg_rne = (mov_rne + stat_rne) / 2

    sas = fmean(jnp.logical_or(re_error <= 0.10,
                               re_error / gtflow_len <= 0.10))
    ras = fmean(jnp.logical_or(re_error <= 0.20,
                               re_error / gtflow_len <= 0.20))

    # motion segmentation (eval_util.py:99-112)
    pm = pred_m.astype(jnp.float32)
    gm = mask
    tp = jnp.sum((pm == 1) * (gm == 1) * valid, 1)
    tn = jnp.sum((pm == 0) * (gm == 0) * valid, 1)
    fp = jnp.sum((pm == 1) * (gm == 0) * valid, 1)
    fn = jnp.sum((pm == 0) * (gm == 1) * valid, 1)
    acc = (tp + tn) / (tp + tn + fp + fn)
    sen = tp / (tp + fn + 1e-10)
    miou = 0.5 * (tp / (tp + fp + fn + 1e-10)
                  + tn / (tn + fp + fn + 1e-10))

    # RPE (odometry_util.py:34-142): rel = inv(gt) @ pred
    r_inv = jnp.swapaxes(gt_trans[:, :3, :3], 1, 2)
    t_inv = -jnp.einsum("bij,bj->bi", r_inv, gt_trans[:, :3, 3])
    rel_r = jnp.einsum("bij,bjk->bik", r_inv, pred_trans[:, :3, :3])
    rel_t = jnp.einsum("bij,bj->bi", r_inv, pred_trans[:, :3, 3]) + t_inv
    rte = jnp.linalg.norm(rel_t, axis=1)
    skew = 0.5 * (rel_r - jnp.swapaxes(rel_r, 1, 2))
    sin_n = jnp.sqrt(skew[:, 2, 1] ** 2 + skew[:, 0, 2] ** 2
                     + skew[:, 1, 0] ** 2)
    cos_t = 0.5 * (jnp.trace(rel_r, axis1=1, axis2=2) - 1.0)
    rae = jnp.abs(jnp.arctan2(sin_n, cos_t)) * (180.0 / jnp.pi)

    return jnp.stack([rne, avg_rne, mov_rne, stat_rne, sas, ras, epe,
                      accs, accr, acc, miou, sen, rte, rae], axis=1)


def accumulate(sums: Array, count: Array, frame_vec: Array,
               keep: Array) -> tuple:
    """Fold a batch's per-frame metric vectors into running device sums.

    ``keep`` [B] masks padding lanes / empty frames.  Returns
    (new_sums [14], new_count []).
    """
    k = keep.astype(frame_vec.dtype)
    return sums + jnp.sum(frame_vec * k[:, None], axis=0), \
        count + jnp.sum(k)
