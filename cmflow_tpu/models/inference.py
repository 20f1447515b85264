"""Fused TPU inference engine.

A serving-path forward for the flagship models computed directly from a
flax ``variables`` dict — numerically equivalent to
``model.apply(..., train=False)`` (parity-tested), but with every
``PointLocalFeature`` encoder scale executed by the Pallas kernel in
:mod:`cmflow_tpu.ops.fused`: the ``[B, N, K, C]`` neighborhood tensors that
dominate the unfused forward's HBM traffic never leave VMEM.

BatchNorm running statistics are folded into per-channel affines (exact in
eval mode).  The cost volume, heads, and Kabsch stay in XLA — their
intermediates are ``[B, N, C]``-sized and already fusion-friendly.

Used by the eval step / benchmarks when ``cfg.fused_inference`` is on;
the flax module path remains the source of truth for training.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from cmflow_tpu.geometry import se3
from cmflow_tpu.models.backbone import BackboneConfig
from cmflow_tpu.nn.blocks import masked_global_max
from cmflow_tpu.ops import pointops
from cmflow_tpu.ops.fused import (
    fold_bn_affine,
    fused_point_local_feature,
    plf_params_from_variables,
)

Array = jax.Array


def _mse_fused(params, stats, radii, nsamples, xyz, feats, valid, interpret):
    """MultiScaleEncoder via the fused kernel (+ plain-jnp mlp2 tail)."""
    outs = []
    for i, (r, k) in enumerate(zip(radii, nsamples)):
        sp, ss = params[f"scale_{i}"], stats[f"scale_{i}"]
        chain, feat_w, mlp2 = plf_params_from_variables(sp, ss)
        idx = pointops.ball_query(r, k, xyz, xyz, valid)
        rel = pointops.group_points(xyz, idx) - xyz[:, :, None, :]
        feat_tx = jnp.einsum("bnc,cd->bnd", feats, feat_w)
        h = fused_point_local_feature(feat_tx, idx, rel, chain, interpret)
        for w, s, b in mlp2:
            h = jnp.maximum((h @ w) * s + b, 0.0)
        outs.append(h)
    return jnp.concatenate(outs, axis=-1)


def _cost_volume(p, xyz1, xyz2, f1, f2, valid1, valid2, k, interpret):
    """FeatureCorrelator eval forward via the fused Pallas kernels."""
    from cmflow_tpu.ops.fused import (cv_params_from_variables,
                                      fused_cost_volume)

    d1, d2 = f1.shape[-1], f2.shape[-1]
    w0 = p["w0"]

    knn_idx = pointops.knn(k, xyz1, xyz2, valid2)
    dirs = pointops.group_points(xyz2, knn_idx) - xyz1[:, :, None, :]
    knn1 = pointops.knn(k, xyz1, xyz1, valid1)
    dirs1 = pointops.group_points(xyz1, knn1) - xyz1[:, :, None, :]

    f1t = jnp.einsum("bnc,cd->bnd", f1, w0[:d1])
    f2t = jnp.einsum("bnc,cd->bnd", f2, w0[d1:d1 + d2])

    dense, wn1, wn2 = cv_params_from_variables(p)
    return fused_cost_volume(f1t, f2t, knn_idx, dirs, knn1, dirs1,
                             interpret, dense=dense, wn1=wn1, wn2=wn2)


def _head(p, s, x):
    """FlowHead / MotionHead mlp chain + final Dense (eval BN affine)."""
    for i in range(3):
        sc, bi = fold_bn_affine(p["mlp"][f"bn_{i}"], s["mlp"][f"bn_{i}"])
        x = jnp.maximum((x @ p["mlp"][f"dense_{i}"]["kernel"]) * sc + bi, 0.0)
    return x @ p["out"]["kernel"]


def _trunk(params, stats, cfg, pc1, pc2, ft1, ft2, valid1, valid2,
           interpret):
    mse_p, mse_s = params["mse_layer"], stats["mse_layer"]
    f1 = _mse_fused(mse_p, mse_s, cfg.sa_radii, cfg.sa_nsamples,
                    pc1, ft1, valid1, interpret)
    f2 = _mse_fused(mse_p, mse_s, cfg.sa_radii, cfg.sa_nsamples,
                    pc2, ft2, valid2, interpret)

    b, n1, _ = pc1.shape
    n2 = pc2.shape[1]
    g1 = masked_global_max(f1, valid1)
    g2 = masked_global_max(f2, valid2)
    f1 = jnp.concatenate(
        [f1, jnp.broadcast_to(g1[:, None], (b, n1, g1.shape[-1]))], axis=-1)
    f2 = jnp.concatenate(
        [f2, jnp.broadcast_to(g2[:, None], (b, n2, g2.shape[-1]))], axis=-1)

    cor = _cost_volume(params["fc_layer"], pc1, pc2, f1, f2,
                       valid1, valid2, cfg.fc_nsample, interpret)

    emb = jnp.concatenate([ft1, f1, cor], axis=-1)
    return _mse_fused(params["mse_layer2"], stats["mse_layer2"],
                      cfg.sa_radii, cfg.sa_nsamples, pc1, emb, valid1,
                      interpret)


def cmflow_infer(
    variables,
    pc1: Array,
    pc2: Array,
    ft1: Array,
    ft2: Array,
    valid1: Optional[Array] = None,
    valid2: Optional[Array] = None,
    stat_thres: float = 0.5,
    cfg: BackboneConfig = BackboneConfig(),
    interpret: bool = False,
) -> Tuple[Array, Array, Array, Array]:
    """Fused CMFlow eval forward — same outputs as
    ``CMFlow.apply(..., train=False)`` (models/cmflow.py:42-92)."""
    params = variables["params"]
    stats = variables["batch_stats"]

    prop = _trunk(params["trunk"], stats["trunk"], cfg,
                  pc1, pc2, ft1, ft2, valid1, valid2, interpret)
    b, n, _ = pc1.shape
    g = masked_global_max(prop, valid1)
    final = jnp.concatenate(
        [prop, jnp.broadcast_to(g[:, None], (b, n, g.shape[-1]))], axis=-1)

    output = _head(params["fp"], stats["fp"], final)
    stat_cls = jax.nn.sigmoid(_head(params["mp"], stats["mp"], final))[..., 0]

    mask = stat_cls > stat_thres
    if valid1 is not None:
        mask = jnp.logical_and(mask, valid1)

    w = stat_cls + 1e-4
    if valid1 is not None:
        w = w * valid1
    w = w / jnp.sum(w, axis=1, keepdims=True)
    pre_trans = se3.weighted_kabsch(
        pc1, pc1 + output, w, centroid="sum", reflect="row")

    sf_rg = se3.rigid_to_flow(pc1, pre_trans)
    sf_agg = jnp.where(mask[..., None], sf_rg, output)
    return sf_agg, stat_cls, pre_trans, mask


def _gru_cell(p, h, x):
    """flax ``nn.GRUCell`` forward from raw params (models/cmflow_t.py
    GRU; gate order r, z, n with the candidate's hidden bias separate)."""
    r = jax.nn.sigmoid(x @ p["ir"]["kernel"] + p["ir"]["bias"]
                       + h @ p["hr"]["kernel"])
    z = jax.nn.sigmoid(x @ p["iz"]["kernel"] + p["iz"]["bias"]
                       + h @ p["hz"]["kernel"])
    n = jnp.tanh(x @ p["in"]["kernel"] + p["in"]["bias"]
                 + r * (h @ p["hn"]["kernel"] + p["hn"]["bias"]))
    return (1.0 - z) * n + z * h


def cmflow_t_infer(
    variables,
    pc1: Array,
    pc2: Array,
    ft1: Array,
    ft2: Array,
    gfeat: Array,
    valid1: Optional[Array] = None,
    valid2: Optional[Array] = None,
    stat_thres: float = 0.5,
    cfg: BackboneConfig = BackboneConfig(),
    interpret: bool = False,
) -> Tuple[Array, Array, Array, Array, Array]:
    """Fused CMFlow_T eval forward — same outputs (incl. the new GRU carry)
    as ``CMFlowT.apply(..., train=False)`` (models/cmflow_t.py:46-100)."""
    params = variables["params"]
    stats = variables["batch_stats"]

    prop = _trunk(params["trunk"], stats["trunk"], cfg,
                  pc1, pc2, ft1, ft2, valid1, valid2, interpret)
    pooled = masked_global_max(prop, valid1)
    gfeat_new = _gru_cell(params["gru"], gfeat, pooled)

    b, n, _ = pc1.shape
    final = jnp.concatenate(
        [prop, jnp.broadcast_to(gfeat_new[:, None],
                                (b, n, gfeat_new.shape[-1]))], axis=-1)

    output = _head(params["fp"], stats["fp"], final)
    stat_cls = jax.nn.sigmoid(_head(params["mp"], stats["mp"], final))[..., 0]

    mask = stat_cls > stat_thres
    if valid1 is not None:
        mask = jnp.logical_and(mask, valid1)

    # CMFlow_T normalizes raw scores without the +1e-4 floor
    # (cmflow_t.py:118-120)
    w = stat_cls
    if valid1 is not None:
        w = w * valid1
    w = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-12)
    pre_trans = se3.weighted_kabsch(
        pc1, pc1 + output, w, centroid="sum", reflect="row")

    sf_rg = se3.rigid_to_flow(pc1, pre_trans)
    sf_agg = jnp.where(mask[..., None], sf_rg, output)
    return sf_agg, stat_cls, pre_trans, mask, gfeat_new


def raflow_infer(
    variables,
    pc1: Array,
    pc2: Array,
    ft1: Array,
    ft2: Array,
    interval: Array,
    valid1: Optional[Array] = None,
    valid2: Optional[Array] = None,
    rigid_thres: float = 0.15,
    rigid_pcs: float = 0.25,
    cfg: BackboneConfig = BackboneConfig(),
    interpret: bool = False,
) -> Tuple[Array, Array, Array, Array]:
    """Fused RaFlow eval forward (models/raflow.py:38-105)."""
    params = variables["params"]
    stats = variables["batch_stats"]

    prop = _trunk(params["trunk"], stats["trunk"], cfg,
                  pc1, pc2, ft1, ft2, valid1, valid2, interpret)
    b, n, _ = pc1.shape
    g = masked_global_max(prop, valid1)
    final = jnp.concatenate(
        [prop, jnp.broadcast_to(g[:, None], (b, n, g.shape[-1]))], axis=-1)
    output = _head(params["fp"], stats["fp"], final)

    pc1_warp = pc1 + output
    if valid1 is not None:
        all_mask = valid1.astype(pc1.dtype)
        n_valid = jnp.sum(all_mask, axis=1)
    else:
        all_mask = jnp.ones((b, n), pc1.dtype)
        n_valid = jnp.full((b,), float(n), pc1.dtype)

    trans = se3.weighted_kabsch(
        pc1, pc1_warp, all_mask, centroid="mean_n", reflect="row",
        n_override=n_valid)
    sf_rg = se3.rigid_to_flow(pc1, trans)

    vel1 = ft1[..., 0]
    sf_proj = jnp.sum(sf_rg * pc1, axis=-1) / jnp.linalg.norm(pc1, axis=-1)
    residual = vel1 * interval[:, None] - sf_proj
    mask_s = jnp.abs(residual / vel1) < rigid_thres
    if valid1 is not None:
        mask_s = jnp.logical_and(mask_s, valid1)

    refit = se3.weighted_kabsch(
        pc1, pc1_warp, mask_s.astype(pc1.dtype), centroid="mean_n",
        reflect="row", n_override=n_valid)
    frac = jnp.sum(mask_s, axis=1) / n_valid
    use_refit = frac > rigid_pcs

    pre_trans = jnp.where(use_refit[:, None, None], refit, trans)
    sf_refit = se3.rigid_to_flow(pc1, refit)
    take_rigid = jnp.logical_and(use_refit[:, None], mask_s)
    sf_agg = jnp.where(take_rigid[..., None], sf_refit, output)
    return output, sf_agg, pre_trans, mask_s
