"""Fused TRAINING forward — Pallas recompute-VJP ops end to end.

Mirrors ``CMFlow.apply(..., train=True, mutable=["batch_stats"])``
(models/cmflow.py, reference models/cmflow.py:171-197) but runs every
grouped-MLP encoder and the cost volume through the custom-VJP Pallas ops
of :mod:`cmflow_tpu.ops.fused_train`, so no ``[B, N, K, C]`` neighborhood
tensor is ever materialized in HBM — in the forward or the backward.

Train-mode BatchNorm: per layer the Pallas stats op reduces the grouped
pre-activations to per-channel (sum, sum²) on the fly; batch mean/var and
the folded affine are formed in plain JAX (so autodiff composes the exact
gradient-through-statistics backward), and flax-identical running updates
(momentum 0.9, fast variance, biased var) are collected into a new
``batch_stats`` tree.  Per-point (non-grouped) BatchNorms — the encoder
mlp2 tails and the heads — are cheap at [B, N, C] and stay in plain JAX.

Cross-replica BN under data parallelism uses ``lax.pmean`` over
``axis_name`` on the batch means, matching flax's ``BatchNorm(axis_name)``
semantics in the unfused path.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from cmflow_tpu.geometry import se3
from cmflow_tpu.models.backbone import BackboneConfig
from cmflow_tpu.nn.blocks import masked_global_max
from cmflow_tpu.ops import pointops
from cmflow_tpu.ops.fused_train import (
    cost_volume_train,
    plf_apply,
    plf_prebn_stats,
)

Array = jax.Array
EPS = 1e-5
MOMENTUM = 0.9


def _pmean(x, axis_name):
    return lax.pmean(x, axis_name) if axis_name else x


def _bn_update(old, mean, var):
    return {"mean": MOMENTUM * old["mean"] + (1 - MOMENTUM) * mean,
            "var": MOMENTUM * old["var"] + (1 - MOMENTUM) * var}


def _bn_train_pointwise(x, bn_p, bn_s, axis_name):
    """flax train-mode BatchNorm over all leading axes of ``x`` [..., C].
    Returns (y, batch_mean, batch_var)."""
    axes = tuple(range(x.ndim - 1))
    mu = _pmean(jnp.mean(x, axis=axes), axis_name)
    mu2 = _pmean(jnp.mean(x * x, axis=axes), axis_name)
    var = jnp.maximum(0.0, mu2 - mu * mu)
    y = (x - mu) * lax.rsqrt(var + EPS) * bn_p["scale"] + bn_p["bias"]
    return y, mu, var


def _pointwise_mlp_train(p, s, x, num, axis_name):
    """[Dense -> BN(train) -> ReLU] x num over the channel axis; returns
    (y, new_stats)."""
    new_s = {}
    for i in range(num):
        x = x @ p[f"dense_{i}"]["kernel"]
        x, mu, var = _bn_train_pointwise(x, p[f"bn_{i}"], s[f"bn_{i}"],
                                         axis_name)
        new_s[f"bn_{i}"] = _bn_update(s[f"bn_{i}"], mu, var)
        x = jnp.maximum(x, 0.0)
    return x, new_s


def _plf_train(sp, ss, radius, nsample, xyz, feats, valid, axis_name,
               interpret):
    """One PointLocalFeature scale in train mode (nn/blocks.py:117-152,
    reference radarflow_util.py:121-162).  Returns (h, new_scale_stats)."""
    w0 = sp["w0"]
    wrel, feat_w = w0[:3], w0[3:]
    idx = pointops.ball_query(radius, nsample, xyz, xyz, valid)
    feat_tx = jnp.einsum("bnc,cd->bnd", feats, feat_w,
                         preferred_element_type=jnp.float32)

    b, n, _ = feat_tx.shape
    cnt = b * n * nsample

    bn_list = [("bn0", sp["bn0"], ss["bn0"])]
    dense_ws = []
    num_mlp = len([k for k in sp.get("mlp", {}) if k.startswith("dense_")])
    for i in range(num_mlp):
        dense_ws.append(sp["mlp"][f"dense_{i}"]["kernel"])
        bn_list.append((f"mlp/bn_{i}", sp["mlp"][f"bn_{i}"],
                        ss["mlp"][f"bn_{i}"]))

    affines = []
    prev: Tuple[Array, ...] = ()
    bn_updates = {}
    for depth, (name, bn_p, bn_s) in enumerate(bn_list):
        ssum, ssq = plf_prebn_stats(depth, interpret, feat_tx, idx, xyz,
                                    wrel, *prev)
        mu = _pmean(ssum / cnt, axis_name)
        mu2 = _pmean(ssq / cnt, axis_name)
        var = jnp.maximum(0.0, mu2 - mu * mu)
        bn_updates[name] = _bn_update(bn_s, mu, var)
        sc = bn_p["scale"] * lax.rsqrt(var + EPS)
        bi = bn_p["bias"] - mu * sc
        affines += [sc, bi]
        if depth < len(bn_list) - 1:
            affines.append(dense_ws[depth])
            prev = tuple(affines)

    h = plf_apply(interpret, feat_tx, idx, xyz, wrel, *affines)

    h, mlp2_stats = _pointwise_mlp_train(
        sp["mlp2"], ss["mlp2"], h,
        len([k for k in sp["mlp2"] if k.startswith("dense_")]), axis_name)

    new_ss = {"bn0": bn_updates["bn0"],
              "mlp": {f"bn_{i}": bn_updates[f"mlp/bn_{i}"]
                      for i in range(num_mlp)},
              "mlp2": mlp2_stats}
    return h, new_ss


def _mse_train_packed(mse_p, mse_s, radii, nsamples, xyz, feats, valid,
                      axis_name, interpret):
    """Narrow MultiScaleEncoder train forward — ALL scales in packed
    block-diagonal kernels with the stacked-base gather (the per-scale
    path runs latency-bound at <=12% MXU lane utilization)."""
    from jax.scipy.linalg import block_diag

    from cmflow_tpu.ops.fused import (center_xyz, make_mse_base,
                                      shift_idx_stack)
    from cmflow_tpu.ops.fused_train import mse_apply, mse_prebn_stats

    s_cnt = len(radii)
    b, n, _ = feats.shape
    idx_list = [pointops.ball_query(r, k, xyz, xyz, valid)
                for r, k in zip(radii, nsamples)]
    scales_p = [mse_p[f"scale_{s}"] for s in range(s_cnt)]
    scales_s = [mse_s[f"scale_{s}"] for s in range(s_cnt)]
    w0r_list = [sp["w0"][:3] for sp in scales_p]
    w0f_list = [sp["w0"][3:] for sp in scales_p]

    xyz_c = center_xyz(xyz)
    base = make_mse_base(feats, xyz_c, w0r_list, w0f_list)
    w0r_cat = jnp.concatenate(w0r_list, axis=1)
    idx_sh = shift_idx_stack(idx_list, tuple(nsamples), n)

    def bn_of(layer, sp, ss):
        if layer == 0:
            return sp["bn0"], ss["bn0"]
        return sp["mlp"][f"bn_{layer - 1}"], ss["mlp"][f"bn_{layer - 1}"]

    num_layers = 1 + len(
        [k for k in scales_p[0].get("mlp", {}) if k.startswith("dense_")])
    ws_bd = [None] + [
        block_diag(*[sp["mlp"][f"dense_{i}"]["kernel"] for sp in scales_p])
        for i in range(num_layers - 1)]
    widths = tuple(
        sum(bn_of(layer, sp, ss)[0]["scale"].shape[0]
            for sp, ss in zip(scales_p, scales_s))
        for layer in range(num_layers))
    nsamples = tuple(nsamples)

    affines = []
    prev: Tuple[Array, ...] = ()
    mus, vars = [], []
    for layer in range(num_layers):
        ssum, ssq = mse_prebn_stats(layer, interpret, nsamples, widths,
                                    base, idx_sh, xyz_c, w0r_cat, *prev)
        # per-channel counts differ per scale block: B*N*K_s
        each = widths[layer] // s_cnt
        cnt = jnp.asarray(
            np.repeat(np.asarray(nsamples, np.float64) * b * n, each)
            .astype(np.float32))
        mu = _pmean(ssum / cnt, axis_name)
        mu2 = _pmean(ssq / cnt, axis_name)
        var = jnp.maximum(0.0, mu2 - mu * mu)
        mus.append(mu)
        vars.append(var)
        gamma = jnp.concatenate(
            [bn_of(layer, sp, ss)[0]["scale"]
             for sp, ss in zip(scales_p, scales_s)])
        beta = jnp.concatenate(
            [bn_of(layer, sp, ss)[0]["bias"]
             for sp, ss in zip(scales_p, scales_s)])
        sc = gamma * lax.rsqrt(var + EPS)
        bi = beta - mu * sc
        affines += [sc, bi]
        if layer < num_layers - 1:
            affines.append(ws_bd[layer + 1])
            prev = tuple(affines)

    out_each = widths[-1] // s_cnt
    h = mse_apply(interpret, nsamples, out_each, base, idx_sh, xyz_c,
                  w0r_cat, *affines)

    # packed per-point mlp2 tail (block-diagonal Dense + train BN; channel
    # blocks stay in scale order, matching the flax concat)
    num_mlp2 = len(
        [k for k in scales_p[0]["mlp2"] if k.startswith("dense_")])
    mlp2_mus, mlp2_vars = [], []
    for i in range(num_mlp2):
        w_bd = block_diag(
            *[sp["mlp2"][f"dense_{i}"]["kernel"] for sp in scales_p])
        h = h @ w_bd
        gamma = jnp.concatenate(
            [sp["mlp2"][f"bn_{i}"]["scale"] for sp in scales_p])
        beta = jnp.concatenate(
            [sp["mlp2"][f"bn_{i}"]["bias"] for sp in scales_p])
        axes = tuple(range(h.ndim - 1))
        mu = _pmean(jnp.mean(h, axis=axes), axis_name)
        mu2 = _pmean(jnp.mean(h * h, axis=axes), axis_name)
        var = jnp.maximum(0.0, mu2 - mu * mu)
        mlp2_mus.append(mu)
        mlp2_vars.append(var)
        h = jnp.maximum(
            (h - mu) * lax.rsqrt(var + EPS) * gamma + beta, 0.0)

    # slice the packed batch stats back into per-scale trees
    new_s = {}
    for s in range(s_cnt):
        sp, ss = scales_p[s], scales_s[s]
        tree = {"mlp": {}, "mlp2": {}}
        for layer in range(num_layers):
            each = widths[layer] // s_cnt
            sl = slice(s * each, (s + 1) * each)
            upd = _bn_update(bn_of(layer, sp, ss)[1],
                             mus[layer][sl], vars[layer][sl])
            if layer == 0:
                tree["bn0"] = upd
            else:
                tree["mlp"][f"bn_{layer - 1}"] = upd
        for i in range(num_mlp2):
            each = mlp2_mus[i].shape[0] // s_cnt
            sl = slice(s * each, (s + 1) * each)
            tree["mlp2"][f"bn_{i}"] = _bn_update(
                ss["mlp2"][f"bn_{i}"], mlp2_mus[i][sl], mlp2_vars[i][sl])
        new_s[f"scale_{s}"] = tree
    return h, new_s


def _mse_train(mse_p, mse_s, radii, nsamples, xyz, feats, valid, axis_name,
               interpret):
    """MultiScaleEncoder train forward; returns (h, new_stats).

    Narrow encoders (per-scale C1 < 128: the sa encoder) run ALL scales
    through the packed stacked-base kernels; wide ones (the propagation
    encoder, C1=512) per scale."""
    if mse_p["scale_0"]["w0"].shape[1] < 128:
        return _mse_train_packed(mse_p, mse_s, radii, nsamples, xyz,
                                 feats, valid, axis_name, interpret)
    outs, new_s = [], {}
    for i, (r, k) in enumerate(zip(radii, nsamples)):
        h, s_i = _plf_train(mse_p[f"scale_{i}"], mse_s[f"scale_{i}"],
                            r, k, xyz, feats, valid, axis_name, interpret)
        outs.append(h)
        new_s[f"scale_{i}"] = s_i
    return jnp.concatenate(outs, axis=-1), new_s


def _cv_train(p, xyz1, xyz2, f1, f2, valid1, valid2, k, interpret):
    """FeatureCorrelator train forward (no BatchNorm — stats-free)."""
    d1 = f1.shape[-1]
    d2 = f2.shape[-1]
    w0 = p["w0"]
    knn_idx = pointops.knn(k, xyz1, xyz2, valid2)
    knn1 = pointops.knn(k, xyz1, xyz1, valid1)
    f1t = jnp.einsum("bnc,cd->bnd", f1, w0[:d1],
                     preferred_element_type=jnp.float32)
    f2t = jnp.einsum("bnc,cd->bnd", f2, w0[d1:d1 + d2],
                     preferred_element_type=jnp.float32)
    dense = (w0[d1 + d2:], p["b0"],
             p["mlp"]["dense_0"]["kernel"], p["mlp"]["dense_0"]["bias"],
             p["mlp"]["dense_1"]["kernel"], p["mlp"]["dense_1"]["bias"])

    def wn(q):
        return (q["dense_0"]["kernel"], q["dense_0"]["bias"],
                q["dense_1"]["kernel"], q["dense_1"]["bias"],
                q["dense_2"]["kernel"], q["dense_2"]["bias"])

    return cost_volume_train(interpret, f1t, f2t, knn_idx, knn1,
                             xyz1, xyz2, dense, wn(p["weightnet1"]),
                             wn(p["weightnet2"]))


def _head_train(p, s, x, axis_name):
    """FlowHead / MotionHead mlp chain + final Dense in train mode."""
    h, new_s = _pointwise_mlp_train(p["mlp"], s["mlp"], x, 3, axis_name)
    return h @ p["out"]["kernel"], {"mlp": new_s}


def trunk_train(params, stats, cfg: BackboneConfig, pc1, pc2, ft1, ft2,
                valid1, valid2, axis_name, interpret):
    """SceneFlowTrunk train forward (models/backbone.py:86-128).

    The shared sa encoder is applied to frame 1 then frame 2, with the
    running-stat update applied twice sequentially — exactly what flax
    does when one BatchNorm module is called twice in one apply."""
    mse_p, mse_s = params["mse_layer"], stats["mse_layer"]
    f1, s_after1 = _mse_train(mse_p, mse_s, cfg.sa_radii, cfg.sa_nsamples,
                              pc1, ft1, valid1, axis_name, interpret)
    f2, s_after2 = _mse_train(mse_p, s_after1, cfg.sa_radii,
                              cfg.sa_nsamples, pc2, ft2, valid2, axis_name,
                              interpret)

    b, n1, _ = pc1.shape
    n2 = pc2.shape[1]
    g1 = masked_global_max(f1, valid1)
    g2 = masked_global_max(f2, valid2)
    f1 = jnp.concatenate(
        [f1, jnp.broadcast_to(g1[:, None], (b, n1, g1.shape[-1]))], axis=-1)
    f2 = jnp.concatenate(
        [f2, jnp.broadcast_to(g2[:, None], (b, n2, g2.shape[-1]))], axis=-1)

    cor = _cv_train(params["fc_layer"], pc1, pc2, f1, f2, valid1, valid2,
                    cfg.fc_nsample, interpret)

    emb = jnp.concatenate([ft1, f1, cor], axis=-1)
    prop, s_l2 = _mse_train(params["mse_layer2"], stats["mse_layer2"],
                            cfg.sa_radii, cfg.sa_nsamples, pc1, emb,
                            valid1, axis_name, interpret)
    return prop, {"mse_layer": s_after2, "mse_layer2": s_l2}


def cmflow_train_apply(
    variables,
    pc1: Array,
    pc2: Array,
    ft1: Array,
    ft2: Array,
    label_m: Optional[Array],
    valid1: Optional[Array] = None,
    valid2: Optional[Array] = None,
    stat_thres: float = 0.5,
    cfg: BackboneConfig = BackboneConfig(),
    axis_name: Optional[str] = None,
    interpret: bool = False,
):
    """Drop-in for ``CMFlow.apply(..., train=True, mutable=["batch_stats"])``
    — returns ``((sf_agg, stat_cls, pre_trans, mask), new_batch_stats)``."""
    params, stats = variables["params"], variables["batch_stats"]

    prop, trunk_stats = trunk_train(
        params["trunk"], stats["trunk"], cfg, pc1, pc2, ft1, ft2,
        valid1, valid2, axis_name, interpret)

    b, n, _ = pc1.shape
    g = masked_global_max(prop, valid1)
    final = jnp.concatenate(
        [prop, jnp.broadcast_to(g[:, None], (b, n, g.shape[-1]))], axis=-1)

    output, fp_stats = _head_train(params["fp"], stats["fp"], final,
                                   axis_name)
    logit, mp_stats = _head_train(params["mp"], stats["mp"], final,
                                  axis_name)
    stat_cls = jax.nn.sigmoid(logit)[..., 0]

    # training uses the pseudo mask label for ego-motion (cmflow.py:180-185)
    scores = label_m if label_m is not None else stat_cls
    mask = scores > stat_thres
    if valid1 is not None:
        mask = jnp.logical_and(mask, valid1)

    w = scores + 1e-4
    if valid1 is not None:
        w = w * valid1
    w = w / jnp.sum(w, axis=1, keepdims=True)
    pre_trans = se3.weighted_kabsch(pc1, pc1 + output, w,
                                    centroid="sum", reflect="row")
    sf_rg = se3.rigid_to_flow(pc1, pre_trans)
    sf_agg = jnp.where(mask[..., None], sf_rg, output)

    new_stats = {"trunk": trunk_stats, "fp": fp_stats, "mp": mp_stats}
    return (sf_agg, stat_cls, pre_trans, mask), new_stats
