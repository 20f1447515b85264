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
from jax import lax

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


def _cast_chain(chain, dtype):
    """Cast the matmul weights of a PLF chain tuple (wrel + dense kernels)
    to ``dtype``; BN affine scale/bias stay f32 (applied post-accumulate)."""
    out = list(chain)
    for i in range(0, len(out), 3):
        out[i] = out[i].astype(dtype)
    return tuple(out)


def _dot32(x, w, dtype):
    """Matmul in ``dtype`` with f32 accumulation.

    Leading dims are flattened to keep this a plain 2-D matmul: the TPU
    backend lowers some batched 3-D dots through SpatialMajorConvolution,
    whose fusion cost model hard-crashes (SIGABRT in fusion_util.cc
    TransformWindow) on bf16 [64,256,256]-class shapes."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    out = jnp.dot(x2.astype(dtype), w.astype(dtype),
                  preferred_element_type=jnp.float32)
    return out.reshape(*lead, w.shape[-1])


def _fanin_dot(parts, w, dtype):
    """``concat(parts, -1) @ w`` without materializing the concatenation.

    ``parts`` are ``[B, N, Ci]`` tensors or ``[B, Ci]`` broadcast terms
    (global features); ``w``'s rows are sliced per part.  The wide
    concatenated activations of the serving path (``emb`` [B,N,1027],
    ``f1``/``f2`` [B,N,512], ``final`` [B,N,512]) only ever feed matmuls,
    so the partial-dot sum deletes their HBM round trips — and broadcast
    parts collapse to O(B) instead of O(B·N) matmul work.  Exact up to
    f32-accumulate reassociation across the row blocks."""
    out = None
    row = 0
    for p in parts:
        c = p.shape[-1]
        ws = w[row:row + c]
        row += c
        term = _dot32(p, ws, dtype)
        if p.ndim == 2:
            term = term[:, None, :]
        out = term if out is None else out + term
    assert row == w.shape[0], (row, w.shape)
    return out


def _parts_width(parts):
    return sum(p.shape[-1] for p in parts)


def _ball_query_all(radii, nsamples, xyz, valid):
    """All scales' ball queries — ONE sort-free Pallas kernel on TPU
    (ops/neighbors.py shares the distance tile and prefix-count matmul
    across radii), per-scale XLA top-k elsewhere."""
    from cmflow_tpu.ops.neighbors import ball_query_multi, pallas_ok

    if jax.default_backend() == "tpu" and pallas_ok(xyz, xyz):
        return list(ball_query_multi(tuple(radii), tuple(nsamples),
                                     xyz, xyz, points_valid=valid))
    return [pointops.ball_query(r, k, xyz, xyz, valid)
            for r, k in zip(radii, nsamples)]


def _mse_fused(params, stats, radii, nsamples, xyz, feats, valid, interpret,
               dtype=jnp.float32, idx_list=None):
    """MultiScaleEncoder via the fused kernels (+ plain-jnp mlp2 tail).

    Narrow encoders (per-scale width < 128, i.e. the sa encoder) run all
    scales in ONE block-diagonally packed kernel at full MXU width; wide
    encoders (the propagation encoder, C1=512) keep per-scale kernels.

    ``idx_list`` lets the caller share ball-query results: the sa and
    propagation encoders query the SAME xyz with the SAME radii, and the
    optimization_barrier between the stages blocks XLA's CSE from
    deduplicating the [B,N,N] distance sorts (~0.4 ms each)."""
    first_w0 = params["scale_0"]["w0"]
    narrow = first_w0.shape[1] < 128
    if idx_list is None:
        idx_list = _ball_query_all(radii, nsamples, xyz, valid)
    feat_parts = feats if isinstance(feats, (tuple, list)) else (feats,)
    if narrow:
        assert len(feat_parts) == 1, "packed narrow path takes one tensor"
        from cmflow_tpu.ops.fused import (fused_multi_scale_encoder,
                                          mse_narrow_params_from_variables)

        packed, mlp2_bd = mse_narrow_params_from_variables(
            params, stats, len(radii), dtype)
        out_each = packed[-1].shape[-1] // len(radii)
        h = fused_multi_scale_encoder(
            feats.astype(dtype), idx_list, xyz, packed,
            tuple(nsamples), interpret, out_each)
        # the mlp2 tail stays in XLA glue deliberately: measured in-kernel
        # (per-tile [128, C] matmuls after the pool) it costs MORE than
        # XLA's one [B*N, C] launch (+0.27 ms kernels vs -0.21 ms glue)
        for w, s, b in mlp2_bd:
            h = jnp.maximum(_dot32(h, w, dtype) * s + b, 0.0)
        return h

    outs = []
    for i, (r, k) in enumerate(zip(radii, nsamples)):
        sp, ss = params[f"scale_{i}"], stats[f"scale_{i}"]
        chain, feat_w, mlp2 = plf_params_from_variables(sp, ss)
        chain = _cast_chain(chain, dtype)
        idx = idx_list[i]
        feat_tx = _fanin_dot(feat_parts, feat_w, dtype).astype(dtype)
        h = fused_point_local_feature(feat_tx, idx, xyz, chain, interpret)
        for w, s, b in mlp2:
            h = jnp.maximum(_dot32(h, w, dtype) * s + b, 0.0)
        outs.append(h)
    return jnp.concatenate(outs, axis=-1)


def _cost_volume(p, xyz1, xyz2, f1_parts, f2_parts, valid1, valid2, k,
                 interpret, dtype=jnp.float32):
    """FeatureCorrelator eval forward via the fused Pallas kernels.

    ``f1_parts``/``f2_parts`` are concat-free fan-in part tuples (see
    :func:`_fanin_dot`) — the [local, global-broadcast] features."""
    from cmflow_tpu.ops.fused import (cv_params_from_variables,
                                      fused_cost_volume)

    d1, d2 = _parts_width(f1_parts), _parts_width(f2_parts)
    w0 = p["w0"]

    knn_idx = pointops.knn(k, xyz1, xyz2, valid2)
    knn1 = pointops.knn(k, xyz1, xyz1, valid1)

    f1t = _fanin_dot(f1_parts, w0[:d1], dtype).astype(dtype)
    f2t = _fanin_dot(f2_parts, w0[d1:d1 + d2], dtype).astype(dtype)

    dense, wn1, wn2 = cv_params_from_variables(p)
    # dense chain weights (wd, w1, w2 at even slots) in compute dtype;
    # biases and the tiny WeightNets stay f32
    dense = tuple(d.astype(dtype) if i % 2 == 0 else d
                  for i, d in enumerate(dense))
    return fused_cost_volume(f1t, f2t, knn_idx, xyz1, knn1, xyz2,
                             interpret, dense=dense, wn1=wn1, wn2=wn2)


def _head(p, s, x_parts, dtype=jnp.float32):
    """FlowHead / MotionHead mlp chain + final Dense (eval BN affine).

    ``x_parts``: concat-free fan-in parts of the head input (per-point
    propagation features + the broadcast global feature)."""
    x = None
    for i in range(3):
        sc, bi = fold_bn_affine(p["mlp"][f"bn_{i}"], s["mlp"][f"bn_{i}"])
        w = p["mlp"][f"dense_{i}"]["kernel"]
        h = _fanin_dot(x_parts, w, dtype) if x is None else _dot32(x, w, dtype)
        x = jnp.maximum(h * sc + bi, 0.0)
    return _dot32(x, p["out"]["kernel"], dtype)


def _heads_joint(p_fp, s_fp, p_mp, s_mp, x_parts, dtype=jnp.float32):
    """FlowHead + MotionHead evaluated as ONE chain of full-width matmuls.

    Both heads consume the same ``final`` features (given as concat-free
    fan-in parts, see :func:`_fanin_dot`); stacking their first-layer
    kernels column-wise and the rest block-diagonally is exact (channel
    blocks stay independent through relu/affine) and halves the number of
    XLA kernel launches on the [B, N, 512] tensors.  Returns
    ``(flow [B,N,3], logit [B,N,1])``.
    """
    from jax.scipy.linalg import block_diag

    x = None
    for i in range(3):
        wa = p_fp["mlp"][f"dense_{i}"]["kernel"]
        wb = p_mp["mlp"][f"dense_{i}"]["kernel"]
        w = (jnp.concatenate([wa, wb], axis=1) if i == 0
             else block_diag(wa, wb))
        sa, ba = fold_bn_affine(p_fp["mlp"][f"bn_{i}"], s_fp["mlp"][f"bn_{i}"])
        sb, bb = fold_bn_affine(p_mp["mlp"][f"bn_{i}"], s_mp["mlp"][f"bn_{i}"])
        sc = jnp.concatenate([sa, sb])
        bi = jnp.concatenate([ba, bb])
        h = _fanin_dot(x_parts, w, dtype) if x is None else _dot32(x, w, dtype)
        x = jnp.maximum(h * sc + bi, 0.0)
    w_out = block_diag(p_fp["out"]["kernel"], p_mp["out"]["kernel"])
    out = _dot32(x, w_out, dtype)
    c_fp = p_fp["out"]["kernel"].shape[1]
    return out[..., :c_fp], out[..., c_fp:]


def _trunk(params, stats, cfg, pc1, pc2, ft1, ft2, valid1, valid2,
           interpret, dtype=jnp.float32):
    mse_p, mse_s = params["mse_layer"], stats["mse_layer"]
    # the sa and propagation encoders share pc1's ball queries (computed
    # once here, reused across the optimization_barrier below)
    idx1_list = _ball_query_all(cfg.sa_radii, cfg.sa_nsamples, pc1, valid1)
    f1 = _mse_fused(mse_p, mse_s, cfg.sa_radii, cfg.sa_nsamples,
                    pc1, ft1, valid1, interpret, dtype,
                    idx_list=idx1_list)
    f2 = _mse_fused(mse_p, mse_s, cfg.sa_radii, cfg.sa_nsamples,
                    pc2, ft2, valid2, interpret, dtype)

    g1 = masked_global_max(f1, valid1)
    g2 = masked_global_max(f2, valid2)

    # fusing the encoder outputs into the cost-volume stage trips a TPU
    # compiler bug (SpatialMajorConvolution fusion cost model SIGABRT on
    # bf16 [64,256,256]-class operands — see _dot32); the barrier costs
    # one HBM round-trip of [B,N,256] per cloud and keeps the stages
    # separate.  The global features ride along as broadcast fan-in parts
    # (never materialized to [B,N,C], see _fanin_dot).
    f1, f2, g1, g2 = lax.optimization_barrier((f1, f2, g1, g2))

    cor = _cost_volume(params["fc_layer"], pc1, pc2, (f1, g1), (f2, g2),
                       valid1, valid2, cfg.fc_nsample, interpret, dtype)

    # emb = concat([ft1, f1, g1_bcast, cor]) in the flax model — fed to
    # the per-scale feat_tx dots as fan-in parts instead
    return _mse_fused(params["mse_layer2"], stats["mse_layer2"],
                      cfg.sa_radii, cfg.sa_nsamples, pc1,
                      (ft1, f1, g1, cor), valid1,
                      interpret, dtype, idx_list=idx1_list)


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
    compute_dtype=jnp.float32,
) -> Tuple[Array, Array, Array, Array]:
    """Fused CMFlow eval forward — same outputs as
    ``CMFlow.apply(..., train=False)`` (models/cmflow.py:42-92)."""
    params = variables["params"]
    stats = variables["batch_stats"]

    prop = _trunk(params["trunk"], stats["trunk"], cfg,
                  pc1, pc2, ft1, ft2, valid1, valid2, interpret,
                  compute_dtype)
    g = masked_global_max(prop, valid1)
    output, logit = _heads_joint(params["fp"], stats["fp"],
                                 params["mp"], stats["mp"], (prop, g),
                                 compute_dtype)
    stat_cls = jax.nn.sigmoid(logit)[..., 0]

    mask = stat_cls > stat_thres
    if valid1 is not None:
        mask = jnp.logical_and(mask, valid1)

    w = stat_cls + 1e-4
    if valid1 is not None:
        w = w * valid1
    w = w / jnp.sum(w, axis=1, keepdims=True)
    pre_trans = se3.weighted_kabsch(
        pc1, pc1 + output, w, centroid="sum", reflect="row",
        solver="polar")

    sf_rg = se3.rigid_to_flow(pc1, pre_trans)
    sf_agg = jnp.where(mask[..., None], sf_rg, output)
    return sf_agg, stat_cls, pre_trans, mask


def cmflow_infer_many(
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
    compute_dtype=jnp.float32,
) -> Tuple[Array, Array, Array, Array]:
    """Fused CMFlow eval over a macro-batch: inputs are stacked
    ``[S, B, N, ...]`` and the S steps run inside ONE compiled program
    (``lax.scan``).

    On tunneled runtimes every dispatch of the single-batch engine pays
    ~15 ms of host/tunnel overhead (measured round 2: 49.9 ms/it chained
    vs ~34 ms/it inside a scan); a production eval loop should feed
    macro-batches through this entry instead.  Nothing here is
    loop-invariant except the params, so XLA cannot hoist model compute —
    every step's full forward executes inside the loop.
    """
    has_valid = valid1 is not None

    def body(carry, xs):
        if has_valid:
            a, b_, c, d, v1, v2 = xs
        else:
            a, b_, c, d = xs
            v1 = v2 = None
        out = cmflow_infer(variables, a, b_, c, d, v1, v2, stat_thres,
                           cfg, interpret, compute_dtype)
        return carry, out

    xs = (pc1, pc2, ft1, ft2) + ((valid1, valid2) if has_valid else ())
    _, outs = jax.lax.scan(body, 0, xs)
    return outs


def raflow_infer_many(
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
    compute_dtype=jnp.float32,
) -> Tuple[Array, Array, Array, Array]:
    """Macro-batched RaFlow eval (see :func:`cmflow_infer_many`)."""
    has_valid = valid1 is not None

    def body(carry, xs):
        if has_valid:
            a, b_, c, d, iv, v1, v2 = xs
        else:
            a, b_, c, d, iv = xs
            v1 = v2 = None
        out = raflow_infer(variables, a, b_, c, d, iv, v1, v2,
                           rigid_thres, rigid_pcs, cfg, interpret,
                           compute_dtype)
        return carry, out

    xs = (pc1, pc2, ft1, ft2, interval) + (
        (valid1, valid2) if has_valid else ())
    _, outs = jax.lax.scan(body, 0, xs)
    return outs


def cmflow_t_infer_seq(
    variables,
    pc1: Array,
    pc2: Array,
    ft1: Array,
    ft2: Array,
    gfeat0: Array,
    reset: Array,
    valid1: Optional[Array] = None,
    valid2: Optional[Array] = None,
    stat_thres: float = 0.5,
    cfg: BackboneConfig = BackboneConfig(),
    interpret: bool = False,
    compute_dtype=jnp.float32,
) -> Tuple[Tuple[Array, Array, Array, Array], Array]:
    """Fused CMFlow_T eval over a frame sequence in one compiled program.

    Inputs are stacked ``[T, B, N, ...]``; ``reset`` is ``[T, B]`` — 1
    zeroes the GRU carry *before* frame t (clip start / every
    ``update_len`` frames, clip_util.py:226-233).  Batching is across
    clips: each batch lane carries its own hidden state.

    Returns ``((sf, cls, trans, mask) stacked [T, ...], final gfeat)``.
    """
    has_valid = valid1 is not None

    def body(gfeat, xs):
        if has_valid:
            a, b_, c, d, r, v1, v2 = xs
        else:
            a, b_, c, d, r = xs
            v1 = v2 = None
        gfeat = jnp.where(r[:, None] > 0, 0.0, gfeat)
        sf, cls, trans, mask, gnew = cmflow_t_infer(
            variables, a, b_, c, d, gfeat, v1, v2, stat_thres, cfg,
            interpret, compute_dtype)
        return gnew, (sf, cls, trans, mask)

    xs = (pc1, pc2, ft1, ft2, reset) + (
        (valid1, valid2) if has_valid else ())
    gfinal, outs = jax.lax.scan(body, gfeat0, xs)
    return outs, gfinal


def _gru_cell(p, h, x):
    """flax ``nn.GRUCell`` forward from raw params (models/cmflow_t.py
    GRU; gate order r, z, n with the candidate's hidden bias separate).

    The six per-gate [B,C]@[C,C] dots run as TWO [B,C]@[C,3C] dots
    (column-stacked gate kernels — exact; gates stay independent)."""
    c = h.shape[-1]
    wi = jnp.concatenate([p["ir"]["kernel"], p["iz"]["kernel"],
                          p["in"]["kernel"]], axis=1)
    bi = jnp.concatenate([p["ir"]["bias"], p["iz"]["bias"],
                          p["in"]["bias"]])
    wh = jnp.concatenate([p["hr"]["kernel"], p["hz"]["kernel"],
                          p["hn"]["kernel"]], axis=1)
    xi = x @ wi + bi
    hh = h @ wh
    r = jax.nn.sigmoid(xi[:, :c] + hh[:, :c])
    z = jax.nn.sigmoid(xi[:, c:2 * c] + hh[:, c:2 * c])
    n = jnp.tanh(xi[:, 2 * c:] + r * (hh[:, 2 * c:] + p["hn"]["bias"]))
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
    compute_dtype=jnp.float32,
) -> Tuple[Array, Array, Array, Array, Array]:
    """Fused CMFlow_T eval forward — same outputs (incl. the new GRU carry)
    as ``CMFlowT.apply(..., train=False)`` (models/cmflow_t.py:46-100)."""
    params = variables["params"]
    stats = variables["batch_stats"]

    prop = _trunk(params["trunk"], stats["trunk"], cfg,
                  pc1, pc2, ft1, ft2, valid1, valid2, interpret,
                  compute_dtype)
    pooled = masked_global_max(prop, valid1)
    gfeat_new = _gru_cell(params["gru"], gfeat, pooled)

    output, logit = _heads_joint(params["fp"], stats["fp"],
                                 params["mp"], stats["mp"],
                                 (prop, gfeat_new), compute_dtype)
    stat_cls = jax.nn.sigmoid(logit)[..., 0]

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
        pc1, pc1 + output, w, centroid="sum", reflect="row",
        solver="polar")

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
    compute_dtype=jnp.float32,
) -> Tuple[Array, Array, Array, Array]:
    """Fused RaFlow eval forward (models/raflow.py:38-105)."""
    params = variables["params"]
    stats = variables["batch_stats"]

    prop = _trunk(params["trunk"], stats["trunk"], cfg,
                  pc1, pc2, ft1, ft2, valid1, valid2, interpret,
                  compute_dtype)
    b, n, _ = pc1.shape
    g = masked_global_max(prop, valid1)
    output = _head(params["fp"], stats["fp"], (prop, g), compute_dtype)

    pc1_warp = pc1 + output
    if valid1 is not None:
        all_mask = valid1.astype(pc1.dtype)
        n_valid = jnp.sum(all_mask, axis=1)
    else:
        all_mask = jnp.ones((b, n), pc1.dtype)
        n_valid = jnp.full((b,), float(n), pc1.dtype)

    trans = se3.weighted_kabsch(
        pc1, pc1_warp, all_mask, centroid="mean_n", reflect="row",
        n_override=n_valid, solver="polar")
    sf_rg = se3.rigid_to_flow(pc1, trans)

    vel1 = ft1[..., 0]
    sf_proj = jnp.sum(sf_rg * pc1, axis=-1) / jnp.linalg.norm(pc1, axis=-1)
    residual = vel1 * interval[:, None] - sf_proj
    mask_s = jnp.abs(residual / vel1) < rigid_thres
    if valid1 is not None:
        mask_s = jnp.logical_and(mask_s, valid1)

    refit = se3.weighted_kabsch(
        pc1, pc1_warp, mask_s.astype(pc1.dtype), centroid="mean_n",
        reflect="row", n_override=n_valid, solver="polar")
    frac = jnp.sum(mask_s, axis=1) / n_valid
    use_refit = frac > rigid_pcs

    pre_trans = jnp.where(use_refit[:, None, None], refit, trans)
    sf_refit = se3.rigid_to_flow(pc1, refit)
    take_rigid = jnp.logical_and(use_refit[:, None], mask_s)
    sf_agg = jnp.where(take_rigid[..., None], sf_refit, output)
    return output, sf_agg, pre_trans, mask_s
