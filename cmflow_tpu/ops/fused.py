"""Pallas TPU fused inference kernels.

``PointLocalFeature`` (radarflow_util.py:121-162) evaluated layer-by-layer
in XLA materializes a ``[B, N, K, C]`` neighborhood tensor in HBM between
the gather, every BatchNorm/ReLU, and every Dense of the grouped MLP — for
the propagation encoder's K=32 scale that is ~1 GB of traffic per layer
boundary and dominates inference time (profiled: the neighborhood gathers
alone are ~40% of the CMFlow forward).

This kernel keeps the whole neighborhood computation in VMEM: per
(batch-element, row-tile) grid step it

  1. builds the gather as a one-hot matmul against the VMEM-resident
     per-point feature block (MXU, no HBM scatter/gather traffic),
  2. adds the relative-offset transform (the factored first layer),
  3. applies the [affine BN -> ReLU -> Dense] chain (BN running statistics
     are folded into per-channel scale/bias by the host wrapper — eval
     semantics are exactly affine),
  4. max-reduces over the K neighbors,

and only the ``[B, N, C_out]`` result ever touches HBM.

Inference-only: training-mode BatchNorm needs global batch statistics,
which forces HBM materialization between layers (use the unfused path).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _plf_kernel(feat_ref, idx_ref, rel_ref, wrel_ref, *rest, num_layers,
                nsample):
    """One (batch-element, row-tile) step of the fused encoder.

    rest = s0, b0, [w1, s1, b1, [w2, s2, b2, ...]], out_ref

    The K neighbors are processed by a ``fori_loop`` with a running max —
    inputs are laid out k-major (``idx [B,K,T,1]``, ``rel [B,K,T,3]``) so
    the loop index hits a leading, untiled dimension (Mosaic has no layout
    for [T*K, C] <-> [T, K, C] reshapes), and per-k [T, N] x [N, C] one-hot
    matmuls are clean MXU shapes anyway.  The one-hot gather is *exact*:
    each output row sums exactly one nonzero product.
    """
    out_ref = rest[-1]
    affines = rest[:-1]

    n = feat_ref.shape[1]
    t = idx_ref.shape[2]
    c_out = out_ref.shape[2]

    cols = lax.broadcasted_iota(jnp.int32, (t, n), dimension=1)
    feat = feat_ref[0]
    wrel = wrel_ref[:]

    # hi/lo split: two single-pass bf16 one-hot matmuls reconstruct the f32
    # feature values to ~2^-16 relative (one MXU pass each; the compiler's
    # HIGHEST would use six).  The one-hot lhs is exact in bf16.
    feat_hi = feat.astype(jnp.bfloat16)
    feat_lo = (feat - feat_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def body(kk, acc):
        idx_k = idx_ref[0, kk]  # [T, 1]
        onehot = (cols == idx_k).astype(jnp.bfloat16)  # [T, N]
        g = (jnp.dot(onehot, feat_hi, preferred_element_type=jnp.float32)
             + jnp.dot(onehot, feat_lo,
                       preferred_element_type=jnp.float32))
        rel_k = rel_ref[0, kk]  # [T, 3]
        x = g + jnp.dot(rel_k, wrel, preferred_element_type=jnp.float32)

        # [affine BN -> ReLU -> Dense] chain
        x = jnp.maximum(x * affines[0][:] + affines[1][:], 0.0)
        pos = 2
        for _ in range(num_layers - 1):
            w, s, b = affines[pos], affines[pos + 1], affines[pos + 2]
            pos += 3
            x = jnp.dot(x, w[:], preferred_element_type=jnp.float32)
            x = jnp.maximum(x * s[:] + b[:], 0.0)

        return jnp.maximum(acc, x)

    init = jnp.full((t, c_out), -jnp.inf, jnp.float32)
    out_ref[0] = lax.fori_loop(0, nsample, body, init)


@functools.partial(jax.jit, static_argnums=(4,))
def fused_point_local_feature(
    feat_tx: Array,
    idx: Array,
    rel: Array,
    params: Tuple[Array, ...],
    interpret: bool = False,
) -> Array:
    """Fused grouped-MLP + max-pool over precomputed neighborhoods.

    Args:
      feat_tx: ``[B, N, C1]`` per-point features *after* the factored first
        layer's feature transform (``features @ w0[3:]``).
      idx: ``[B, N, K]`` int32 ball-query indices.
      rel: ``[B, N, K, 3]`` relative neighbor offsets.
      params: flat tuple ``(wrel, s0, b0, w1, s1, b1, ...)`` — the rel-part
        of the first kernel, then per-layer folded BN scale/bias and Dense
        kernels (see :func:`fold_bn_affine`).
      interpret: run in interpreter mode (CPU tests).

    Returns:
      ``[B, N, C_last]`` max-pooled neighborhood features (pre-``mlp2``).
    """
    b, n, c1 = feat_tx.shape
    k = idx.shape[2]
    num_layers = 1 + (len(params) - 3) // 3
    c_out = params[-1].shape[-1]

    tile = n if n <= 64 else 64
    assert n % tile == 0, (n, tile)

    # k-major layouts so the kernel's K loop indexes a leading dim
    idx_km = jnp.swapaxes(idx, 1, 2)[..., None]  # [B, K, N, 1]
    rel_km = jnp.transpose(rel, (0, 2, 1, 3))  # [B, K, N, 3]

    grid = (b, n // tile)
    in_specs = [
        pl.BlockSpec((1, n, c1), lambda bi, ti: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, k, tile, 1), lambda bi, ti: (bi, 0, ti, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, k, tile, 3), lambda bi, ti: (bi, 0, ti, 0),
                     memory_space=pltpu.VMEM),
    ]
    for p in params:
        nd = p.ndim
        in_specs.append(
            pl.BlockSpec(p.shape, (lambda bi, ti, _nd=nd: (0,) * _nd),
                         memory_space=pltpu.VMEM)
        )

    out = pl.pallas_call(
        functools.partial(_plf_kernel, num_layers=num_layers, nsample=k),
        out_shape=jax.ShapeDtypeStruct((b, n, c_out), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile, c_out),
                               lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(feat_tx, idx_km, rel_km, *params)
    return out


def _hilo(x: Array) -> Tuple[Array, Array]:
    """Split f32 into two bf16 parts whose sum reconstructs it to ~2^-16
    relative — makes single-pass bf16 one-hot matmuls effectively exact."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _gather_bwd_kernel(g_ref, idx_ref, out_ref, *, chunk):
    """Accumulate d_points[b] += onehot_k^T @ g[b, :, k, :] over a k-chunk
    grid dimension (the transpose of the gather — XLA lowers this to a
    serial scatter-add that is ~7x slower at C=512 than the MXU matmul)."""
    n = out_ref.shape[1]
    t = g_ref.shape[1]
    kc = pl.program_id(1)
    rows = lax.broadcasted_iota(jnp.int32, (n, t), dimension=0)

    part = jnp.zeros((n, out_ref.shape[2]), jnp.float32)
    for j in range(chunk):
        idx_j = idx_ref[0, j]  # [1, T] (idx block [1, chunk, 1, T])
        oh_t = (rows == idx_j).astype(jnp.bfloat16)  # [N, T]
        hi, lo = _hilo(g_ref[0, :, j, :])
        part = (part
                + jnp.dot(oh_t, hi, preferred_element_type=jnp.float32)
                + jnp.dot(oh_t, lo, preferred_element_type=jnp.float32))

    @pl.when(kc == 0)
    def _():
        out_ref[0] = part

    @pl.when(kc > 0)
    def _():
        out_ref[0] = out_ref[0] + part


def _mxu_gather_bwd(n: int, idx: Array, g: Array, interpret: bool) -> Array:
    b, t, k, c = g.shape
    chunk = 8 if k % 8 == 0 else k
    idx_km = jnp.swapaxes(idx, 1, 2)[:, :, None, :]  # [B, K, 1, T]
    return pl.pallas_call(
        functools.partial(_gather_bwd_kernel, chunk=chunk),
        out_shape=jax.ShapeDtypeStruct((b, n, c), jnp.float32),
        grid=(b, k // chunk),
        in_specs=[
            pl.BlockSpec((1, t, chunk, c), lambda bi, ki: (bi, 0, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, 1, t), lambda bi, ki: (bi, ki, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, c), lambda bi, ki: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(g, idx_km)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def mxu_group_points(points: Array, idx: Array,
                     interpret: bool = False) -> Array:
    """``group_points`` whose *backward* is an exact one-hot MXU matmul.

    Forward is the plain XLA gather (bit-exact, well fused); the backward
    replaces XLA's serial scatter-add with a transpose matmul (hi/lo bf16
    split, exact to ~2^-16 relative).  Intended for wide channel counts
    (C a multiple of 128) on TPU — ``pointops.group_points`` routes here
    automatically.
    """
    return jax.vmap(lambda p, i: p[i])(points, idx)


def _mxu_group_fwd(points, idx, interpret):
    return mxu_group_points(points, idx, interpret), (points.shape[1], idx)


def _mxu_group_bwd(interpret, res, g):
    n, idx = res
    return _mxu_gather_bwd(n, idx, g, interpret), None


mxu_group_points.defvjp(_mxu_group_fwd, _mxu_group_bwd)


def _cv_kernel(f1t_ref, f2t_ref, idx_ref, dirs_ref, wd_ref, b0_ref,
               w1_ref, b1_ref, w2_ref, b2_ref,
               wn0_ref, wnb0_ref, wn1_ref, wnb1_ref, wn2_ref, wnb2_ref,
               out_ref, *, nsample):
    """Fused point-to-patch cost volume (FeatureCorrelator first half,
    radarflow_util.py:185-214): per neighbor k — one-hot gather of the
    transformed frame-2 features, LeakyReLU(0.1) dense chain, WeightNet
    from the offset, weighted accumulation.  All in VMEM."""
    n2 = f2t_ref.shape[1]
    t = idx_ref.shape[2]
    c = f1t_ref.shape[2]

    cols = lax.broadcasted_iota(jnp.int32, (t, n2), dimension=1)
    f1t = f1t_ref[0]
    f2 = f2t_ref[0]
    f2_hi = f2.astype(jnp.bfloat16)
    f2_lo = (f2 - f2_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def body(kk, acc):
        idx_k = idx_ref[0, kk]  # [T, 1]
        onehot = (cols == idx_k).astype(jnp.bfloat16)
        g = (jnp.dot(onehot, f2_hi, preferred_element_type=jnp.float32)
             + jnp.dot(onehot, f2_lo, preferred_element_type=jnp.float32))
        d_k = dirs_ref[0, kk]  # [T, 3]
        x = f1t + g + jnp.dot(d_k, wd_ref[:],
                              preferred_element_type=jnp.float32) + b0_ref[:]
        x = jnp.where(x > 0, x, 0.1 * x)
        x = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32) \
            + b1_ref[:]
        x = jnp.where(x > 0, x, 0.1 * x)
        x = jnp.dot(x, w2_ref[:], preferred_element_type=jnp.float32) \
            + b2_ref[:]
        x = jnp.where(x > 0, x, 0.1 * x)

        # WeightNet(3 -> 8 -> 8 -> C), ReLU (radarflow_util.py:287-318)
        w = jnp.maximum(jnp.dot(d_k, wn0_ref[:],
                                preferred_element_type=jnp.float32)
                        + wnb0_ref[:], 0.0)
        w = jnp.maximum(jnp.dot(w, wn1_ref[:],
                                preferred_element_type=jnp.float32)
                        + wnb1_ref[:], 0.0)
        w = jnp.maximum(jnp.dot(w, wn2_ref[:],
                                preferred_element_type=jnp.float32)
                        + wnb2_ref[:], 0.0)
        return acc + w * x

    init = jnp.zeros((t, c), jnp.float32)
    out_ref[0] = lax.fori_loop(0, nsample, body, init)


def _cv_agg_kernel(p2p_ref, idx_ref, dirs_ref,
                   wn0_ref, wnb0_ref, wn1_ref, wnb1_ref, wn2_ref, wnb2_ref,
                   out_ref, *, nsample):
    """Fused patch-to-patch aggregation (FeatureCorrelator second half,
    radarflow_util.py:216-237): gather the point-to-patch costs over
    frame-1 neighborhoods and WeightNet-weighted-sum them."""
    n = p2p_ref.shape[1]
    t = idx_ref.shape[2]
    c = p2p_ref.shape[2]

    cols = lax.broadcasted_iota(jnp.int32, (t, n), dimension=1)
    p2p = p2p_ref[0]
    hi = p2p.astype(jnp.bfloat16)
    lo = (p2p - hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def body(kk, acc):
        idx_k = idx_ref[0, kk]
        onehot = (cols == idx_k).astype(jnp.bfloat16)
        g = (jnp.dot(onehot, hi, preferred_element_type=jnp.float32)
             + jnp.dot(onehot, lo, preferred_element_type=jnp.float32))
        d_k = dirs_ref[0, kk]
        w = jnp.maximum(jnp.dot(d_k, wn0_ref[:],
                                preferred_element_type=jnp.float32)
                        + wnb0_ref[:], 0.0)
        w = jnp.maximum(jnp.dot(w, wn1_ref[:],
                                preferred_element_type=jnp.float32)
                        + wnb1_ref[:], 0.0)
        w = jnp.maximum(jnp.dot(w, wn2_ref[:],
                                preferred_element_type=jnp.float32)
                        + wnb2_ref[:], 0.0)
        return acc + w * g

    init = jnp.zeros((t, c), jnp.float32)
    out_ref[0] = lax.fori_loop(0, nsample, body, init)


def _km(idx: Array, rel: Array) -> Tuple[Array, Array]:
    """k-major layouts for the kernels' K loop."""
    return (jnp.swapaxes(idx, 1, 2)[..., None],
            jnp.transpose(rel, (0, 2, 1, 3)))


@functools.partial(jax.jit, static_argnums=(6,))
def fused_cost_volume(
    f1t: Array,
    f2t: Array,
    idx2: Array,
    dirs: Array,
    idx1: Array,
    dirs1: Array,
    interpret: bool = False,
    *,
    dense: Tuple[Array, ...] = (),
    wn1: Tuple[Array, ...] = (),
    wn2: Tuple[Array, ...] = (),
) -> Array:
    """Fused FeatureCorrelator eval forward.

    Args:
      f1t / f2t: ``[B, N, C]`` per-point transformed features
        (``f @ w0[:d1]`` / ``f @ w0[d1:d1+d2]``).
      idx2 / dirs: frame-2 k-NN indices ``[B, N, K]`` and offsets
        ``[B, N, K, 3]``.
      idx1 / dirs1: frame-1 (self) k-NN indices/offsets.
      dense: ``(wd, b0, w1, b1, w2, b2)`` — offset part of the factored
        first correlation layer + the two LeakyReLU dense layers.
      wn1 / wn2: WeightNet params ``(w0, b0, w1, b1, w2, b2)`` each.

    Returns:
      ``[B, N, C]`` aggregated cost volume.
    """
    b, n, c = f1t.shape
    k = idx2.shape[2]

    idx2_km, dirs_km = _km(idx2, dirs)
    idx1_km, dirs1_km = _km(idx1, dirs1)

    def specs(shapes):
        out = []
        for nd in shapes:
            out.append(pl.BlockSpec(nd, (lambda bi, _n=len(nd): (0,) * _n),
                                    memory_space=pltpu.VMEM))
        return out

    full3 = pl.BlockSpec((1, n, c), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM)
    idx_spec = pl.BlockSpec((1, k, n, 1), lambda bi: (bi, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    dir_spec = pl.BlockSpec((1, k, n, 3), lambda bi: (bi, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    p2p = pl.pallas_call(
        functools.partial(_cv_kernel, nsample=k),
        out_shape=jax.ShapeDtypeStruct((b, n, c), jnp.float32),
        grid=(b,),
        in_specs=[full3, full3, idx_spec, dir_spec]
        + specs([p.shape for p in dense])
        + specs([p.shape for p in wn1]),
        out_specs=full3,
        interpret=interpret,
    )(f1t, f2t, idx2_km, dirs_km, *dense, *wn1)

    return pl.pallas_call(
        functools.partial(_cv_agg_kernel, nsample=k),
        out_shape=jax.ShapeDtypeStruct((b, n, c), jnp.float32),
        grid=(b,),
        in_specs=[full3, idx_spec, dir_spec]
        + specs([p.shape for p in wn2]),
        out_specs=full3,
        interpret=interpret,
    )(p2p, idx1_km, dirs1_km, *wn2)


def cv_params_from_variables(fc_params):
    """Build (dense, wn1, wn2) kernel tuples from the FeatureCorrelator
    param subtree (w0 split into feature/offset blocks by the caller)."""
    p = fc_params
    d_off = p["w0"].shape[0] - 3
    dense = (p["w0"][d_off:], p["b0"],
             p["mlp"]["dense_0"]["kernel"], p["mlp"]["dense_0"]["bias"],
             p["mlp"]["dense_1"]["kernel"], p["mlp"]["dense_1"]["bias"])

    def wn(q):
        return (q["dense_0"]["kernel"], q["dense_0"]["bias"],
                q["dense_1"]["kernel"], q["dense_1"]["bias"],
                q["dense_2"]["kernel"], q["dense_2"]["bias"])

    return dense, wn(p["weightnet1"]), wn(p["weightnet2"])


def fold_bn_affine(bn_params, bn_stats, eps: float = 1e-5):
    """Fold eval-mode BatchNorm into per-channel (scale, bias).

    ``bn(x) = gamma * (x - mean) / sqrt(var + eps) + beta = x * s + b``.
    """
    gamma = bn_params["scale"]
    beta = bn_params["bias"]
    mean = bn_stats["mean"]
    var = bn_stats["var"]
    s = gamma * lax.rsqrt(var + eps)
    return s, beta - mean * s


def plf_params_from_variables(scale_params, scale_stats):
    """Build the flat kernel parameter tuple for one ``PointLocalFeature``
    scale from its flax param/batch_stats subtrees.

    Tree layout (nn/blocks.py PointLocalFeature):
      params: {w0, bn0, mlp: {dense_i, bn_i}, mlp2: {dense_i, bn_i}}
      stats:  {bn0, mlp: {bn_i}, mlp2: {bn_i}}

    Returns (first_chain_params, feat_w, mlp2_list) where
      * ``feat_w`` is ``w0[3:]`` (the per-point feature transform),
      * ``first_chain_params`` feeds :func:`fused_point_local_feature`,
      * ``mlp2_list`` is [(w, s, b), ...] for the cheap per-point tail.
    """
    w0 = scale_params["w0"]
    wrel, feat_w = w0[:3], w0[3:]

    chain = [wrel]
    chain += list(fold_bn_affine(scale_params["bn0"], scale_stats["bn0"]))

    mlp_p = scale_params.get("mlp", {})
    mlp_s = scale_stats.get("mlp", {})
    for i in range(len([k for k in mlp_p if k.startswith("dense_")])):
        chain.append(mlp_p[f"dense_{i}"]["kernel"])
        chain += list(fold_bn_affine(mlp_p[f"bn_{i}"], mlp_s[f"bn_{i}"]))

    mlp2 = []
    p2, s2 = scale_params["mlp2"], scale_stats["mlp2"]
    for i in range(len([k for k in p2 if k.startswith("dense_")])):
        s, b = fold_bn_affine(p2[f"bn_{i}"], s2[f"bn_{i}"])
        mlp2.append((p2[f"dense_{i}"]["kernel"], s, b))

    return tuple(chain), feat_w, mlp2
