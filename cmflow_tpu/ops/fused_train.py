"""Pallas TPU fused TRAINING ops — recompute-based custom VJPs.

The flax training path materializes every ``[B, N, K, C]`` neighborhood
tensor in HBM between the gather, each train-mode BatchNorm, and each
Dense of the grouped MLP (nn/blocks.py PointLocalFeature, reference
radarflow_util.py:121-162), and again transposed in the backward.  These
ops keep the neighborhood computation in VMEM in BOTH directions:

* ``plf_prebn_stats(depth, ...)`` — per-channel sum / sum-of-squares of
  the grouped chain's pre-BatchNorm activations at layer ``depth``,
  reduced over (B, N, K) on the fly.  One op per BN layer: train-mode
  BN statistics are global over the batch, so each layer's stats are a
  sequential barrier — but only ``2*C`` floats ever reach HBM.
* ``plf_apply(...)`` — the grouped [affine -> ReLU -> Dense] chain +
  max-over-K forward (shared with the eval engine's kernel), with a
  hand-written VJP that *recomputes* the per-k chain instead of loading
  saved activations.

The train-mode BatchNorm backward (gradients through the batch mean and
variance) is NOT hand-derived: the batch stats flow through
:func:`cmflow_tpu.ops.fused.fold_bn_affine` in plain JAX, so autodiff
composes the stats-op VJPs with the apply-op VJP into the exact BN-train
backward.

Max-tie gradients follow ``jnp.max``'s convention (equal split among
ties — common at exact ReLU zeros), so gradients match the flax path,
not torch's first-index convention.

The cost volume (FeatureCorrelator, radarflow_util.py:164-237) has no
BatchNorm, so its training forward IS the eval forward;
``cost_volume_train`` wraps the eval kernels with a recompute VJP.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cmflow_tpu.ops.fused import (
    _hilo,
    fused_cost_volume,
    fused_point_local_feature,
)

Array = jax.Array


def _int_zero(x):
    """float0 cotangent for integer primal inputs."""
    return np.zeros(x.shape, jax.dtypes.float0)


def _gathers(feat_hi, feat_lo, xyz_hi, xyz_lo, xyz_t, rows, idx_k, wrel):
    """One-hot gather of features and relative offsets for one k slice.

    Returns (g [T, C], rel [T, 3]) — the hi/lo bf16 one-hot matmuls are
    exact to ~2^-16 relative."""
    oh_t = (rows == idx_k).astype(jnp.bfloat16)  # [N, T]
    dim0 = (((0,), (0,)), ((), ()))
    g = lax.dot_general(oh_t, feat_hi, dim0,
                        preferred_element_type=jnp.float32)
    if feat_lo is not None:
        g = g + lax.dot_general(oh_t, feat_lo, dim0,
                                preferred_element_type=jnp.float32)
    gx = (lax.dot_general(oh_t, xyz_hi, dim0,
                          preferred_element_type=jnp.float32)
          + lax.dot_general(oh_t, xyz_lo, dim0,
                            preferred_element_type=jnp.float32))
    rel = gx - xyz_t  # [T, 3]
    return oh_t, g, rel


def _chain_to(pre0, affines, depth):
    """Forward the [affine -> ReLU -> Dense] chain from pre0 up to (and
    excluding the affine of) layer ``depth``; returns (values, pre_depth)
    where values[l] = (x_l, a_l) for l < depth (x_l = pre-affine input,
    a_l = affine output pre-ReLU)."""
    vals = []
    x = pre0
    for level in range(depth):
        s, b, w = affines[3 * level], affines[3 * level + 1], \
            affines[3 * level + 2]
        a = x * s[:] + b[:]
        vals.append((x, a))
        r = jnp.maximum(a, 0.0)
        x = jnp.dot(r, w[:], preferred_element_type=jnp.float32)
    return vals, x


# ---------------------------------------------------------------------------
# plf_prebn_stats


def _plf_stats_kernel(feat_ref, idx_ref, xyz_ref, xyzt_ref, wrel_ref, *rest,
                      depth, nsample):
    sum_ref, sumsq_ref = rest[-2], rest[-1]
    affines = rest[:-2]

    n = feat_ref.shape[1]
    t = idx_ref.shape[3]
    rows = lax.broadcasted_iota(jnp.int32, (n, t), dimension=0)
    feat = feat_ref[0]
    feat_hi, feat_lo = _hilo(feat)
    xyz_hi, xyz_lo = _hilo(xyz_ref[0].astype(jnp.float32))
    xyz_t = xyzt_ref[0].astype(jnp.float32)
    wrel = wrel_ref[:]

    c_d = sum_ref.shape[1]

    def body(kk, acc):
        s_acc, ss_acc = acc
        idx_k = idx_ref[0, kk]
        _, g, rel = _gathers(feat_hi, feat_lo, xyz_hi, xyz_lo, xyz_t,
                             rows, idx_k, wrel)
        pre0 = g + jnp.dot(rel, wrel, preferred_element_type=jnp.float32)
        _, pre = _chain_to(pre0, affines, depth)
        s_acc = s_acc + jnp.sum(pre, axis=0, keepdims=True)
        ss_acc = ss_acc + jnp.sum(pre * pre, axis=0, keepdims=True)
        return s_acc, ss_acc

    init = (jnp.zeros((1, c_d), jnp.float32),
            jnp.zeros((1, c_d), jnp.float32))
    s_out, ss_out = lax.fori_loop(0, nsample, body, init)

    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        sum_ref[:] = s_out
        sumsq_ref[:] = ss_out

    @pl.when(jnp.logical_not(first))
    def _():
        sum_ref[:] = sum_ref[:] + s_out
        sumsq_ref[:] = sumsq_ref[:] + ss_out


def _plf_stats_bwd_kernel(feat_ref, idx_ref, xyz_ref, xyzt_ref, wrel_ref,
                          *rest, depth, nsample):
    """Recompute the chain to ``depth`` and backprop
    d_pre = d_sum + 2 * pre * d_sumsq to every input."""
    num_outs = 2 + 3 * depth  # d_feat, d_wrel, (d_s, d_b, d_w) per level
    out_refs = rest[-num_outs:]
    d_feat_ref, d_wrel_ref = out_refs[0], out_refs[1]
    d_aff_refs = out_refs[2:]
    dsum_ref, dss_ref = rest[-num_outs - 2], rest[-num_outs - 1]
    affines = rest[:-num_outs - 2]

    n = feat_ref.shape[1]
    t = idx_ref.shape[3]
    c1 = feat_ref.shape[2]
    rows = lax.broadcasted_iota(jnp.int32, (n, t), dimension=0)
    feat = feat_ref[0]
    feat_hi, feat_lo = _hilo(feat)
    xyz_hi, xyz_lo = _hilo(xyz_ref[0].astype(jnp.float32))
    xyz_t = xyzt_ref[0].astype(jnp.float32)
    wrel = wrel_ref[:]
    dsum = dsum_ref[:]
    dss = dss_ref[:]

    def body(kk, acc):
        d_feat = acc[0]
        d_wrel = acc[1]
        d_affs = acc[2:]
        idx_k = idx_ref[0, kk]
        oh_t, g, rel = _gathers(feat_hi, feat_lo, xyz_hi, xyz_lo, xyz_t,
                                rows, idx_k, wrel)
        pre0 = g + jnp.dot(rel, wrel, preferred_element_type=jnp.float32)
        vals, pre = _chain_to(pre0, affines, depth)

        d_pre = dsum + 2.0 * pre * dss  # [T, C_depth]
        d_affs = list(d_affs)
        for level in range(depth - 1, -1, -1):
            x_l, a_l = vals[level]
            w = affines[3 * level + 2][:]
            r_l = jnp.maximum(a_l, 0.0)
            # pre_{level+1} = relu(a_l) @ w
            d_affs[3 * level + 2] = d_affs[3 * level + 2] + lax.dot_general(
                r_l, d_pre, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # d_w [C_l, C_{l+1}]
            d_r = lax.dot_general(
                d_pre, w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [T, C_l]
            d_a = d_r * (a_l > 0)
            d_affs[3 * level] = d_affs[3 * level] + jnp.sum(
                d_a * x_l, axis=0, keepdims=True)  # d_s
            d_affs[3 * level + 1] = d_affs[3 * level + 1] + jnp.sum(
                d_a, axis=0, keepdims=True)  # d_b
            s = affines[3 * level][:]
            d_pre = d_a * s

        # d_pre0 -> feat (scatter) + wrel
        d_feat = d_feat + lax.dot_general(
            oh_t, d_pre.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [N, C1]
        d_wrel = d_wrel + lax.dot_general(
            rel, d_pre, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [3, C1]
        return (d_feat, d_wrel, *d_affs)

    init = [jnp.zeros((n, c1), jnp.float32), jnp.zeros((3, c1), jnp.float32)]
    for level in range(depth):
        c_l = affines[3 * level].shape[1]
        c_n = affines[3 * level + 2].shape[1]
        init += [jnp.zeros((1, c_l), jnp.float32),
                 jnp.zeros((1, c_l), jnp.float32),
                 jnp.zeros((c_l, c_n), jnp.float32)]
    outs = lax.fori_loop(0, nsample, body, tuple(init))

    ti = pl.program_id(1)
    first_tile = ti == 0
    first = jnp.logical_and(pl.program_id(0) == 0, first_tile)

    # d_feat accumulates per batch element (over tiles); the rest over all
    @pl.when(first_tile)
    def _():
        d_feat_ref[0] = outs[0]

    @pl.when(jnp.logical_not(first_tile))
    def _():
        d_feat_ref[0] = d_feat_ref[0] + outs[0]

    @pl.when(first)
    def _():
        d_wrel_ref[:] = outs[1]
        for r, v in zip(d_aff_refs, outs[2:]):
            r[:] = v

    @pl.when(jnp.logical_not(first))
    def _():
        d_wrel_ref[:] = d_wrel_ref[:] + outs[1]
        for r, v in zip(d_aff_refs, outs[2:]):
            r[:] = r[:] + v


def _km_idx(idx: Array) -> Array:
    return jnp.swapaxes(idx, 1, 2)[:, :, None, :]


def _plf_specs(b, n, c1, k, tile, extra_shapes):
    in_specs = [
        pl.BlockSpec((1, n, c1), lambda bi, ti: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, k, 1, tile), lambda bi, ti: (bi, 0, 0, ti),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n, 3), lambda bi, ti: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile, 3), lambda bi, ti: (bi, ti, 0),
                     memory_space=pltpu.VMEM),
    ]
    for shp in extra_shapes:
        nd = len(shp)
        in_specs.append(pl.BlockSpec(
            shp, (lambda bi, ti, _nd=nd: (0,) * _nd),
            memory_space=pltpu.VMEM))
    return in_specs


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def plf_prebn_stats(depth: int, interpret: bool, feat_tx: Array, idx: Array,
                    xyz: Array, wrel: Array, *prev) -> Tuple[Array, Array]:
    """Per-channel (sum, sum_sq) over (B, N, K) of the grouped chain's
    pre-BN activations at layer ``depth``.

    ``prev`` is ``(s_0, b_0, w_1, ..., s_{depth-1}, b_{depth-1},
    w_depth)`` — the folded batch affines of the layers below and the
    Dense kernels between them.  Differentiable in ``feat_tx``, ``wrel``
    and every ``prev`` entry, so train-BN's gradient-through-statistics
    composes by autodiff."""
    b, n, c1 = feat_tx.shape
    k = idx.shape[2]
    tile = n if n <= 128 else 128
    c_d = wrel.shape[1] if depth == 0 else prev[3 * depth - 1].shape[1]

    params = (wrel,) + prev
    out = pl.pallas_call(
        functools.partial(_plf_stats_kernel, depth=depth, nsample=k),
        out_shape=(jax.ShapeDtypeStruct((1, c_d), jnp.float32),
                   jax.ShapeDtypeStruct((1, c_d), jnp.float32)),
        grid=(b, n // tile),
        in_specs=_plf_specs(b, n, c1, k, tile,
                            [(1, p.shape[0]) if p.ndim == 1 else p.shape
                             for p in params]),
        out_specs=(pl.BlockSpec((1, c_d), lambda bi, ti: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, c_d), lambda bi, ti: (0, 0),
                                memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(feat_tx, _km_idx(idx), xyz, xyz,
      *[p[None] if p.ndim == 1 else p for p in params])
    return out[0][0], out[1][0]


def _plf_stats_fwd(depth, interpret, feat_tx, idx, xyz, wrel, *prev):
    out = plf_prebn_stats(depth, interpret, feat_tx, idx, xyz, wrel, *prev)
    return out, (feat_tx, idx, xyz, wrel, prev)


def _plf_stats_bwd(depth, interpret, res, cts):
    feat_tx, idx, xyz, wrel, prev = res
    dsum, dss = cts
    b, n, c1 = feat_tx.shape
    k = idx.shape[2]
    tile = n if n <= 128 else 128
    params = (wrel,) + prev

    out_shapes = [jax.ShapeDtypeStruct((b, n, c1), jnp.float32),
                  jax.ShapeDtypeStruct(wrel.shape, jnp.float32)]
    out_specs = [pl.BlockSpec((1, n, c1), lambda bi, ti: (bi, 0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec(wrel.shape, lambda bi, ti: (0, 0),
                              memory_space=pltpu.VMEM)]
    for level in range(depth):
        for p in prev[3 * level:3 * level + 3]:
            shp = (1, p.shape[0]) if p.ndim == 1 else p.shape
            out_shapes.append(jax.ShapeDtypeStruct(shp, jnp.float32))
            out_specs.append(pl.BlockSpec(
                shp, (lambda bi, ti, _nd=len(shp): (0,) * _nd),
                memory_space=pltpu.VMEM))

    in_specs = _plf_specs(b, n, c1, k, tile,
                          [(1, p.shape[0]) if p.ndim == 1 else p.shape
                           for p in params])
    c_d = dsum.shape[0]
    in_specs += [pl.BlockSpec((1, c_d), lambda bi, ti: (0, 0),
                              memory_space=pltpu.VMEM)] * 2

    outs = pl.pallas_call(
        functools.partial(_plf_stats_bwd_kernel, depth=depth, nsample=k),
        out_shape=tuple(out_shapes),
        grid=(b, n // tile),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        interpret=interpret,
    )(feat_tx, _km_idx(idx), xyz, xyz,
      *[p[None] if p.ndim == 1 else p for p in params],
      dsum[None], dss[None])

    d_feat, d_wrel = outs[0], outs[1]
    d_prev = tuple(
        o[0] if p.ndim == 1 else o
        for o, p in zip(outs[2:], prev))
    return (d_feat, _int_zero(idx), jnp.zeros_like(xyz), d_wrel) + d_prev


plf_prebn_stats.defvjp(_plf_stats_fwd, _plf_stats_bwd)


# ---------------------------------------------------------------------------
# plf_apply


def _plf_apply_bwd_kernel(feat_ref, idx_ref, xyz_ref, xyzt_ref, wrel_ref,
                          *rest, num_layers, nsample):
    """Recompute-based VJP of the grouped chain + max-over-K.

    Two internal passes: the first counts max ties per output channel
    (``jnp.max`` splits gradients equally among ties), the second
    recomputes the chain and routes ``d_out * tie / cnt`` backward."""
    n_aff = 3 * num_layers - 1  # s0,b0, (w,s,b)*(L-1)
    affines = rest[:n_aff]
    out_val_ref, d_out_ref = rest[n_aff], rest[n_aff + 1]
    out_refs = rest[n_aff + 2:]
    d_feat_ref, d_wrel_ref = out_refs[0], out_refs[1]
    d_aff_refs = out_refs[2:]

    n = feat_ref.shape[1]
    t = idx_ref.shape[3]
    c1 = feat_ref.shape[2]
    rows = lax.broadcasted_iota(jnp.int32, (n, t), dimension=0)
    feat = feat_ref[0]
    feat_hi, feat_lo = _hilo(feat)
    xyz_hi, xyz_lo = _hilo(xyz_ref[0].astype(jnp.float32))
    xyz_t = xyzt_ref[0].astype(jnp.float32)
    wrel = wrel_ref[:]
    out_val = out_val_ref[0]
    d_out = d_out_ref[0]

    def fwd_k(kk):
        idx_k = idx_ref[0, kk]
        oh_t, g, rel = _gathers(feat_hi, feat_lo, xyz_hi, xyz_lo, xyz_t,
                                rows, idx_k, wrel)
        pre0 = g + jnp.dot(rel, wrel, preferred_element_type=jnp.float32)
        vals = []
        x = pre0
        for level in range(num_layers):
            s = affines[3 * level][:]
            b = affines[3 * level + 1][:]
            a = x * s + b
            vals.append((x, a))
            r = jnp.maximum(a, 0.0)
            if level + 1 < num_layers:
                w = affines[3 * level + 2][:]
                x = jnp.dot(r, w, preferred_element_type=jnp.float32)
        return oh_t, rel, vals, r  # r = final relu output (pre-max)

    def cnt_body(kk, cnt):
        _, _, _, r = fwd_k(kk)
        return cnt + (r == out_val).astype(jnp.float32)

    cnt = lax.fori_loop(0, nsample, cnt_body,
                        jnp.zeros(out_val.shape, jnp.float32))
    d_base = d_out / jnp.maximum(cnt, 1.0)

    def body(kk, acc):
        d_feat = acc[0]
        d_wrel = acc[1]
        d_affs = list(acc[2:])
        oh_t, rel, vals, r = fwd_k(kk)
        d_r = (r == out_val).astype(jnp.float32) * d_base
        d_pre = d_r
        for level in range(num_layers - 1, -1, -1):
            x_l, a_l = vals[level]
            if level + 1 < num_layers:
                w = affines[3 * level + 2][:]
                r_l = jnp.maximum(a_l, 0.0)
                d_affs[3 * level + 2] = d_affs[3 * level + 2] + \
                    lax.dot_general(r_l, d_pre, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                d_pre = lax.dot_general(
                    d_pre, w, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            d_a = d_pre * (a_l > 0)
            d_affs[3 * level] = d_affs[3 * level] + jnp.sum(
                d_a * x_l, axis=0, keepdims=True)
            d_affs[3 * level + 1] = d_affs[3 * level + 1] + jnp.sum(
                d_a, axis=0, keepdims=True)
            d_pre = d_a * affines[3 * level][:]

        d_feat = d_feat + lax.dot_general(
            oh_t, d_pre, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        d_wrel = d_wrel + lax.dot_general(
            rel, d_pre, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return (d_feat, d_wrel, *d_affs)

    # d_affs accumulators mirror the affines refs one-to-one (s/b refs are
    # [1, C], dense kernels [C_l, C_{l+1}])
    init = [jnp.zeros((n, c1), jnp.float32), jnp.zeros((3, c1), jnp.float32)]
    for p in affines:
        init.append(jnp.zeros(p.shape, jnp.float32))
    outs = lax.fori_loop(0, nsample, body, tuple(init))

    ti = pl.program_id(1)
    first_tile = ti == 0
    first = jnp.logical_and(pl.program_id(0) == 0, first_tile)

    @pl.when(first_tile)
    def _():
        d_feat_ref[0] = outs[0]

    @pl.when(jnp.logical_not(first_tile))
    def _():
        d_feat_ref[0] = d_feat_ref[0] + outs[0]

    @pl.when(first)
    def _():
        d_wrel_ref[:] = outs[1]
        for r_, v in zip(d_aff_refs, outs[2:]):
            r_[:] = v

    @pl.when(jnp.logical_not(first))
    def _():
        d_wrel_ref[:] = d_wrel_ref[:] + outs[1]
        for r_, v in zip(d_aff_refs, outs[2:]):
            r_[:] = r_[:] + v


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def plf_apply(interpret: bool, feat_tx: Array, idx: Array, xyz: Array,
              *chain) -> Array:
    """Grouped [affine -> ReLU -> Dense] chain + max-over-K with a
    recompute VJP (train-path counterpart of
    :func:`cmflow_tpu.ops.fused.fused_point_local_feature`)."""
    return fused_point_local_feature(feat_tx, idx, xyz, tuple(chain),
                                     interpret)


def _plf_apply_fwd(interpret, feat_tx, idx, xyz, *chain):
    out = plf_apply(interpret, feat_tx, idx, xyz, *chain)
    return out, (feat_tx, idx, xyz, chain, out)


def _plf_apply_bwd(interpret, res, d_out):
    feat_tx, idx, xyz, chain, out = res
    b, n, c1 = feat_tx.shape
    k = idx.shape[2]
    tile = n if n <= 128 else 128
    num_layers = 1 + (len(chain) - 3) // 3
    wrel = chain[0]
    affines = chain[1:]
    c_out = out.shape[2]

    out_shapes = [jax.ShapeDtypeStruct((b, n, c1), jnp.float32),
                  jax.ShapeDtypeStruct(wrel.shape, jnp.float32)]
    out_specs = [pl.BlockSpec((1, n, c1), lambda bi, ti: (bi, 0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec(wrel.shape, lambda bi, ti: (0, 0),
                              memory_space=pltpu.VMEM)]
    for p in affines:
        shp = (1, p.shape[0]) if p.ndim == 1 else p.shape
        out_shapes.append(jax.ShapeDtypeStruct(shp, jnp.float32))
        out_specs.append(pl.BlockSpec(
            shp, (lambda bi, ti, _nd=len(shp): (0,) * _nd),
            memory_space=pltpu.VMEM))

    in_specs = _plf_specs(b, n, c1, k, tile,
                          [(1, p.shape[0]) if p.ndim == 1 else p.shape
                           for p in (wrel,) + tuple(affines)])
    in_specs += [pl.BlockSpec((1, tile, c_out), lambda bi, ti: (bi, ti, 0),
                              memory_space=pltpu.VMEM)] * 2

    outs = pl.pallas_call(
        functools.partial(_plf_apply_bwd_kernel, num_layers=num_layers,
                          nsample=k),
        out_shape=tuple(out_shapes),
        grid=(b, n // tile),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        interpret=interpret,
    )(feat_tx, _km_idx(idx), xyz, xyz,
      *[p[None] if p.ndim == 1 else p for p in (wrel,) + tuple(affines)],
      out, d_out)

    d_feat, d_wrel = outs[0], outs[1]
    d_affs = tuple(o[0] if p.ndim == 1 else o
                   for o, p in zip(outs[2:], affines))
    return (d_feat, _int_zero(idx), jnp.zeros_like(xyz), d_wrel) + d_affs


plf_apply.defvjp(_plf_apply_fwd, _plf_apply_bwd)

# ---------------------------------------------------------------------------
# cost_volume_train


def _lr(x):
    return jnp.where(x > 0, x, 0.1 * x)


def _lrp(x):
    return jnp.where(x > 0, 1.0, 0.1)


def _wn_fwd(d_k, wn):
    w0, b0, w1, b1, w2, b2 = [r[:] for r in wn]
    h0 = jnp.maximum(jnp.dot(d_k, w0, preferred_element_type=jnp.float32)
                     + b0, 0.0)
    h1 = jnp.maximum(jnp.dot(h0, w1, preferred_element_type=jnp.float32)
                     + b1, 0.0)
    v = jnp.maximum(jnp.dot(h1, w2, preferred_element_type=jnp.float32)
                    + b2, 0.0)
    return h0, h1, v


def _wn_bwd(d_k, h0, h1, v, d_v, wn, d_wn):
    """Accumulate WeightNet param grads; returns updated accumulators."""
    w1, w2 = wn[2][:], wn[4][:]
    dim_t = (((0,), (0,)), ((), ()))
    d_pre2 = d_v * (v > 0)
    d_wn[4] = d_wn[4] + lax.dot_general(h1, d_pre2, dim_t,
                                        preferred_element_type=jnp.float32)
    d_wn[5] = d_wn[5] + jnp.sum(d_pre2, axis=0, keepdims=True)
    d_h1 = lax.dot_general(d_pre2, w2, (((1,), (1,)), ((), ())),
                           preferred_element_type=jnp.float32)
    d_pre1 = d_h1 * (h1 > 0)
    d_wn[2] = d_wn[2] + lax.dot_general(h0, d_pre1, dim_t,
                                        preferred_element_type=jnp.float32)
    d_wn[3] = d_wn[3] + jnp.sum(d_pre1, axis=0, keepdims=True)
    d_h0 = lax.dot_general(d_pre1, wn[2][:], (((1,), (1,)), ((), ())),
                           preferred_element_type=jnp.float32)
    d_pre0 = d_h0 * (h0 > 0)
    d_wn[0] = d_wn[0] + lax.dot_general(d_k, d_pre0, dim_t,
                                        preferred_element_type=jnp.float32)
    d_wn[1] = d_wn[1] + jnp.sum(d_pre0, axis=0, keepdims=True)
    return d_wn


def _cv_agg_bwd_kernel(p2p_ref, idx_ref, xyz1_ref, xyz1t_ref, *rest,
                       nsample):
    """VJP of the patch-to-patch aggregation: d_p2p scatter + WeightNet2
    grads, recomputing gathers and the tiny WN chain per k."""
    wn2 = rest[:6]
    d_out_ref = rest[6]
    d_p2p_ref = rest[7]
    d_wn_refs = rest[8:]

    n = p2p_ref.shape[1]
    t = idx_ref.shape[3]
    c = p2p_ref.shape[2]
    rows = lax.broadcasted_iota(jnp.int32, (n, t), dimension=0)
    dim0 = (((0,), (0,)), ((), ()))
    xyz1_hi, xyz1_lo = _hilo(xyz1_ref[0].astype(jnp.float32))
    xyz1_t = xyz1t_ref[0].astype(jnp.float32)
    p2p = p2p_ref[0]
    hi, lo = _hilo(p2p)
    d_out = d_out_ref[0]

    def body(kk, acc):
        d_p2p = acc[0]
        d_wn = list(acc[1:])
        idx_k = idx_ref[0, kk]
        oh_t = (rows == idx_k).astype(jnp.bfloat16)
        gp = (lax.dot_general(oh_t, hi, dim0,
                              preferred_element_type=jnp.float32)
              + lax.dot_general(oh_t, lo, dim0,
                                preferred_element_type=jnp.float32))
        d_k = (lax.dot_general(oh_t, xyz1_hi, dim0,
                               preferred_element_type=jnp.float32)
               + lax.dot_general(oh_t, xyz1_lo, dim0,
                                 preferred_element_type=jnp.float32)
               - xyz1_t)
        h0, h1, v = _wn_fwd(d_k, wn2)
        d_gp = d_out * v
        d_v = d_out * gp
        d_p2p = d_p2p + lax.dot_general(
            oh_t, d_gp, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        d_wn = _wn_bwd(d_k, h0, h1, v, d_v, wn2, d_wn)
        return (d_p2p, *d_wn)

    init = [jnp.zeros((n, c), jnp.float32)]
    for r in d_wn_refs:
        init.append(jnp.zeros(r.shape, jnp.float32))
    outs = lax.fori_loop(0, nsample, body, tuple(init))

    first = pl.program_id(0) == 0
    d_p2p_ref[0] = outs[0]

    @pl.when(first)
    def _():
        for r, vv in zip(d_wn_refs, outs[1:]):
            r[:] = vv

    @pl.when(jnp.logical_not(first))
    def _():
        for r, vv in zip(d_wn_refs, outs[1:]):
            r[:] = r[:] + vv


def _cv_p2p_bwd_kernel(f1t_ref, f2t_ref, idx_ref, xyz2_ref, xyz1_ref,
                       *rest, nsample):
    """VJP of the point-to-patch stage: recompute the LeakyReLU dense
    chain + WeightNet1 per k and backprop to features and params."""
    dense = rest[:6]  # wd, b0, w1, b1, w2, b2
    wn1 = rest[6:12]
    d_p2p_ref = rest[12]
    d_f1t_ref, d_f2t_ref = rest[13], rest[14]
    d_dense_refs = rest[15:21]
    d_wn_refs = rest[21:]

    n2 = f2t_ref.shape[1]
    t = idx_ref.shape[3]
    c = f1t_ref.shape[2]
    rows = lax.broadcasted_iota(jnp.int32, (n2, t), dimension=0)
    dim0 = (((0,), (0,)), ((), ()))
    dim_t = (((0,), (0,)), ((), ()))
    xyz2_hi, xyz2_lo = _hilo(xyz2_ref[0].astype(jnp.float32))
    xyz1 = xyz1_ref[0].astype(jnp.float32)
    f1t = f1t_ref[0].astype(jnp.float32)
    f2 = f2t_ref[0]
    f2_hi, f2_lo = _hilo(f2)
    wd = dense[0][:]
    b0 = dense[1][:]
    w1 = dense[2][:]
    b1 = dense[3][:]
    w2 = dense[4][:]
    b2 = dense[5][:]
    d_p2p = d_p2p_ref[0]

    def body(kk, acc):
        d_f1t, d_f2t = acc[0], acc[1]
        d_dense = list(acc[2:8])
        d_wn = list(acc[8:])
        idx_k = idx_ref[0, kk]
        oh_t = (rows == idx_k).astype(jnp.bfloat16)
        g = (lax.dot_general(oh_t, f2_hi, dim0,
                             preferred_element_type=jnp.float32)
             + lax.dot_general(oh_t, f2_lo, dim0,
                               preferred_element_type=jnp.float32))
        d_k = (lax.dot_general(oh_t, xyz2_hi, dim0,
                               preferred_element_type=jnp.float32)
               + lax.dot_general(oh_t, xyz2_lo, dim0,
                                 preferred_element_type=jnp.float32)
               - xyz1)
        x0 = f1t + g + jnp.dot(d_k, wd,
                               preferred_element_type=jnp.float32) + b0
        x1 = _lr(x0)
        pre2 = jnp.dot(x1, w1, preferred_element_type=jnp.float32) + b1
        x2 = _lr(pre2)
        pre3 = jnp.dot(x2, w2, preferred_element_type=jnp.float32) + b2
        x3 = _lr(pre3)
        h0, h1, v = _wn_fwd(d_k, wn1)

        # p2p = sum_k v * x3
        d_x3 = d_p2p * v
        d_v = d_p2p * x3
        d_wn = _wn_bwd(d_k, h0, h1, v, d_v, wn1, d_wn)

        d_pre3 = d_x3 * _lrp(pre3)
        d_dense[4] = d_dense[4] + lax.dot_general(
            x2, d_pre3, dim_t, preferred_element_type=jnp.float32)
        d_dense[5] = d_dense[5] + jnp.sum(d_pre3, axis=0, keepdims=True)
        d_x2 = lax.dot_general(d_pre3, w2, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
        d_pre2 = d_x2 * _lrp(pre2)
        d_dense[2] = d_dense[2] + lax.dot_general(
            x1, d_pre2, dim_t, preferred_element_type=jnp.float32)
        d_dense[3] = d_dense[3] + jnp.sum(d_pre2, axis=0, keepdims=True)
        d_x1 = lax.dot_general(d_pre2, w1, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
        d_x0 = d_x1 * _lrp(x0)

        d_f1t = d_f1t + d_x0
        d_f2t = d_f2t + lax.dot_general(
            oh_t, d_x0, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        d_dense[0] = d_dense[0] + lax.dot_general(
            d_k, d_x0, dim_t, preferred_element_type=jnp.float32)
        d_dense[1] = d_dense[1] + jnp.sum(d_x0, axis=0, keepdims=True)
        return (d_f1t, d_f2t, *d_dense, *d_wn)

    init = [jnp.zeros((t, c), jnp.float32), jnp.zeros((n2, c), jnp.float32)]
    for r in d_dense_refs:
        init.append(jnp.zeros(r.shape, jnp.float32))
    for r in d_wn_refs:
        init.append(jnp.zeros(r.shape, jnp.float32))
    outs = lax.fori_loop(0, nsample, body, tuple(init))

    first = pl.program_id(0) == 0
    d_f1t_ref[0] = outs[0]
    d_f2t_ref[0] = outs[1]

    @pl.when(first)
    def _():
        for r, vv in zip(d_dense_refs + d_wn_refs, outs[2:]):
            r[:] = vv

    @pl.when(jnp.logical_not(first))
    def _():
        for r, vv in zip(d_dense_refs + d_wn_refs, outs[2:]):
            r[:] = r[:] + vv


def _as2d(p):
    return p[None] if p.ndim == 1 else p


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def cost_volume_train(interpret: bool, f1t: Array, f2t: Array, idx2: Array,
                      idx1: Array, xyz1: Array, xyz2: Array,
                      dense: Tuple[Array, ...], wn1: Tuple[Array, ...],
                      wn2: Tuple[Array, ...]) -> Array:
    """FeatureCorrelator forward (= the eval Pallas kernels; it has no
    BatchNorm) with a recompute VJP for training."""
    return fused_cost_volume(f1t, f2t, idx2, xyz1, idx1, xyz2, interpret,
                             dense=dense, wn1=wn1, wn2=wn2)


def _cv_train_fwd(interpret, f1t, f2t, idx2, idx1, xyz1, xyz2,
                  dense, wn1, wn2):
    out = cost_volume_train(interpret, f1t, f2t, idx2, idx1, xyz1, xyz2,
                            dense, wn1, wn2)
    return out, (f1t, f2t, idx2, idx1, xyz1, xyz2, dense, wn1, wn2)


def _cv_train_bwd(interpret, res, d_out):
    from cmflow_tpu.ops.fused import _cv_kernel, _km_idx as _km

    f1t, f2t, idx2, idx1, xyz1, xyz2, dense, wn1, wn2 = res
    b, n, c = f1t.shape
    k = idx2.shape[2]
    idx2_km, idx1_km = _km(idx2), _km(idx1)

    full3 = pl.BlockSpec((1, n, c), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM)
    xyz_spec = pl.BlockSpec((1, n, 3), lambda bi: (bi, 0, 0),
                            memory_space=pltpu.VMEM)
    idx_spec = pl.BlockSpec((1, k, 1, n), lambda bi: (bi, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def specs_raw(params):
        # shape-faithful (the eval kernels read 1-D bias refs directly)
        out = []
        for p in params:
            out.append(pl.BlockSpec(
                p.shape, (lambda bi, _nd=p.ndim: (0,) * _nd),
                memory_space=pltpu.VMEM))
        return out

    def specs(params):
        # 2-D-ified (the bwd kernels broadcast [1, C] bias refs)
        out = []
        for p in params:
            shp = (1, p.shape[0]) if p.ndim == 1 else p.shape
            out.append(pl.BlockSpec(
                shp, (lambda bi, _nd=len(shp): (0,) * _nd),
                memory_space=pltpu.VMEM))
        return out

    def grad_shapes(params):
        shapes, sp = [], []
        for p in params:
            shp = (1, p.shape[0]) if p.ndim == 1 else p.shape
            shapes.append(jax.ShapeDtypeStruct(shp, jnp.float32))
            sp.append(pl.BlockSpec(
                shp, (lambda bi, _nd=len(shp): (0,) * _nd),
                memory_space=pltpu.VMEM))
        return shapes, sp

    # recompute the point-to-patch intermediate (one fwd kernel pass)
    p2p = pl.pallas_call(
        functools.partial(_cv_kernel, nsample=k),
        out_shape=jax.ShapeDtypeStruct((b, n, c), jnp.float32),
        grid=(b,),
        in_specs=[full3, full3, idx_spec, xyz_spec, xyz_spec]
        + specs_raw(dense) + specs_raw(wn1),
        out_specs=full3,
        interpret=interpret,
    )(f1t, f2t, idx2_km, xyz2, xyz1, *dense, *wn1)

    # stage 2 backward: d_p2p + WeightNet2 grads
    wn2_shapes, wn2_specs = grad_shapes(wn2)
    outs2 = pl.pallas_call(
        functools.partial(_cv_agg_bwd_kernel, nsample=k),
        out_shape=tuple([jax.ShapeDtypeStruct((b, n, c), jnp.float32)]
                        + wn2_shapes),
        grid=(b,),
        in_specs=[full3, idx_spec, xyz_spec, xyz_spec] + specs(wn2)
        + [full3],
        out_specs=tuple([full3] + wn2_specs),
        interpret=interpret,
    )(p2p, idx1_km, xyz1, xyz1, *[_as2d(p) for p in wn2], d_out)
    d_p2p = outs2[0]
    d_wn2 = tuple(o[0] if p.ndim == 1 else o
                  for o, p in zip(outs2[1:], wn2))

    # stage 1 backward: features + dense chain + WeightNet1 grads
    dense_shapes, dense_specs = grad_shapes(dense)
    wn1_shapes, wn1_specs = grad_shapes(wn1)
    outs1 = pl.pallas_call(
        functools.partial(_cv_p2p_bwd_kernel, nsample=k),
        out_shape=tuple([jax.ShapeDtypeStruct((b, n, c), jnp.float32)] * 2
                        + dense_shapes + wn1_shapes),
        grid=(b,),
        in_specs=[full3, full3, idx_spec, xyz_spec, xyz_spec]
        + specs(dense) + specs(wn1) + [full3],
        out_specs=tuple([full3, full3] + dense_specs + wn1_specs),
        interpret=interpret,
    )(f1t, f2t, idx2_km, xyz2, xyz1,
      *[_as2d(p) for p in dense], *[_as2d(p) for p in wn1], d_p2p)
    d_f1t, d_f2t = outs1[0], outs1[1]
    d_dense = tuple(o[0] if p.ndim == 1 else o
                    for o, p in zip(outs1[2:8], dense))
    d_wn1 = tuple(o[0] if p.ndim == 1 else o
                  for o, p in zip(outs1[8:], wn1))

    return (d_f1t, d_f2t, _int_zero(idx2), _int_zero(idx1),
            jnp.zeros_like(xyz1), jnp.zeros_like(xyz2),
            d_dense, d_wn1, d_wn2)


cost_volume_train.defvjp(_cv_train_fwd, _cv_train_bwd)
