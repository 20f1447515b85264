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
    _tile_offset,
    center_xyz,
    fused_cost_volume,
    fused_point_local_feature,
    make_plf_base,
)

Array = jax.Array


def _int_zero(x):
    """float0 cotangent for integer primal inputs."""
    return np.zeros(x.shape, jax.dtypes.float0)


def _gather_base(base_hi, base_lo, rows, idx_k):
    """Hi/lo one-hot gather of the folded base for one k slice (see
    ``_plf_kernel``: rel offsets are folded into the gathered tensor)."""
    oh_t = (rows == idx_k).astype(jnp.bfloat16)  # [N, T]
    dim0 = (((0,), (0,)), ((), ()))
    g = lax.dot_general(oh_t, base_hi, dim0,
                        preferred_element_type=jnp.float32)
    if base_lo is not None:
        g = g + lax.dot_general(oh_t, base_lo, dim0,
                                preferred_element_type=jnp.float32)
    return oh_t, g


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


def _plf_stats_kernel(base_ref, idx_ref, xyzt_ref, wrel_ref, *rest,
                      depth, nsample):
    sum_ref, sumsq_ref = rest[-2], rest[-1]
    affines = rest[:-2]

    n = base_ref.shape[1]
    t = idx_ref.shape[3]
    rows = lax.broadcasted_iota(jnp.int32, (n, t), dimension=0)
    base_hi, base_lo = _hilo(base_ref[0])
    off = _tile_offset(xyzt_ref, wrel_ref)

    c_d = sum_ref.shape[1]

    def body(kk, acc):
        s_acc, ss_acc = acc
        idx_k = idx_ref[0, kk]
        _, g = _gather_base(base_hi, base_lo, rows, idx_k)
        pre0 = g - off
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


def _chain_bwd(vals, affines, depth, d_pre, d_affs):
    """Backprop ``d_pre`` from layer ``depth`` down the [affine -> ReLU ->
    Dense] chain, accumulating (d_s, d_b, d_w) into the ``d_affs`` list.
    Returns d_pre0."""
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
        d_pre = d_a * affines[3 * level][:]
    return d_pre


def _bwd_writeback(d_feat_ref, d_wrel_ref, d_aff_refs, parts):
    """Accumulate one (tile, k-chunk) grid step's partial gradients into
    the output refs.  Grid is (b, tiles, kchunks) with kchunks innermost:
    the per-batch d_feat block initializes at the first (tile, chunk) of
    each b; the replicated weight grads at the global first step."""
    ti = pl.program_id(1)
    kc = pl.program_id(2)
    first_bt = jnp.logical_and(ti == 0, kc == 0)
    first = jnp.logical_and(pl.program_id(0) == 0, first_bt)

    @pl.when(first_bt)
    def _():
        d_feat_ref[0] = parts[0]

    @pl.when(jnp.logical_not(first_bt))
    def _():
        d_feat_ref[0] = d_feat_ref[0] + parts[0]

    @pl.when(first)
    def _():
        d_wrel_ref[:] = parts[1]
        for r, v in zip(d_aff_refs, parts[2:]):
            r[:] = v

    @pl.when(jnp.logical_not(first))
    def _():
        d_wrel_ref[:] = d_wrel_ref[:] + parts[1]
        for r, v in zip(d_aff_refs, parts[2:]):
            r[:] = r[:] + v


def _plf_stats_bwd_kernel(base_ref, idx_ref, xyzt_ref, wrel_ref,
                          *rest, depth, chunk):
    """Recompute the chain to ``depth`` and backprop
    d_pre = d_sum + 2 * pre * d_sumsq to every input.

    The k loop is a GRID dimension with a python-unrolled chunk body:
    Mosaic cannot keep large fori-loop accumulators in registers (a
    [256,512] f32 accumulator carried through a fori costs ~30x the
    matmul time, measured), while register accumulation across an
    unrolled chunk + @pl.when output accumulation across grid steps runs
    at the MXU floor (the r1 _gather_bwd_kernel pattern).

    The ``d_wrel`` output is ONLY the in-kernel offset part
    (``-xyz_t^T @ sum_k d_pre0``); the wrapper adds the glue part flowing
    through ``base = feat_tx + xyz @ wrel``."""
    num_outs = 2 + 3 * depth  # d_base, d_wrel, (d_s, d_b, d_w) per level
    out_refs = rest[-num_outs:]
    d_feat_ref, d_wrel_ref = out_refs[0], out_refs[1]
    d_aff_refs = out_refs[2:]
    dsum_ref, dss_ref = rest[-num_outs - 2], rest[-num_outs - 1]
    affines = rest[:-num_outs - 2]

    n = base_ref.shape[1]
    c1 = base_ref.shape[2]
    rows = lax.broadcasted_iota(jnp.int32, (n, idx_ref.shape[3]),
                                dimension=0)
    base_hi, base_lo = _hilo(base_ref[0])
    off = _tile_offset(xyzt_ref, wrel_ref)
    xyz_t = xyzt_ref[0].astype(jnp.float32)
    dsum = dsum_ref[:]
    dss = dss_ref[:]

    d_feat = jnp.zeros((n, c1), jnp.float32)
    d_wrel = jnp.zeros((3, c1), jnp.float32)
    d_affs = [jnp.zeros(a.shape, jnp.float32) for a in affines]
    for j in range(chunk):
        idx_k = idx_ref[0, j]
        oh_t, g = _gather_base(base_hi, base_lo, rows, idx_k)
        pre0 = g - off
        vals, pre = _chain_to(pre0, affines, depth)
        d_pre = dsum + 2.0 * pre * dss  # [T, C_depth]
        d_pre = _chain_bwd(vals, affines, depth, d_pre, d_affs)
        # d_pre0 -> base (scatter) + the offset's wrel part
        d_feat = d_feat + lax.dot_general(
            oh_t, d_pre.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [N, C1]
        d_wrel = d_wrel - lax.dot_general(
            xyz_t, d_pre, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [3, C1]

    _bwd_writeback(d_feat_ref, d_wrel_ref, d_aff_refs,
                   [d_feat, d_wrel] + d_affs)


def _km_idx(idx: Array) -> Array:
    return jnp.swapaxes(idx, 1, 2)[:, :, None, :]


def _plf_specs(b, n, c1, k, tile, extra_shapes):
    in_specs = [
        pl.BlockSpec((1, n, c1), lambda bi, ti: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, k, 1, tile), lambda bi, ti: (bi, 0, 0, ti),
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


def _plf_specs3(b, n, c1, chunk, tile, extra_shapes):
    """Input specs for the (b, tiles, kchunks) bwd grids: the idx operand
    is blocked along K so each grid step sees one chunk."""
    in_specs = [
        pl.BlockSpec((1, n, c1), lambda bi, ti, kc: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, chunk, 1, tile),
                     lambda bi, ti, kc: (bi, kc, 0, ti),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile, 3), lambda bi, ti, kc: (bi, ti, 0),
                     memory_space=pltpu.VMEM),
    ]
    for shp in extra_shapes:
        nd = len(shp)
        in_specs.append(pl.BlockSpec(
            shp, (lambda bi, ti, kc, _nd=nd: (0,) * _nd),
            memory_space=pltpu.VMEM))
    return in_specs


def _chunk_of(k: int) -> int:
    return 4 if k % 4 == 0 else k


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
    xyz_c = center_xyz(xyz)
    base = make_plf_base(feat_tx, xyz_c, wrel)
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
    )(base, _km_idx(idx), xyz_c,
      *[p[None] if p.ndim == 1 else p for p in params])
    return out[0][0], out[1][0]


def _plf_stats_fwd(depth, interpret, feat_tx, idx, xyz, wrel, *prev):
    out = plf_prebn_stats(depth, interpret, feat_tx, idx, xyz, wrel, *prev)
    # the bwd kernel recomputes from the SAME folded base the fwd used
    xyz_c = center_xyz(xyz)
    return out, (make_plf_base(feat_tx, xyz_c, wrel), idx, xyz_c, wrel,
                 prev)


def _plf_stats_bwd(depth, interpret, res, cts):
    base, idx, xyz, wrel, prev = res
    dsum, dss = cts
    b, n, c1 = base.shape
    k = idx.shape[2]
    tile = n if n <= 128 else 128
    chunk = _chunk_of(k)
    params = (wrel,) + prev

    out_shapes = [jax.ShapeDtypeStruct((b, n, c1), jnp.float32),
                  jax.ShapeDtypeStruct(wrel.shape, jnp.float32)]
    out_specs = [pl.BlockSpec((1, n, c1), lambda bi, ti, kc: (bi, 0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec(wrel.shape, lambda bi, ti, kc: (0, 0),
                              memory_space=pltpu.VMEM)]
    for level in range(depth):
        for p in prev[3 * level:3 * level + 3]:
            shp = (1, p.shape[0]) if p.ndim == 1 else p.shape
            out_shapes.append(jax.ShapeDtypeStruct(shp, jnp.float32))
            out_specs.append(pl.BlockSpec(
                shp, (lambda bi, ti, kc, _nd=len(shp): (0,) * _nd),
                memory_space=pltpu.VMEM))

    in_specs = _plf_specs3(b, n, c1, chunk, tile,
                           [(1, p.shape[0]) if p.ndim == 1 else p.shape
                            for p in params])
    c_d = dsum.shape[0]
    in_specs += [pl.BlockSpec((1, c_d), lambda bi, ti, kc: (0, 0),
                              memory_space=pltpu.VMEM)] * 2

    outs = pl.pallas_call(
        functools.partial(_plf_stats_bwd_kernel, depth=depth, chunk=chunk),
        out_shape=tuple(out_shapes),
        grid=(b, n // tile, k // chunk),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        interpret=interpret,
    )(base, _km_idx(idx), xyz,
      *[p[None] if p.ndim == 1 else p for p in params],
      dsum[None], dss[None])

    d_base, d_wrel_off = outs[0], outs[1]
    # base = feat_tx + xyz @ wrel: d_feat is d_base verbatim; wrel gets
    # the glue part on top of the kernel's offset part
    d_wrel = d_wrel_off + jnp.einsum("bnc,bnd->cd", xyz, d_base)
    d_prev = tuple(
        o[0] if p.ndim == 1 else o
        for o, p in zip(outs[2:], prev))
    return (d_base, _int_zero(idx), jnp.zeros_like(xyz), d_wrel) + d_prev


plf_prebn_stats.defvjp(_plf_stats_fwd, _plf_stats_bwd)


# ---------------------------------------------------------------------------
# plf_apply


def _plf_train_fwd_kernel(base_ref, idx_ref, xyzt_ref, wrel_ref, *rest,
                          num_layers, nsample):
    """Train-path forward of the grouped chain: max over K plus the
    FIRST-argmax index per output channel (torch's max convention,
    models/... .max(dim) — the bwd routes the gradient by index, which
    also removes any bitwise-recompute requirement).  One small-carry
    fori pass."""
    out_ref, cnt_ref = rest[-2], rest[-1]
    affines = rest[:-2]

    n = base_ref.shape[1]
    t = idx_ref.shape[3]
    c_out = out_ref.shape[2]
    rows = lax.broadcasted_iota(jnp.int32, (n, t), dimension=0)
    base_hi, base_lo = _hilo(base_ref[0])
    off = _tile_offset(xyzt_ref, wrel_ref)

    def r_of(kk):
        idx_k = idx_ref[0, kk]
        _, g = _gather_base(base_hi, base_lo, rows, idx_k)
        x = g - off
        for level in range(num_layers):
            x = jnp.maximum(
                x * affines[3 * level][:] + affines[3 * level + 1][:], 0.0)
            if level + 1 < num_layers:
                x = jnp.dot(x, affines[3 * level + 2][:],
                            preferred_element_type=jnp.float32)
        return x

    def body(kk, carry):
        acc, amax = carry
        r = r_of(kk)
        take = r > acc
        return jnp.maximum(acc, r), jnp.where(take, kk, amax)

    out, amax = lax.fori_loop(
        0, nsample, body,
        (jnp.full((t, c_out), -jnp.inf, jnp.float32),
         jnp.zeros((t, c_out), jnp.int32)))
    out_ref[0] = out
    cnt_ref[0] = amax


def _plf_apply_bwd_kernel(base_ref, idx_ref, xyzt_ref, wrel_ref,
                          *rest, num_layers, chunk):
    """Recompute-based VJP of the grouped chain + max-over-K, k-chunked
    into the grid (big fori accumulators are ~30x slow, see
    ``_plf_stats_bwd_kernel``).  ``d_share_ref`` carries
    ``d_out / max(ties, 1)`` from the glue; gradients route to every k
    whose recomputed output ties the max (bitwise recompute)."""
    n_aff = 3 * num_layers - 1  # s0,b0, (w,s,b)*(L-1)
    affines = rest[:n_aff]
    amax_ref, d_out_ref = rest[n_aff], rest[n_aff + 1]
    out_refs = rest[n_aff + 2:]
    d_feat_ref, d_wrel_ref = out_refs[0], out_refs[1]
    d_aff_refs = out_refs[2:]

    n = base_ref.shape[1]
    c1 = base_ref.shape[2]
    rows = lax.broadcasted_iota(jnp.int32, (n, idx_ref.shape[3]),
                                dimension=0)
    base_hi, base_lo = _hilo(base_ref[0])
    off = _tile_offset(xyzt_ref, wrel_ref)
    xyz_t = xyzt_ref[0].astype(jnp.float32)
    amax = amax_ref[0]
    d_out = d_out_ref[0]
    kc = pl.program_id(2)

    d_feat = jnp.zeros((n, c1), jnp.float32)
    d_wrel = jnp.zeros((3, c1), jnp.float32)
    d_affs = [jnp.zeros(a.shape, jnp.float32) for a in affines]
    for j in range(chunk):
        idx_k = idx_ref[0, j]
        oh_t, g = _gather_base(base_hi, base_lo, rows, idx_k)
        x = g - off
        vals = []
        for level in range(num_layers):
            a = x * affines[3 * level][:] + affines[3 * level + 1][:]
            vals.append((x, a))
            r = jnp.maximum(a, 0.0)
            if level + 1 < num_layers:
                x = jnp.dot(r, affines[3 * level + 2][:],
                            preferred_element_type=jnp.float32)
        d_pre = (amax == kc * chunk + j).astype(jnp.float32) * d_out
        # the last level has no trailing Dense: route through its affine
        x_l, a_l = vals[num_layers - 1]
        d_a = d_pre * (a_l > 0)
        d_affs[3 * (num_layers - 1)] = \
            d_affs[3 * (num_layers - 1)] + jnp.sum(
                d_a * x_l, axis=0, keepdims=True)
        d_affs[3 * (num_layers - 1) + 1] = \
            d_affs[3 * (num_layers - 1) + 1] + jnp.sum(
                d_a, axis=0, keepdims=True)
        d_pre = d_a * affines[3 * (num_layers - 1)][:]
        d_pre = _chain_bwd(vals, affines, num_layers - 1, d_pre, d_affs)
        d_feat = d_feat + lax.dot_general(
            oh_t, d_pre, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        d_wrel = d_wrel - lax.dot_general(
            xyz_t, d_pre, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    _bwd_writeback(d_feat_ref, d_wrel_ref, d_aff_refs,
                   [d_feat, d_wrel] + d_affs)


def _plf_train_forward(interpret, base, idx, xyz_c, chain):
    """Run the train fwd kernel; returns (out, tie_cnt)."""
    b, n, c1 = base.shape
    k = idx.shape[2]
    num_layers = 1 + (len(chain) - 3) // 3
    c_out = chain[-1].shape[-1]
    tile = n if n <= 128 else 128

    out, amax = pl.pallas_call(
        functools.partial(_plf_train_fwd_kernel, num_layers=num_layers,
                          nsample=k),
        out_shape=(jax.ShapeDtypeStruct((b, n, c_out), jnp.float32),
                   jax.ShapeDtypeStruct((b, n, c_out), jnp.int32)),
        grid=(b, n // tile),
        in_specs=_plf_specs(b, n, c1, k, tile,
                            [(1, p.shape[0]) if p.ndim == 1 else p.shape
                             for p in chain]),
        out_specs=(pl.BlockSpec((1, tile, c_out),
                                lambda bi, ti: (bi, ti, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, tile, c_out),
                                lambda bi, ti: (bi, ti, 0),
                                memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(base, _km_idx(idx), xyz_c,
      *[p[None] if p.ndim == 1 else p for p in chain])
    return out, amax


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def plf_apply(interpret: bool, feat_tx: Array, idx: Array, xyz: Array,
              *chain) -> Array:
    """Grouped [affine -> ReLU -> Dense] chain + max-over-K with a
    recompute VJP (train-path counterpart of
    :func:`cmflow_tpu.ops.fused.fused_point_local_feature`)."""
    xyz_c = center_xyz(xyz)
    base = make_plf_base(feat_tx, xyz_c, chain[0])
    out, _ = _plf_train_forward(interpret, base, idx, xyz_c, chain)
    return out


def _plf_apply_fwd(interpret, feat_tx, idx, xyz, *chain):
    xyz_c = center_xyz(xyz)
    base = make_plf_base(feat_tx, xyz_c, chain[0])
    out, amax = _plf_train_forward(interpret, base, idx, xyz_c, chain)
    return out, (base, idx, xyz_c, chain, amax)


def _plf_apply_bwd(interpret, res, d_out):
    base, idx, xyz, chain, amax = res
    b, n, c1 = base.shape
    k = idx.shape[2]
    tile = n if n <= 128 else 128
    chunk = _chunk_of(k)
    num_layers = 1 + (len(chain) - 3) // 3
    wrel = chain[0]
    affines = chain[1:]
    c_out = amax.shape[2]

    out_shapes = [jax.ShapeDtypeStruct((b, n, c1), jnp.float32),
                  jax.ShapeDtypeStruct(wrel.shape, jnp.float32)]
    out_specs = [pl.BlockSpec((1, n, c1), lambda bi, ti, kc: (bi, 0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec(wrel.shape, lambda bi, ti, kc: (0, 0),
                              memory_space=pltpu.VMEM)]
    for p in affines:
        shp = (1, p.shape[0]) if p.ndim == 1 else p.shape
        out_shapes.append(jax.ShapeDtypeStruct(shp, jnp.float32))
        out_specs.append(pl.BlockSpec(
            shp, (lambda bi, ti, kc, _nd=len(shp): (0,) * _nd),
            memory_space=pltpu.VMEM))

    in_specs = _plf_specs3(b, n, c1, chunk, tile,
                           [(1, p.shape[0]) if p.ndim == 1 else p.shape
                            for p in (wrel,) + tuple(affines)])
    in_specs += [pl.BlockSpec((1, tile, c_out),
                              lambda bi, ti, kc: (bi, ti, 0),
                              memory_space=pltpu.VMEM)] * 2

    outs = pl.pallas_call(
        functools.partial(_plf_apply_bwd_kernel, num_layers=num_layers,
                          chunk=chunk),
        out_shape=tuple(out_shapes),
        grid=(b, n // tile, k // chunk),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        interpret=interpret,
    )(base, _km_idx(idx), xyz,
      *[p[None] if p.ndim == 1 else p for p in (wrel,) + tuple(affines)],
      amax, d_out)

    d_base, d_wrel_off = outs[0], outs[1]
    d_wrel = d_wrel_off + jnp.einsum("bnc,bnd->cd", xyz, d_base)
    d_affs = tuple(o[0] if p.ndim == 1 else o
                   for o, p in zip(outs[2:], affines))
    return (d_base, _int_zero(idx), jnp.zeros_like(xyz), d_wrel) + d_affs


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
                       chunk):
    """VJP of the patch-to-patch aggregation: d_p2p scatter + WeightNet2
    grads, k-chunked into the grid (big fori accumulators are ~30x slow,
    see _plf_stats_bwd_kernel)."""
    wn2 = rest[:6]
    d_out_ref = rest[6]
    d_p2p_ref = rest[7]
    d_wn_refs = rest[8:]

    n = p2p_ref.shape[1]
    c = p2p_ref.shape[2]
    rows = lax.broadcasted_iota(jnp.int32, (n, idx_ref.shape[3]),
                                dimension=0)
    dim0 = (((0,), (0,)), ((), ()))
    xyz1_hi, xyz1_lo = _hilo(xyz1_ref[0].astype(jnp.float32))
    xyz1_t = xyz1t_ref[0].astype(jnp.float32)
    hi, lo = _hilo(p2p_ref[0])
    d_out = d_out_ref[0]

    d_p2p = jnp.zeros((n, c), jnp.float32)
    d_wn = [jnp.zeros(r.shape, jnp.float32) for r in d_wn_refs]
    for j in range(chunk):
        idx_k = idx_ref[0, j]
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

    kc = pl.program_id(1)
    first_k = kc == 0
    first = jnp.logical_and(pl.program_id(0) == 0, first_k)

    @pl.when(first_k)
    def _():
        d_p2p_ref[0] = d_p2p

    @pl.when(jnp.logical_not(first_k))
    def _():
        d_p2p_ref[0] = d_p2p_ref[0] + d_p2p

    @pl.when(first)
    def _():
        for r, vv in zip(d_wn_refs, d_wn):
            r[:] = vv

    @pl.when(jnp.logical_not(first))
    def _():
        for r, vv in zip(d_wn_refs, d_wn):
            r[:] = r[:] + vv


def _cv_p2p_bwd_kernel(f1t_ref, f2t_ref, idx_ref, xyz2_ref, xyz1_ref,
                       *rest, chunk):
    """VJP of the point-to-patch stage, k-chunked into the grid; row-tiled
    to stay under the 16 MB scoped-VMEM limit at C=512."""
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
    f2_hi, f2_lo = _hilo(f2t_ref[0])
    wd = dense[0][:]
    b0 = dense[1][:]
    w1 = dense[2][:]
    b1 = dense[3][:]
    w2 = dense[4][:]
    b2 = dense[5][:]
    d_p2p = d_p2p_ref[0]

    d_f1t = jnp.zeros((t, c), jnp.float32)
    d_f2t = jnp.zeros((n2, c), jnp.float32)
    d_dense = [jnp.zeros(r.shape, jnp.float32) for r in d_dense_refs]
    d_wn = [jnp.zeros(r.shape, jnp.float32) for r in d_wn_refs]
    for j in range(chunk):
        idx_k = idx_ref[0, j]
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

    ti = pl.program_id(1)
    kc = pl.program_id(2)
    first_tk = jnp.logical_and(ti == 0, kc == 0)
    first = jnp.logical_and(pl.program_id(0) == 0, first_tk)
    first_k = kc == 0

    # d_f1t: per (b, tile) rows, accumulated over k-chunks only
    @pl.when(first_k)
    def _():
        d_f1t_ref[0] = d_f1t

    @pl.when(jnp.logical_not(first_k))
    def _():
        d_f1t_ref[0] = d_f1t_ref[0] + d_f1t

    @pl.when(first_tk)
    def _():
        d_f2t_ref[0] = d_f2t

    @pl.when(jnp.logical_not(first_tk))
    def _():
        d_f2t_ref[0] = d_f2t_ref[0] + d_f2t

    @pl.when(first)
    def _():
        for r, vv in zip(d_dense_refs + d_wn_refs, d_dense + d_wn):
            r[:] = vv

    @pl.when(jnp.logical_not(first))
    def _():
        for r, vv in zip(d_dense_refs + d_wn_refs, d_dense + d_wn):
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

    def specs(params, two=False, three=False):
        # 2-D-ified (the bwd kernels broadcast [1, C] bias refs);
        # two/three select the grid-axis count of the index map
        out = []
        for p in params:
            shp = (1, p.shape[0]) if p.ndim == 1 else p.shape
            if three:
                idx_map = (lambda bi, ti, kc, _nd=len(shp): (0,) * _nd)
            elif two:
                idx_map = (lambda bi, ti, _nd=len(shp): (0,) * _nd)
            else:
                idx_map = (lambda bi, _nd=len(shp): (0,) * _nd)
            out.append(pl.BlockSpec(shp, idx_map,
                                    memory_space=pltpu.VMEM))
        return out

    def specs2(params):
        return specs(params, two=True)

    def specs3(params):
        return specs(params, three=True)

    def grad_shapes(params, two=False, three=False):
        shapes = []
        for p in params:
            shp = (1, p.shape[0]) if p.ndim == 1 else p.shape
            shapes.append(jax.ShapeDtypeStruct(shp, jnp.float32))
        return shapes, specs(params, two, three)

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

    # stage 2 backward: d_p2p + WeightNet2 grads (grid (b, kchunks))
    chunk = 4 if k % 4 == 0 else k
    wn2_shapes, wn2_specs = grad_shapes(wn2, two=True)
    full3_2 = pl.BlockSpec((1, n, c), lambda bi, kc: (bi, 0, 0),
                           memory_space=pltpu.VMEM)
    xyz_2 = pl.BlockSpec((1, n, 3), lambda bi, kc: (bi, 0, 0),
                         memory_space=pltpu.VMEM)
    idx_2 = pl.BlockSpec((1, chunk, 1, n), lambda bi, kc: (bi, kc, 0, 0),
                         memory_space=pltpu.VMEM)
    outs2 = pl.pallas_call(
        functools.partial(_cv_agg_bwd_kernel, chunk=chunk),
        out_shape=tuple([jax.ShapeDtypeStruct((b, n, c), jnp.float32)]
                        + wn2_shapes),
        grid=(b, k // chunk),
        in_specs=[full3_2, idx_2, xyz_2, xyz_2] + specs2(wn2)
        + [full3_2],
        out_specs=tuple([full3_2] + wn2_specs),
        interpret=interpret,
    )(p2p, idx1_km, xyz1, xyz1, *[_as2d(p) for p in wn2], d_out)
    d_p2p = outs2[0]
    d_wn2 = tuple(o[0] if p.ndim == 1 else o
                  for o, p in zip(outs2[1:], wn2))

    # stage 1 backward: features + dense chain + WeightNet1 grads.
    # Row-tiled and k-chunked (grid (b, tiles, kchunks)) — full-N blocks
    # exceed the 16 MB scoped-VMEM limit at C=512, and big fori
    # accumulators are ~30x slow.
    tile = n if n <= 128 else 128
    dense_shapes, dense_specs = grad_shapes(dense, three=True)
    wn1_shapes, wn1_specs = grad_shapes(wn1, three=True)
    tile3 = pl.BlockSpec((1, tile, c), lambda bi, ti, kc: (bi, ti, 0),
                         memory_space=pltpu.VMEM)
    outs1 = pl.pallas_call(
        functools.partial(_cv_p2p_bwd_kernel, chunk=chunk),
        out_shape=tuple([jax.ShapeDtypeStruct((b, n, c), jnp.float32)] * 2
                        + dense_shapes + wn1_shapes),
        grid=(b, n // tile, k // chunk),
        in_specs=[tile3,
                  pl.BlockSpec((1, n, c), lambda bi, ti, kc: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, chunk, 1, tile),
                               lambda bi, ti, kc: (bi, kc, 0, ti),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, n, 3), lambda bi, ti, kc: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, tile, 3),
                               lambda bi, ti, kc: (bi, ti, 0),
                               memory_space=pltpu.VMEM)]
        + specs3(dense) + specs3(wn1) + [tile3],
        out_specs=tuple([tile3,
                         pl.BlockSpec((1, n, c),
                                      lambda bi, ti, kc: (bi, 0, 0),
                                      memory_space=pltpu.VMEM)]
                        + dense_specs + wn1_specs),
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

# ---------------------------------------------------------------------------
# packed narrow multi-scale train ops (stacked-base gather, see
# fused.make_mse_base / fused._mse_kernel)


def _kthr_vec(widths, nsamples, layer):
    """Per-channel k-threshold for layer ``layer`` of a packed chain:
    channel c (in scale block s) is valid while k < nsamples[s].  Built
    from iota (a materialized constant would be a captured array, which
    pallas kernels reject)."""
    s_cnt = len(nsamples)
    each = widths[layer] // s_cnt
    cid = lax.broadcasted_iota(jnp.int32, (1, widths[layer]), 1) // each
    kthr = jnp.full((1, widths[layer]), nsamples[-1], jnp.int32)
    for s in range(s_cnt - 1):
        kthr = jnp.where(cid == s, nsamples[s], kthr)
    return kthr  # [1, C_l]


def _mse_oh(rows, idxs, s_cnt):
    oh = rows == idxs[0]
    for s in range(1, s_cnt):
        oh = jnp.logical_or(oh, rows == idxs[s])
    return oh.astype(jnp.bfloat16)  # [S*N, T]


def _mse_stats_kernel(base_ref, idx_ref, xyzt_ref, w0r_ref, *rest,
                      depth, nsamples, widths):
    """Packed-chain counterpart of ``_plf_stats_kernel``: one stacked
    gather per k; contributions of iterations k >= nsample_s are masked
    out of scale s's channel block before the accumulation."""
    sum_ref, sumsq_ref = rest[-2], rest[-1]
    affines = rest[:-2]
    s_cnt = len(nsamples)
    kmax = max(nsamples)

    sn = base_ref.shape[1]
    t = idx_ref.shape[3]
    rows = lax.broadcasted_iota(jnp.int32, (sn, t), dimension=0)
    base_hi, base_lo = _hilo(base_ref[0])
    off = _tile_offset(xyzt_ref, w0r_ref)
    kthr = _kthr_vec(widths, nsamples, depth)

    c_d = sum_ref.shape[1]
    dim0 = (((0,), (0,)), ((), ()))

    def body(kk, acc):
        s_acc, ss_acc = acc
        oh_t = _mse_oh(rows, idx_ref[0, kk], s_cnt)
        g = lax.dot_general(oh_t, base_hi, dim0,
                            preferred_element_type=jnp.float32)
        g = g + lax.dot_general(oh_t, base_lo, dim0,
                                preferred_element_type=jnp.float32)
        pre0 = g - off
        _, pre = _chain_to(pre0, affines, depth)
        kmask = (kthr > kk).astype(jnp.float32)  # [1, C_d]
        s_acc = s_acc + jnp.sum(pre, axis=0, keepdims=True) * kmask
        ss_acc = ss_acc + jnp.sum(pre * pre, axis=0, keepdims=True) * kmask
        return s_acc, ss_acc

    init = (jnp.zeros((1, c_d), jnp.float32),
            jnp.zeros((1, c_d), jnp.float32))
    s_out, ss_out = lax.fori_loop(0, kmax, body, init)

    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        sum_ref[:] = s_out
        sumsq_ref[:] = ss_out

    @pl.when(jnp.logical_not(first))
    def _():
        sum_ref[:] = sum_ref[:] + s_out
        sumsq_ref[:] = sumsq_ref[:] + ss_out


def _mse_stats_bwd_kernel(base_ref, idx_ref, xyzt_ref, w0r_ref, *rest,
                          depth, nsamples, widths, chunk):
    """Packed-chain stats VJP, k-chunked into the grid (see
    ``_plf_stats_bwd_kernel`` for why big fori accumulators are out)."""
    num_outs = 2 + 3 * depth
    out_refs = rest[-num_outs:]
    d_base_ref, d_w0r_ref = out_refs[0], out_refs[1]
    d_aff_refs = out_refs[2:]
    dsum_ref, dss_ref = rest[-num_outs - 2], rest[-num_outs - 1]
    affines = rest[:-num_outs - 2]
    s_cnt = len(nsamples)

    sn = base_ref.shape[1]
    c1 = base_ref.shape[2]
    rows = lax.broadcasted_iota(jnp.int32, (sn, idx_ref.shape[3]),
                                dimension=0)
    base_hi, base_lo = _hilo(base_ref[0])
    off = _tile_offset(xyzt_ref, w0r_ref)
    xyz_t = xyzt_ref[0].astype(jnp.float32)
    kthr = _kthr_vec(widths, nsamples, depth)
    dsum = dsum_ref[:]
    dss = dss_ref[:]
    dim0 = (((0,), (0,)), ((), ()))
    kc = pl.program_id(2)

    d_base = jnp.zeros((sn, c1), jnp.float32)
    d_w0r = jnp.zeros((3, c1), jnp.float32)
    d_affs = [jnp.zeros(a.shape, jnp.float32) for a in affines]
    for j in range(chunk):
        kk = kc * chunk + j
        oh_t = _mse_oh(rows, idx_ref[0, j], s_cnt)
        g = lax.dot_general(oh_t, base_hi, dim0,
                            preferred_element_type=jnp.float32)
        g = g + lax.dot_general(oh_t, base_lo, dim0,
                                preferred_element_type=jnp.float32)
        pre0 = g - off
        vals, pre = _chain_to(pre0, affines, depth)
        kmask = (kthr > kk).astype(jnp.float32)
        d_pre = (dsum + 2.0 * pre * dss) * kmask
        d_pre = _chain_bwd(vals, affines, depth, d_pre, d_affs)
        d_base = d_base + lax.dot_general(
            oh_t, d_pre, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        d_w0r = d_w0r - lax.dot_general(
            xyz_t, d_pre, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    _bwd_writeback(d_base_ref, d_w0r_ref, d_aff_refs,
                   [d_base, d_w0r] + d_affs)


def _mse_specs(b, sn, c1, kmax, s_cnt, tile, extra_shapes):
    in_specs = [
        pl.BlockSpec((1, sn, c1), lambda bi, ti: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, kmax, s_cnt, tile),
                     lambda bi, ti: (bi, 0, 0, ti),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile, 3), lambda bi, ti: (bi, ti, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, c1), lambda bi, ti: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    for shp in extra_shapes:
        nd = len(shp)
        in_specs.append(pl.BlockSpec(
            shp, (lambda bi, ti, _nd=nd: (0,) * _nd),
            memory_space=pltpu.VMEM))
    return in_specs


def _mse_specs3(b, sn, c1, chunk, s_cnt, tile, extra_shapes):
    in_specs = [
        pl.BlockSpec((1, sn, c1), lambda bi, ti, kc: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, chunk, s_cnt, tile),
                     lambda bi, ti, kc: (bi, kc, 0, ti),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile, 3), lambda bi, ti, kc: (bi, ti, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, c1), lambda bi, ti, kc: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    for shp in extra_shapes:
        nd = len(shp)
        in_specs.append(pl.BlockSpec(
            shp, (lambda bi, ti, kc, _nd=nd: (0,) * _nd),
            memory_space=pltpu.VMEM))
    return in_specs


def _shp2(p):
    return (1, p.shape[0]) if p.ndim == 1 else p.shape


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def mse_prebn_stats(depth: int, interpret: bool, nsamples, widths,
                    base: Array, idx_sh: Array, xyz: Array,
                    w0r_cat: Array, *prev) -> Tuple[Array, Array]:
    """Packed-chain pre-BN (sum, sum_sq) at layer ``depth`` over the
    per-scale-valid (B, N, K_s) positions (counts differ per channel
    block — divide by ``B*N*nsamples[s]`` per block in the glue)."""
    b = base.shape[0]
    s_cnt = len(nsamples)
    sn = base.shape[1]
    n = sn // s_cnt
    c1 = base.shape[2]
    kmax = max(nsamples)
    tile = n if n <= 128 else 128
    c_d = widths[depth]

    params = (w0r_cat,) + prev
    out = pl.pallas_call(
        functools.partial(_mse_stats_kernel, depth=depth,
                          nsamples=tuple(nsamples), widths=tuple(widths)),
        out_shape=(jax.ShapeDtypeStruct((1, c_d), jnp.float32),
                   jax.ShapeDtypeStruct((1, c_d), jnp.float32)),
        grid=(b, n // tile),
        in_specs=_mse_specs(b, sn, c1, kmax, s_cnt, tile,
                            [_shp2(p) for p in prev]),
        out_specs=(pl.BlockSpec((1, c_d), lambda bi, ti: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, c_d), lambda bi, ti: (0, 0),
                                memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(base, idx_sh, xyz, w0r_cat,
      *[p[None] if p.ndim == 1 else p for p in prev])
    return out[0][0], out[1][0]


def _mse_stats_fwd(depth, interpret, nsamples, widths, base, idx_sh, xyz,
                   w0r_cat, *prev):
    out = mse_prebn_stats(depth, interpret, nsamples, widths, base,
                          idx_sh, xyz, w0r_cat, *prev)
    return out, (base, idx_sh, xyz, w0r_cat, prev)


def _mse_stats_bwd(depth, interpret, nsamples, widths, res, cts):
    base, idx_sh, xyz, w0r_cat, prev = res
    dsum, dss = cts
    b = base.shape[0]
    s_cnt = len(nsamples)
    sn = base.shape[1]
    n = sn // s_cnt
    c1 = base.shape[2]
    kmax = max(nsamples)
    tile = n if n <= 128 else 128
    chunk = _chunk_of(kmax)

    out_shapes = [jax.ShapeDtypeStruct((b, sn, c1), jnp.float32),
                  jax.ShapeDtypeStruct((3, c1), jnp.float32)]
    out_specs = [pl.BlockSpec((1, sn, c1), lambda bi, ti, kc: (bi, 0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((3, c1), lambda bi, ti, kc: (0, 0),
                              memory_space=pltpu.VMEM)]
    for level in range(depth):
        for p in prev[3 * level:3 * level + 3]:
            shp = _shp2(p)
            out_shapes.append(jax.ShapeDtypeStruct(shp, jnp.float32))
            out_specs.append(pl.BlockSpec(
                shp, (lambda bi, ti, kc, _nd=len(shp): (0,) * _nd),
                memory_space=pltpu.VMEM))

    in_specs = _mse_specs3(b, sn, c1, chunk, s_cnt, tile,
                           [_shp2(p) for p in prev])
    c_d = dsum.shape[0]
    in_specs += [pl.BlockSpec((1, c_d), lambda bi, ti, kc: (0, 0),
                              memory_space=pltpu.VMEM)] * 2

    outs = pl.pallas_call(
        functools.partial(_mse_stats_bwd_kernel, depth=depth,
                          nsamples=tuple(nsamples), widths=tuple(widths),
                          chunk=chunk),
        out_shape=tuple(out_shapes),
        grid=(b, n // tile, kmax // chunk),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        interpret=interpret,
    )(base, idx_sh, xyz, w0r_cat,
      *[p[None] if p.ndim == 1 else p for p in prev],
      dsum[None], dss[None])

    d_base, d_w0r = outs[0], outs[1]
    d_prev = tuple(o[0] if p.ndim == 1 else o
                   for o, p in zip(outs[2:], prev))
    return (d_base, _int_zero(idx_sh), jnp.zeros_like(xyz), d_w0r) + d_prev


mse_prebn_stats.defvjp(_mse_stats_fwd, _mse_stats_bwd)


def _mse_train_fwd_kernel(base_ref, idx_ref, xyzt_ref, w0r_ref, *rest,
                          nsamples, out_each):
    """Packed train forward: masked max over K plus the FIRST-argmax
    index per channel (torch's max convention; the bwd routes gradients
    by index).  One small-carry fori pass."""
    affines = rest[:-2]
    out_ref, cnt_ref = rest[-2], rest[-1]
    s_cnt = len(nsamples)
    kmax = max(nsamples)
    num_layers = 3

    sn = base_ref.shape[1]
    t = idx_ref.shape[3]
    c_out = out_ref.shape[2]
    rows = lax.broadcasted_iota(jnp.int32, (sn, t), dimension=0)
    base_hi, base_lo = _hilo(base_ref[0])
    off = _tile_offset(xyzt_ref, w0r_ref)
    dim0 = (((0,), (0,)), ((), ()))

    cid = lax.broadcasted_iota(jnp.int32, (t, c_out), 1) // out_each
    kthr = jnp.full((t, c_out), nsamples[-1], jnp.int32)
    for s in range(s_cnt - 1):
        kthr = jnp.where(cid == s, nsamples[s], kthr)

    def r_of(kk):
        oh_t = _mse_oh(rows, idx_ref[0, kk], s_cnt)
        x = lax.dot_general(oh_t, base_hi, dim0,
                            preferred_element_type=jnp.float32)
        x = x + lax.dot_general(oh_t, base_lo, dim0,
                                preferred_element_type=jnp.float32)
        x = x - off
        for level in range(num_layers):
            a = x * affines[3 * level][:] + affines[3 * level + 1][:]
            r = jnp.maximum(a, 0.0)
            if level + 1 < num_layers:
                x = jnp.dot(r, affines[3 * level + 2][:],
                            preferred_element_type=jnp.float32)
        return jnp.where(kthr > kk, r, -jnp.inf)

    def body(kk, carry):
        acc, amax = carry
        r = r_of(kk)
        take = r > acc
        return jnp.maximum(acc, r), jnp.where(take, kk, amax)

    out, amax = lax.fori_loop(
        0, kmax, body,
        (jnp.full((t, c_out), -jnp.inf, jnp.float32),
         jnp.zeros((t, c_out), jnp.int32)))
    out_ref[0] = out
    cnt_ref[0] = amax


def _mse_apply_bwd_kernel(base_ref, idx_ref, xyzt_ref, w0r_ref, *rest,
                          nsamples, chunk):
    """Recompute VJP of the packed chain + masked max-over-K, k-chunked
    into the grid."""
    affines = rest[:8]  # s0,b0,w1,s1,b1,w2,s2,b2
    amax_ref, d_out_ref = rest[8], rest[9]
    out_refs = rest[10:]
    d_base_ref, d_w0r_ref = out_refs[0], out_refs[1]
    d_aff_refs = out_refs[2:]
    s_cnt = len(nsamples)
    num_layers = 3

    sn = base_ref.shape[1]
    t = idx_ref.shape[3]
    c1 = base_ref.shape[2]
    rows = lax.broadcasted_iota(jnp.int32, (sn, t), dimension=0)
    base_hi, base_lo = _hilo(base_ref[0])
    off = _tile_offset(xyzt_ref, w0r_ref)
    xyz_t = xyzt_ref[0].astype(jnp.float32)
    amax = amax_ref[0]
    d_out = d_out_ref[0]
    dim0 = (((0,), (0,)), ((), ()))
    kc = pl.program_id(2)

    d_base = jnp.zeros((sn, c1), jnp.float32)
    d_w0r = jnp.zeros((3, c1), jnp.float32)
    d_affs = [jnp.zeros(a.shape, jnp.float32) for a in affines]
    for j in range(chunk):
        kk = kc * chunk + j
        oh_t = _mse_oh(rows, idx_ref[0, j], s_cnt)
        x = lax.dot_general(oh_t, base_hi, dim0,
                            preferred_element_type=jnp.float32)
        x = x + lax.dot_general(oh_t, base_lo, dim0,
                                preferred_element_type=jnp.float32)
        x = x - off
        vals = []
        for level in range(num_layers):
            a = x * affines[3 * level][:] + affines[3 * level + 1][:]
            vals.append((x, a))
            r = jnp.maximum(a, 0.0)
            if level + 1 < num_layers:
                x = jnp.dot(r, affines[3 * level + 2][:],
                            preferred_element_type=jnp.float32)
        d_pre = (amax == kk).astype(jnp.float32) * d_out
        x_l, a_l = vals[num_layers - 1]
        d_a = d_pre * (a_l > 0)
        d_affs[3 * (num_layers - 1)] = \
            d_affs[3 * (num_layers - 1)] + jnp.sum(
                d_a * x_l, axis=0, keepdims=True)
        d_affs[3 * (num_layers - 1) + 1] = \
            d_affs[3 * (num_layers - 1) + 1] + jnp.sum(
                d_a, axis=0, keepdims=True)
        d_pre = d_a * affines[3 * (num_layers - 1)][:]
        d_pre = _chain_bwd(vals, affines, num_layers - 1, d_pre, d_affs)
        d_base = d_base + lax.dot_general(
            oh_t, d_pre, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        d_w0r = d_w0r - lax.dot_general(
            xyz_t, d_pre, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    _bwd_writeback(d_base_ref, d_w0r_ref, d_aff_refs,
                   [d_base, d_w0r] + d_affs)


def _mse_train_forward(interpret, nsamples, out_each, base, idx_sh, xyz,
                       w0r_cat, chain):
    b = base.shape[0]
    s_cnt = idx_sh.shape[2]
    sn = base.shape[1]
    n = sn // s_cnt
    c1 = base.shape[2]
    kmax = max(nsamples)
    tile = n if n <= 128 else 128
    c_out = s_cnt * out_each

    out_sp = pl.BlockSpec((1, tile, c_out), lambda bi, ti: (bi, ti, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_mse_train_fwd_kernel, nsamples=tuple(nsamples),
                          out_each=out_each),
        out_shape=(jax.ShapeDtypeStruct((b, n, c_out), jnp.float32),
                   jax.ShapeDtypeStruct((b, n, c_out), jnp.int32)),
        grid=(b, n // tile),
        in_specs=_mse_specs(b, sn, c1, kmax, s_cnt, tile,
                            [_shp2(p) for p in chain]),
        out_specs=(out_sp, out_sp),
        interpret=interpret,
    )(base, idx_sh, xyz, w0r_cat,
      *[p[None] if p.ndim == 1 else p for p in chain])


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def mse_apply(interpret: bool, nsamples, out_each, base: Array,
              idx_sh: Array, xyz: Array, w0r_cat: Array, *chain) -> Array:
    """Packed chain + masked max-over-K forward with a recompute VJP."""
    out, _ = _mse_train_forward(interpret, nsamples, out_each, base,
                                idx_sh, xyz, w0r_cat, chain)
    return out


def _mse_apply_fwd(interpret, nsamples, out_each, base, idx_sh, xyz,
                   w0r_cat, *chain):
    out, amax = _mse_train_forward(interpret, nsamples, out_each, base,
                                   idx_sh, xyz, w0r_cat, chain)
    return out, (base, idx_sh, xyz, w0r_cat, chain, amax)


def _mse_apply_bwd(interpret, nsamples, out_each, res, d_out):
    base, idx_sh, xyz, w0r_cat, chain, amax = res
    b = base.shape[0]
    s_cnt = idx_sh.shape[2]
    sn = base.shape[1]
    n = sn // s_cnt
    c1 = base.shape[2]
    kmax = max(nsamples)
    tile = n if n <= 128 else 128
    chunk = _chunk_of(kmax)
    c_out = amax.shape[2]

    out_shapes = [jax.ShapeDtypeStruct((b, sn, c1), jnp.float32),
                  jax.ShapeDtypeStruct((3, c1), jnp.float32)]
    out_specs = [pl.BlockSpec((1, sn, c1), lambda bi, ti, kc: (bi, 0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((3, c1), lambda bi, ti, kc: (0, 0),
                              memory_space=pltpu.VMEM)]
    for p in chain:
        shp = _shp2(p)
        out_shapes.append(jax.ShapeDtypeStruct(shp, jnp.float32))
        out_specs.append(pl.BlockSpec(
            shp, (lambda bi, ti, kc, _nd=len(shp): (0,) * _nd),
            memory_space=pltpu.VMEM))

    in_specs = _mse_specs3(b, sn, c1, chunk, s_cnt, tile,
                           [_shp2(p) for p in chain])
    in_specs += [pl.BlockSpec((1, tile, c_out),
                              lambda bi, ti, kc: (bi, ti, 0),
                              memory_space=pltpu.VMEM)] * 2

    outs = pl.pallas_call(
        functools.partial(_mse_apply_bwd_kernel,
                          nsamples=tuple(nsamples), chunk=chunk),
        out_shape=tuple(out_shapes),
        grid=(b, n // tile, kmax // chunk),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        interpret=interpret,
    )(base, idx_sh, xyz, w0r_cat,
      *[p[None] if p.ndim == 1 else p for p in chain],
      amax, d_out)

    d_base, d_w0r = outs[0], outs[1]
    d_chain = tuple(o[0] if p.ndim == 1 else o
                    for o, p in zip(outs[2:], chain))
    return (d_base, _int_zero(idx_sh), jnp.zeros_like(xyz), d_w0r) + d_chain


mse_apply.defvjp(_mse_apply_fwd, _mse_apply_bwd)
