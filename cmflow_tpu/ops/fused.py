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


def _tile_offset(xyzt_ref, wrel_ref):
    """``xyz_tile @ wrel`` to ~2^-16 (hi/lo on both operands, dropping the
    lo*lo term) — Mosaic rejects lax.Precision.HIGH, and the default
    single bf16 pass would lose ~2^-8 of large absolute coordinates that
    mostly cancel against the gathered term."""
    xyz_t = xyzt_ref[0].astype(jnp.float32)  # [T, 3]
    xt_hi, xt_lo = _hilo(xyz_t)
    w32 = wrel_ref[:].astype(jnp.float32)
    w_hi, w_lo = _hilo(w32)
    return (jnp.dot(xt_hi, w_hi, preferred_element_type=jnp.float32)
            + jnp.dot(xt_hi, w_lo, preferred_element_type=jnp.float32)
            + jnp.dot(xt_lo, w_hi, preferred_element_type=jnp.float32))


def _plf_kernel(base_ref, idx_ref, xyzt_ref, wrel_ref, *rest,
                num_layers, nsample):
    """One (batch-element, row-tile) step of the fused encoder.

    rest = s0, b0, [w1, s1, b1, [w2, s2, b2, ...]], out_ref

    The K neighbors are processed by a ``fori_loop`` with a running max —
    the index array is laid out k-major with the row-tile in the LANE
    dimension (``idx [B,K,1,T]``): the loop index hits a leading, untiled
    dimension (Mosaic has no layout for [T*K, C] <-> [T, K, C] reshapes),
    and the tiny trailing dim sits in sublanes, padded to 8 — a
    trailing-lane layout would pad it to 128 and blow the VMEM budget
    (measured: 2 MB per operand at T=128).  The transposed one-hot is
    contracted over its leading dim — ``onehot^T @ base`` — a clean MXU
    shape; the gather is *exact*: each output row sums exactly one nonzero
    product.

    Neighborhood offsets are FOLDED into the gather: since the grouped
    first layer only ever uses ``rel @ wrel``, associativity gives
    ``gather(feat_tx)[k] + (xyz[idx]-xyz_t) @ wrel
      = gather(feat_tx + xyz @ wrel)[k] - xyz_t @ wrel``,
    so the caller passes ``base = feat_tx + xyz @ wrel`` and the kernel
    subtracts the per-tile constant ``off = xyz_t @ wrel`` — ONE hi/lo
    gather per k instead of two (feat + xyz), the dominant MXU cost
    (measured: the xyz gather lane-pads 3 -> 128 and costs as much as a
    full-width pass).
    """
    out_ref = rest[-1]
    affines = rest[:-1]

    n = base_ref.shape[1]
    t = idx_ref.shape[3]
    c_out = out_ref.shape[2]

    # process U neighbors per iteration: their one-hots are concatenated
    # along lanes so the gather and the dense chain run as ONE [U*T, C]
    # matmul each — 4x fewer serialization points between small matmuls
    # (measured: the per-k loop left the MXU ~50% idle)
    u = max(d for d in (8, 4, 2, 1) if nsample % d == 0)
    rows = lax.broadcasted_iota(jnp.int32, (n, u * t), dimension=0)
    base = base_ref[0]
    off1 = _tile_offset(xyzt_ref, wrel_ref)  # [T, C1], per tile not per k
    off = jnp.concatenate([off1] * u, axis=0)  # [U*T, C1]

    if base.dtype == jnp.bfloat16:
        # bf16 serving: base arrives pre-rounded; one MXU pass per gather
        base_hi, base_lo = base, None
    else:
        # hi/lo split: two single-pass bf16 one-hot matmuls reconstruct the
        # f32 values to ~2^-16 relative (the compiler's HIGHEST would use
        # six).  The one-hot lhs is exact in bf16.
        base_hi, base_lo = _hilo(base)

    dim0 = (((0,), (0,)), ((), ()))  # contract leading dims: a^T @ b

    def body(kg, acc):
        idx_cat = jnp.concatenate(
            [idx_ref[0, kg * u + uu] for uu in range(u)], axis=1)  # [1, U*T]
        oh_t = (rows == idx_cat).astype(jnp.bfloat16)  # [N, U*T]
        g = lax.dot_general(oh_t, base_hi, dim0,
                            preferred_element_type=jnp.float32)
        if base_lo is not None:
            g = g + lax.dot_general(oh_t, base_lo, dim0,
                                    preferred_element_type=jnp.float32)
        x = g - off

        # [affine BN -> ReLU -> Dense] chain (affines applied in f32;
        # matmul inputs in the weights' dtype — bf16 halves MXU passes)
        x = jnp.maximum(x * affines[0][:] + affines[1][:], 0.0)
        pos = 2
        for _ in range(num_layers - 1):
            w, s, b = affines[pos], affines[pos + 1], affines[pos + 2]
            pos += 3
            w_val = w[:]
            x = jnp.dot(x.astype(w_val.dtype), w_val,
                        preferred_element_type=jnp.float32)
            x = jnp.maximum(x * s[:] + b[:], 0.0)

        m = x[0:t]
        for uu in range(1, u):
            m = jnp.maximum(m, x[uu * t:(uu + 1) * t])
        return jnp.maximum(acc, m)

    init = jnp.full((t, c_out), -jnp.inf, jnp.float32)
    out_ref[0] = lax.fori_loop(0, nsample // u, body, init)


def center_xyz(xyz: Array) -> Array:
    """Subtract the per-cloud centroid before folding coordinates into the
    gathered base.  The centering cancels exactly in the kernels'
    ``gather(base) - off`` (both terms shift by ``c @ wrel``), but the
    ~2^-16 hi/lo rounding acts on the folded magnitudes — centering keeps
    them at scene-extent scale instead of absolute-coordinate scale."""
    return xyz - jnp.mean(xyz, axis=1, keepdims=True)


def make_plf_base(feat_tx: Array, xyz: Array, wrel: Array) -> Array:
    """``feat_tx + xyz @ wrel`` with an exact f32 product (the offset
    subtraction in-kernel cancels large coordinate terms; default XLA
    precision would lose ~2^-8 of them)."""
    prod = lax.dot_general(
        xyz.astype(jnp.float32), wrel.astype(jnp.float32),
        (((2,), (0,)), ((), ())), precision=lax.Precision.HIGHEST)
    return (feat_tx.astype(jnp.float32) + prod).astype(feat_tx.dtype)


@functools.partial(jax.jit, static_argnums=(4,))
def fused_point_local_feature(
    feat_tx: Array,
    idx: Array,
    xyz: Array,
    params: Tuple[Array, ...],
    interpret: bool = False,
) -> Array:
    """Fused grouped-MLP + max-pool over ball-query neighborhoods.

    Args:
      feat_tx: ``[B, N, C1]`` per-point features *after* the factored first
        layer's feature transform (``features @ w0[3:]``).
      idx: ``[B, N, K]`` int32 ball-query indices.
      xyz: ``[B, N, 3]`` point coordinates (relative offsets are computed
        in-kernel from these — no ``[B,N,K,3]`` XLA-side tensor).
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

    # T=128 fills the MXU's M dimension (a 64-row tile leaves half the
    # systolic array idle); VMEM stays comfortable even at C1=512
    tile = n if n <= 128 else 128
    assert n % tile == 0, (n, tile)

    # k-major, tile-in-lanes layout (see kernel docstring)
    idx_km = jnp.swapaxes(idx, 1, 2)[:, :, None, :]  # [B, K, 1, N]
    xyz_c = center_xyz(xyz)
    base = make_plf_base(feat_tx, xyz_c, params[0])

    grid = (b, n // tile)
    in_specs = [
        pl.BlockSpec((1, n, c1), lambda bi, ti: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, k, 1, tile), lambda bi, ti: (bi, 0, 0, ti),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile, 3), lambda bi, ti: (bi, ti, 0),
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
    )(base, idx_km, xyz_c, *params)
    return out


def make_mse_base(feats, xyz, w0rel_list, w0feat_list, dtype=jnp.float32):
    """Stacked block-diagonal base for the one-matmul multi-scale gather.

    Returns ``[B, S*N, C1c]``: rows ``s*N..(s+1)*N`` hold scale s's folded
    first-layer values ``feats @ w0f_s + xyz @ w0r_s`` in channel block s,
    zeros elsewhere.  Because per-scale shifted indices land in disjoint
    row ranges and the blocks are column-disjoint, ONE one-hot matmul per
    k gathers ALL scales' pre-activations at full MXU width (the previous
    per-scale gathers cost ~24 lane-padded passes per k; this costs 2).

    The xyz product is exact f32 (the in-kernel per-tile offset
    subtraction cancels large coordinate terms — default single-pass bf16
    would lose ~2^-8 of them)."""
    b, n, _ = feats.shape
    c1c = sum(w.shape[1] for w in w0rel_list)
    parts = []
    start = 0
    for w0r, w0f in zip(w0rel_list, w0feat_list):
        c = w0r.shape[1]
        prod = lax.dot_general(
            xyz.astype(jnp.float32), w0r.astype(jnp.float32),
            (((2,), (0,)), ((), ())), precision=lax.Precision.HIGHEST)
        ftx = lax.dot_general(
            feats.astype(jnp.float32), w0f.astype(jnp.float32),
            (((2,), (0,)), ((), ())), precision=lax.Precision.HIGHEST)
        blk = jnp.pad(ftx + prod, ((0, 0), (0, 0), (start, c1c - start - c)))
        parts.append(blk)
        start += c
    return jnp.concatenate(parts, axis=1).astype(dtype)


def _mse_kernel(base_ref, idx_ref, xyzt_ref, w0r_ref, *rest,
                num_scales, nsamples, out_each):
    """Fused narrow MultiScaleEncoder: ALL scales of one encoder in one
    kernel, block-diagonally packed so every matmul runs at full 128-lane
    MXU width.

    The per-scale kernels are tiny for the sa encoder (C=32..64 ->
    ~12% MXU lane utilization); packing the scales' chains into
    [128,128]/[128,256] block-diagonal matmuls recovers full tiles, and
    the STACKED base (see :func:`make_mse_base`) turns the S per-scale
    neighborhood gathers into ONE [S*N, T]^T @ [S*N, C1c] matmul per k.
    Scales keep disjoint channel blocks through the whole chain, so the
    math per scale is unchanged; iterations k >= nsample_s are masked to
    -inf for scale s's output block before the running max.

    rest = s0, b0, w1bd, s1, b1, w2bd, s2, b2, out_ref;
    idx_ref is ``[1, Kmax, S, T]`` with per-scale indices SHIFTED by s*N.
    """
    s_cnt = num_scales
    (s0_ref, b0_ref, w1_ref, s1_ref, b1_ref,
     w2_ref, s2_ref, b2_ref, out_ref) = rest

    sn = base_ref.shape[1]  # S * N
    t = idx_ref.shape[3]
    c_out = out_ref.shape[2]
    kmax = max(nsamples)

    rows = lax.broadcasted_iota(jnp.int32, (sn, t), dimension=0)
    base = base_ref[0]
    off = _tile_offset(xyzt_ref, w0r_ref)  # [T, C1c]
    if base.dtype == jnp.bfloat16:
        base_hi, base_lo = base, None
    else:
        base_hi, base_lo = _hilo(base)

    w1 = w1_ref[:]
    w2 = w2_ref[:]

    # per-output-channel iteration threshold: channel block s is valid
    # while kk < nsamples[s]
    cid = lax.broadcasted_iota(jnp.int32, (t, c_out), 1) // out_each
    kthr = jnp.full((t, c_out), nsamples[-1], jnp.int32)
    for s in range(s_cnt - 1):
        kthr = jnp.where(cid == s, nsamples[s], kthr)

    dim0 = (((0,), (0,)), ((), ()))  # contract leading dims: a^T @ b
    n_per = sn // s_cnt

    # PHASED k loop: with ascending per-scale K, scales finish in order,
    # so iterations k >= nsamples[p] can drop rows [0 : (p+1)*N] from the
    # gather contraction entirely — total work is sum(K_s) scale-k units
    # instead of S*Kmax (2.1x for the sa encoder's (4,8,16,32)).
    ascending = all(nsamples[i] <= nsamples[i + 1]
                    for i in range(s_cnt - 1))
    phases = ([(0, nsamples[0], 0)]
              + [(nsamples[p - 1], nsamples[p], p)
                 for p in range(1, s_cnt)]) if ascending \
        else [(0, kmax, 0)]

    def make_body(p_start, u):
        # U neighbors per iteration, one-hots concatenated in lanes (see
        # _plf_kernel): the gather and the block-diagonal chain run as
        # [U*T, C] matmuls instead of U serialized [T, C] ones
        rows_p = lax.broadcasted_iota(
            jnp.int32, (sn - p_start * n_per, t), dimension=0) \
            + p_start * n_per
        hi_p = base_hi[p_start * n_per:]
        lo_p = base_lo[p_start * n_per:] if base_lo is not None else None
        off_u = jnp.concatenate([off] * u, axis=0) if u > 1 else off

        def body(kg, acc):
            kk0 = kg * u
            cols = []
            for uu in range(u):
                idxs = idx_ref[0, kk0 + uu]  # [S, T], shifted by s*N
                oh_u = rows_p == idxs[p_start]
                for s in range(p_start + 1, s_cnt):
                    oh_u = jnp.logical_or(oh_u, rows_p == idxs[s])
                cols.append(oh_u)
            oh_t = (cols[0] if u == 1
                    else jnp.concatenate(cols, axis=1)).astype(jnp.bfloat16)
            x = lax.dot_general(oh_t, hi_p, dim0,
                                preferred_element_type=jnp.float32)
            if lo_p is not None:
                x = x + lax.dot_general(oh_t, lo_p, dim0,
                                        preferred_element_type=jnp.float32)
            x = x - off_u
            x = jnp.maximum(x * s0_ref[:] + b0_ref[:], 0.0)
            x = jnp.dot(x.astype(w1.dtype), w1,
                        preferred_element_type=jnp.float32)
            x = jnp.maximum(x * s1_ref[:] + b1_ref[:], 0.0)
            x = jnp.dot(x.astype(w2.dtype), w2,
                        preferred_element_type=jnp.float32)
            x = jnp.maximum(x * s2_ref[:] + b2_ref[:], 0.0)
            m = jnp.where(kthr > kk0, x[0:t], -jnp.inf)
            for uu in range(1, u):
                m = jnp.maximum(
                    m, jnp.where(kthr > kk0 + uu,
                                 x[uu * t:(uu + 1) * t], -jnp.inf))
            return jnp.maximum(acc, m)

        return body

    acc = jnp.full((t, c_out), -jnp.inf, jnp.float32)
    for k_lo, k_hi, p_start in phases:
        if k_lo == k_hi:
            continue
        u = max(d for d in (8, 4, 2, 1)
                if k_lo % d == 0 and (k_hi - k_lo) % d == 0)
        acc = lax.fori_loop(k_lo // u, k_hi // u, make_body(p_start, u), acc)
    out_ref[0] = acc


def shift_idx_stack(idx_list, nsamples, n):
    """Per-scale ``[B, N, K_s]`` indices -> ``[B, Kmax, S, N]`` k-major
    stack with scale s's indices shifted by ``s*n`` (rows of the stacked
    base).  Padded k slots keep in-range values; the kernels mask them."""
    kmax = max(nsamples)
    cols = []
    for s, idx in enumerate(idx_list):
        i2 = jnp.swapaxes(idx, 1, 2) + s * n  # [B, K, N]
        pad = kmax - idx.shape[2]
        if pad:
            i2 = jnp.pad(i2, ((0, 0), (0, pad), (0, 0)),
                         constant_values=s * n)
        cols.append(i2)
    return jnp.stack(cols, axis=2)  # [B, Kmax, S, N]


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def fused_multi_scale_encoder(
    feats: Array,
    idx_list: Sequence[Array],
    xyz: Array,
    packed: Tuple,
    nsamples: Tuple[int, ...] = (),
    interpret: bool = False,
    out_each: int = 64,
) -> Array:
    """All scales of a narrow MultiScaleEncoder fused into one kernel.

    Args:
      feats: ``[B, N, Cf]`` raw per-point features.
      idx_list: per scale, ``[B, N, K_s]`` ball-query indices.
      xyz: ``[B, N, 3]`` coordinates.
      packed: ``(w0rel_raw tuple, w0feat_raw tuple, s0, b0, w1bd, s1, b1,
        w2bd, s2, b2)`` from :func:`mse_narrow_params_from_variables`.
      nsamples: static per-scale K.
      out_each: channels per scale in the output (= mlp[-1]).

    Returns:
      ``[B, N, S*mlp[-1]]`` concatenated max-pooled features (pre-mlp2),
      channel blocks in scale order.
    """
    w0rel_list, w0feat_list = packed[0], packed[1]
    chain = packed[2:]
    s_cnt = len(idx_list)
    b, n, _ = feats.shape
    kmax = max(nsamples)
    c_out = s_cnt * out_each

    tile = n if n <= 128 else 128
    assert n % tile == 0, (n, tile)

    xyz_c = center_xyz(xyz)
    base = make_mse_base(feats, xyz_c, w0rel_list, w0feat_list, feats.dtype)
    idx_sh = shift_idx_stack(idx_list, nsamples, n)
    w0r_cat = jnp.concatenate(
        [w.astype(jnp.float32) for w in w0rel_list], axis=1)  # [3, C1c]
    c1c = w0r_cat.shape[1]

    grid = (b, n // tile)
    in_specs = [
        pl.BlockSpec((1, s_cnt * n, c1c), lambda bi, ti: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, kmax, s_cnt, tile),
                     lambda bi, ti: (bi, 0, 0, ti),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile, 3), lambda bi, ti: (bi, ti, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(w0r_cat.shape, lambda bi, ti: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    for p in chain:
        nd = p.ndim
        in_specs.append(pl.BlockSpec(p.shape,
                                     (lambda bi, ti, _nd=nd: (0,) * _nd),
                                     memory_space=pltpu.VMEM))

    return pl.pallas_call(
        functools.partial(_mse_kernel, num_scales=s_cnt,
                          nsamples=tuple(nsamples), out_each=out_each),
        out_shape=jax.ShapeDtypeStruct((b, n, c_out), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile, c_out),
                               lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(base, idx_sh, xyz_c, w0r_cat, *chain)


def mse_narrow_params_from_variables(mse_params, mse_stats, num_scales,
                                     dtype=jnp.float32):
    """Pack a narrow MultiScaleEncoder's per-scale params into the
    block-diagonal layout of :func:`fused_multi_scale_encoder`.

    Returns ``(packed, mlp2_bd)`` where ``packed`` leads with the RAW
    per-scale first-layer factors (the wrapper folds them into the
    stacked base) and ``mlp2_bd`` is a list of ``(w_blockdiag, scale,
    bias)`` for the per-point mlp2 tail (full-width matmuls in XLA glue).
    """
    from jax.scipy.linalg import block_diag

    w0rel, w0feat, s0, b0, w1s, s1, b1, w2s, s2, b2 = \
        [], [], [], [], [], [], [], [], [], []
    mlp2_per_layer = None
    for s in range(num_scales):
        sp, ss = mse_params[f"scale_{s}"], mse_stats[f"scale_{s}"]
        chain, feat_w, mlp2 = plf_params_from_variables(sp, ss)
        # chain = (wrel, s0, b0, w1, s1, b1, w2, s2, b2) for mlp of 3
        assert len(chain) == 9, "narrow path expects a 3-layer sa mlp"
        w0rel.append(chain[0])
        w0feat.append(feat_w)
        s0.append(chain[1]); b0.append(chain[2])
        w1s.append(chain[3]); s1.append(chain[4]); b1.append(chain[5])
        w2s.append(chain[6]); s2.append(chain[7]); b2.append(chain[8])
        if mlp2_per_layer is None:
            mlp2_per_layer = [[] for _ in mlp2]
        for li, (w, sc, bi_) in enumerate(mlp2):
            mlp2_per_layer[li].append((w, sc, bi_))

    packed = (
        tuple(w0rel), tuple(w0feat),
        jnp.concatenate(s0), jnp.concatenate(b0),
        block_diag(*w1s).astype(dtype),
        jnp.concatenate(s1), jnp.concatenate(b1),
        block_diag(*w2s).astype(dtype),
        jnp.concatenate(s2), jnp.concatenate(b2),
    )

    mlp2_bd = []
    for layer in mlp2_per_layer:
        mlp2_bd.append((
            block_diag(*[w for w, _, _ in layer]),
            jnp.concatenate([sc for _, sc, _ in layer]),
            jnp.concatenate([bi_ for _, _, bi_ in layer]),
        ))
    return packed, mlp2_bd


def _hilo(x: Array) -> Tuple[Array, Array]:
    """Split f32 into two bf16 parts whose sum reconstructs it to ~2^-16
    relative — makes single-pass bf16 one-hot matmuls effectively exact."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _gather_fwd_kernel(points_ref, idx_ref, out_ref):
    """One (batch-element, row-tile) step of the MXU gather: a [T, C] tile
    of gathered rows as ``onehot^T @ points`` (hi/lo bf16, exact to ~2^-16;
    single pass when points are already bf16).

    XLA's native gather emitter moves one row per cycle group and costs
    ~3 ms even for a [64,256,32,3] gather whose HBM traffic is <10 us; as
    an MXU matmul the same gather is bandwidth-bound instead."""
    n = points_ref.shape[1]
    t = idx_ref.shape[2]
    rows = lax.broadcasted_iota(jnp.int32, (n, t), dimension=0)
    oh_t = (rows == idx_ref[0]).astype(jnp.bfloat16)  # [N, T]
    pts = points_ref[0]
    dim0 = (((0,), (0,)), ((), ()))  # contract leading dims: a^T @ b
    if pts.dtype == jnp.bfloat16:
        out = lax.dot_general(oh_t, pts, dim0,
                              preferred_element_type=jnp.float32)
    else:
        hi, lo = _hilo(pts)
        out = (lax.dot_general(oh_t, hi, dim0,
                               preferred_element_type=jnp.float32)
               + lax.dot_general(oh_t, lo, dim0,
                                 preferred_element_type=jnp.float32))
    out_ref[0] = out.astype(out_ref.dtype)


def mxu_gather_rows(points: Array, idx: Array,
                    interpret: bool = False) -> Array:
    """Gather ``points[b, idx[b, m]]`` -> ``[B, M, C]`` via one-hot MXU
    matmuls (row tiles of 128 in the lane dimension).

    ``M`` is padded to a multiple of 128 internally; the result is sliced
    back.  Exact for f32 inputs (hi/lo bf16 split)."""
    b, n, c = points.shape
    m = idx.shape[1]
    # biggest tile that divides M (bounded by VMEM: [tile, C] out block)
    tile = next((x for x in (512, 384, 256, 128, 64, 32, 16, 8)
                 if m % x == 0), min(128, m))
    pad = (-m) % tile
    if pad:
        idx = jnp.pad(idx, ((0, 0), (0, pad)))
    mp = m + pad

    out = pl.pallas_call(
        _gather_fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((b, mp, c), points.dtype),
        grid=(b, mp // tile),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda bi, ti: (bi, 0, ti),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, c), lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(points, idx[:, None, :].astype(jnp.int32))
    return out[:, :m] if pad else out


def _gather_bwd_kernel(g_ref, idx_ref, out_ref):
    """Accumulate d_points[b] += onehot_block^T @ g_block over a flat-row
    grid dimension (the transpose of the gather — XLA lowers this to a
    serial scatter-add that is ~7x slower at C=512 than the MXU matmul).

    The cotangent arrives flattened to [B, S*K, C] (a free bitcast) and
    each grid step contracts ONE [N, RB] one-hot against a [RB, C] row
    block — one MXU matmul per hi/lo pass, instead of the earlier
    per-k-chunk variant's 16 sequential [N, S]x[S, C] dots whose
    dependency chain left the MXU ~4x under-utilized (profiled 5.8 ms vs
    the ~2 ms matmul+HBM floor at S=256, K=32, C=512)."""
    n = out_ref.shape[1]
    rb = g_ref.shape[1]
    rc = pl.program_id(1)
    rows = lax.broadcasted_iota(jnp.int32, (n, rb), dimension=0)

    oh_t = (rows == idx_ref[0]).astype(jnp.bfloat16)  # [N, RB]
    g = g_ref[0]
    if g.dtype == jnp.bfloat16:
        part = jnp.dot(oh_t, g, preferred_element_type=jnp.float32)
    else:
        hi, lo = _hilo(g)
        part = (jnp.dot(oh_t, hi, preferred_element_type=jnp.float32)
                + jnp.dot(oh_t, lo, preferred_element_type=jnp.float32))

    @pl.when(rc == 0)
    def _():
        out_ref[0] = part

    @pl.when(rc > 0)
    def _():
        out_ref[0] = out_ref[0] + part


def _mxu_gather_bwd(n: int, idx: Array, g: Array, interpret: bool) -> Array:
    b, t, k, c = g.shape
    r = t * k
    rb = next((x for x in (512, 384, 256, 128, 64, 32, 16, 8)
               if r % x == 0), None)
    if rb is None:  # odd row count: single block
        rb = r
    g_flat = g.reshape(b, r, c)
    idx_flat = idx.reshape(b, 1, r)
    return pl.pallas_call(
        _gather_bwd_kernel,
        out_shape=jax.ShapeDtypeStruct((b, n, c), jnp.float32),
        grid=(b, r // rb),
        in_specs=[
            pl.BlockSpec((1, rb, c), lambda bi, ri: (bi, ri, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rb), lambda bi, ri: (bi, 0, ri),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, c), lambda bi, ri: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(g_flat, idx_flat.astype(jnp.int32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def mxu_group_points(points: Array, idx: Array,
                     interpret: bool = False) -> Array:
    """``group_points`` where BOTH directions are exact one-hot MXU matmuls.

    Forward: XLA's gather emitter costs ~3 ms per [64,256,K,C] gather even
    at C=3 (row-at-a-time), where the MXU tile gather is bandwidth-bound
    (~20 ms -> ~3 ms of the train step).  Backward: XLA lowers the gather
    transpose to a serial scatter-add that is ~7x slower than the
    transpose matmul at C=512.  Both are exact (hi/lo bf16 split,
    ~2^-16 relative).  ``pointops.group_points`` routes here on TPU.
    """
    b, s, k = idx.shape
    flat = mxu_gather_rows(points, idx.reshape(b, s * k), interpret)
    return flat.reshape(b, s, k, points.shape[2])


def _mxu_group_fwd(points, idx, interpret):
    # zero-size residual carries the primal dtype (dtypes themselves are
    # not JAX types)
    return (mxu_group_points(points, idx, interpret),
            (points.shape[1], jnp.zeros((0,), points.dtype), idx))


def _mxu_group_bwd(interpret, res, g):
    n, proto, idx = res
    return _mxu_gather_bwd(n, idx, g, interpret).astype(proto.dtype), None


mxu_group_points.defvjp(_mxu_group_fwd, _mxu_group_bwd)


def _hilo_pack(z: Array) -> Array:
    """Lane-pack a f32 array as ``[hi | lo]`` bf16 halves (exact to
    ~2^-16 relative): ONE one-hot MXU gather pass fetches both, and
    :func:`_hilo_fold_mat` recombines them after the gather."""
    hi = z.astype(jnp.bfloat16)
    lo = (z - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([hi, lo], axis=-1)


def _hilo_fold_mat(m: int) -> Array:
    """``[2m, m]`` constant with ``zg @ fold == zg[:, :m] + zg[:, m:]``
    — recombines a hi/lo lane-packed gather output without lane slices
    (8-lane slices are not Mosaic-friendly; the matmul is ~free)."""
    r = lax.broadcasted_iota(jnp.int32, (2 * m, m), 0)
    c = lax.broadcasted_iota(jnp.int32, (2 * m, m), 1)
    return ((r % m) == c).astype(jnp.float32)


def _cv_kernel(f1c_ref, f2c_ref, idx_ref, zpk2_ref, z1_ref,
               b0_ref, w1_ref, b1_ref, w2_ref, b2_ref,
               wnb0_ref, wn1_ref, wnb1_ref, wn2_ref, wnb2_ref,
               out_ref, *, nsample):
    """Fused point-to-patch cost volume (FeatureCorrelator first half,
    radarflow_util.py:185-214) with the offset math FOLDED (round 4):

      dense first layer:  ``f1 + gather(f2) + d_k@wd`` ==
        ``f1c + gather(f2c)`` where ``f1c = f1 - xyz1c@wd`` and
        ``f2c = f2 + xyz2c@wd`` are built outside the kernel (the same
        identity PLF uses; exact because gather is selection).
      WeightNet first layer:  ``d_k@wn0 == gather(xyz2c@wn0) - xyz1c@wn0``
        — the projection is gathered as ONE hi/lo lane-packed ``[N,16]``
        operand (``zpk2``), one 128-lane MXU pass per k instead of the
        two xyz hi/lo passes, and the in-kernel ``[.,3]@[3,8]`` /
        ``[.,3]@[3,C]`` dots disappear.

    Per neighbor k — one-hot gather of the folded frame-2 features,
    LeakyReLU(0.1) dense chain, WeightNet from the folded offset
    projection, weighted accumulation.  All in VMEM."""
    n2 = f2c_ref.shape[1]
    t = idx_ref.shape[3]
    c = f1c_ref.shape[2]

    # U neighbors per iteration (lane-concatenated one-hots, see
    # _plf_kernel): gathers + dense chain + WeightNet run on [U*T] rows
    u = max(d for d in (8, 4, 2, 1) if nsample % d == 0)
    rows = lax.broadcasted_iota(jnp.int32, (n2, u * t), dimension=0)
    dim0 = (((0,), (0,)), ((), ()))  # contract leading dims: a^T @ b
    z1_1 = z1_ref[0].astype(jnp.float32)  # [T, 8]
    z1 = jnp.concatenate([z1_1] * u, axis=0)  # [U*T, 8]
    f1c = jnp.concatenate([f1c_ref[0].astype(jnp.float32)] * u, axis=0)
    f2 = f2c_ref[0]
    if f2.dtype == jnp.bfloat16:
        f2_hi, f2_lo = f2, None
    else:
        f2_hi = f2.astype(jnp.bfloat16)
        f2_lo = (f2 - f2_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    zpk = zpk2_ref[0]  # [N2, 16] bf16: [z2_hi | z2_lo]
    fold = _hilo_fold_mat(z1.shape[1])
    w1 = w1_ref[:]
    w2 = w2_ref[:]

    def body(kg, acc):
        idx_cat = jnp.concatenate(
            [idx_ref[0, kg * u + uu] for uu in range(u)], axis=1)  # [1,U*T]
        oh_t = (rows == idx_cat).astype(jnp.bfloat16)  # [N2, U*T]
        g = lax.dot_general(oh_t, f2_hi, dim0,
                            preferred_element_type=jnp.float32)
        if f2_lo is not None:
            g = g + lax.dot_general(oh_t, f2_lo, dim0,
                                    preferred_element_type=jnp.float32)
        x = f1c + g + b0_ref[:]
        x = jnp.where(x > 0, x, 0.1 * x)
        x = jnp.dot(x.astype(w1.dtype), w1,
                    preferred_element_type=jnp.float32) + b1_ref[:]
        x = jnp.where(x > 0, x, 0.1 * x)
        x = jnp.dot(x.astype(w2.dtype), w2,
                    preferred_element_type=jnp.float32) + b2_ref[:]
        x = jnp.where(x > 0, x, 0.1 * x)

        # WeightNet(3 -> 8 -> 8 -> C), ReLU (radarflow_util.py:287-318)
        zg = lax.dot_general(oh_t, zpk, dim0,
                             preferred_element_type=jnp.float32)
        w = jnp.maximum(jnp.dot(zg, fold,
                                preferred_element_type=jnp.float32)
                        - z1 + wnb0_ref[:], 0.0)
        w = jnp.maximum(jnp.dot(w, wn1_ref[:],
                                preferred_element_type=jnp.float32)
                        + wnb1_ref[:], 0.0)
        w = jnp.maximum(jnp.dot(w, wn2_ref[:],
                                preferred_element_type=jnp.float32)
                        + wnb2_ref[:], 0.0)
        wx = w * x
        part = wx[0:t]
        for uu in range(1, u):
            part = part + wx[uu * t:(uu + 1) * t]
        return acc + part

    init = jnp.zeros((t, c), jnp.float32)
    out_ref[0] = lax.fori_loop(0, nsample // u, body,
                               init).astype(out_ref.dtype)


def _cv_agg_kernel(p2p_ref, idx_ref, zpk1_ref, z1t_ref,
                   wnb0_ref, wn1_ref, wnb1_ref, wn2_ref, wnb2_ref,
                   out_ref, *, nsample):
    """Fused patch-to-patch aggregation (FeatureCorrelator second half,
    radarflow_util.py:216-237): gather the point-to-patch costs over
    frame-1 neighborhoods and WeightNet-weighted-sum them.  The offset
    WeightNet input is folded like :func:`_cv_kernel`'s:
    ``d_k@wn0 == gather(xyz1c@wn0) - xyz1c@wn0`` via the hi/lo
    lane-packed ``zpk1`` (one gather pass instead of two)."""
    n = p2p_ref.shape[1]
    t = idx_ref.shape[3]
    c = p2p_ref.shape[2]

    u = max(d for d in (8, 4, 2, 1) if nsample % d == 0)
    rows = lax.broadcasted_iota(jnp.int32, (n, u * t), dimension=0)
    dim0 = (((0,), (0,)), ((), ()))
    z1t = jnp.concatenate([z1t_ref[0].astype(jnp.float32)] * u, axis=0)
    zpk = zpk1_ref[0]  # [N, 16] bf16: [z1_hi | z1_lo]
    fold = _hilo_fold_mat(z1t.shape[1])
    p2p = p2p_ref[0]
    if p2p.dtype == jnp.bfloat16:
        hi, lo = p2p, None
    else:
        hi = p2p.astype(jnp.bfloat16)
        lo = (p2p - hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def body(kg, acc):
        idx_cat = jnp.concatenate(
            [idx_ref[0, kg * u + uu] for uu in range(u)], axis=1)  # [1,U*T]
        oh_t = (rows == idx_cat).astype(jnp.bfloat16)
        g = lax.dot_general(oh_t, hi, dim0,
                            preferred_element_type=jnp.float32)
        if lo is not None:
            g = g + lax.dot_general(oh_t, lo, dim0,
                                    preferred_element_type=jnp.float32)
        zg = lax.dot_general(oh_t, zpk, dim0,
                             preferred_element_type=jnp.float32)
        w = jnp.maximum(jnp.dot(zg, fold,
                                preferred_element_type=jnp.float32)
                        - z1t + wnb0_ref[:], 0.0)
        w = jnp.maximum(jnp.dot(w, wn1_ref[:],
                                preferred_element_type=jnp.float32)
                        + wnb1_ref[:], 0.0)
        w = jnp.maximum(jnp.dot(w, wn2_ref[:],
                                preferred_element_type=jnp.float32)
                        + wnb2_ref[:], 0.0)
        wg = w * g
        part = wg[0:t]
        for uu in range(1, u):
            part = part + wg[uu * t:(uu + 1) * t]
        return acc + part

    init = jnp.zeros((t, c), jnp.float32)
    out_ref[0] = lax.fori_loop(0, nsample // u, body, init)


def _km_idx(idx: Array) -> Array:
    """k-major, rows-in-lanes index layout for the kernels' K loop (the
    tiny trailing dim sits in sublanes — a trailing-lane layout pads it to
    128 lanes and wastes VMEM)."""
    return jnp.swapaxes(idx, 1, 2)[:, :, None, :]


@functools.partial(jax.jit, static_argnums=(6,))
def fused_cost_volume(
    f1t: Array,
    f2t: Array,
    idx2: Array,
    xyz1: Array,
    idx1: Array,
    xyz2: Array,
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
      idx2: frame-2 k-NN indices ``[B, N, K]``.
      idx1: frame-1 (self) k-NN indices ``[B, N, K]``.
      xyz1 / xyz2: ``[B, N, 3]`` coordinates (their dense/WeightNet
        projections are folded OUTSIDE the kernels — see _cv_kernel).
      dense: ``(wd, b0, w1, b1, w2, b2)`` — offset part of the factored
        first correlation layer + the two LeakyReLU dense layers.
      wn1 / wn2: WeightNet params ``(w0, b0, w1, b1, w2, b2)`` each.

    Returns:
      ``[B, N, C]`` aggregated cost volume.
    """
    b, n, c = f1t.shape
    k = idx2.shape[2]

    # Round-4 offset folding (see _cv_kernel docstring).  A COMMON
    # per-pair center keeps d_k = xyz2[idx] - xyz1 shift-invariant (the
    # fold is exact under any shared shift) while keeping the folded
    # terms' bf16/hi-lo rounding at scene-extent scale instead of
    # ego-position scale (CLAUDE.md round-2 centering finding).
    ctr = jnp.mean(xyz1.astype(jnp.float32), axis=1, keepdims=True)
    x1c = xyz1.astype(jnp.float32) - ctr
    x2c = xyz2.astype(jnp.float32) - ctr
    wd32 = dense[0].astype(jnp.float32)
    f1c = (f1t.astype(jnp.float32) - x1c @ wd32).astype(f1t.dtype)
    f2c = (f2t.astype(jnp.float32) + x2c @ wd32).astype(f2t.dtype)
    z1a = x1c @ wn1[0]             # [B,N,8] stage-1 subtract term
    zpk2 = _hilo_pack(x2c @ wn1[0])  # [B,N,16] bf16 gather operand
    zq = x1c @ wn2[0]              # stage-2: gathered AND subtracted
    zpk1 = _hilo_pack(zq)

    idx2_km = _km_idx(idx2)
    idx1_km = _km_idx(idx1)

    # row-tile the queries (like _plf_kernel): with the unrolled k loop the
    # [U*T, C] chain intermediates at full N=384+ blow the 16 MB VMEM stack
    tile = n if n <= 128 else 128
    assert n % tile == 0, (n, tile)
    grid = (b, n // tile)

    def specs(shapes):
        out = []
        for nd in shapes:
            out.append(pl.BlockSpec(
                nd, (lambda bi, ti, _n=len(nd): (0,) * _n),
                memory_space=pltpu.VMEM))
        return out

    full3 = pl.BlockSpec((1, n, c), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM)
    tile3 = pl.BlockSpec((1, tile, c), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM)
    zpk_full = pl.BlockSpec((1, n, 16), lambda bi, ti: (bi, 0, 0),
                            memory_space=pltpu.VMEM)
    z_tile = pl.BlockSpec((1, tile, 8), lambda bi, ti: (bi, ti, 0),
                          memory_space=pltpu.VMEM)
    idx_spec = pl.BlockSpec((1, k, 1, tile), lambda bi, ti: (bi, 0, 0, ti),
                            memory_space=pltpu.VMEM)

    # bf16 serving keeps the point-to-patch intermediate in bf16 so the
    # aggregation gather is a single MXU pass too
    p2p_dtype = (jnp.bfloat16 if f2t.dtype == jnp.bfloat16
                 else jnp.float32)
    p2p = pl.pallas_call(
        functools.partial(_cv_kernel, nsample=k),
        out_shape=jax.ShapeDtypeStruct((b, n, c), p2p_dtype),
        grid=grid,
        in_specs=[tile3, full3, idx_spec, zpk_full, z_tile]
        + specs([p.shape for p in dense[1:]])
        + specs([p.shape for p in wn1[1:]]),
        out_specs=tile3,
        interpret=interpret,
    )(f1c, f2c, idx2_km, zpk2, z1a, *dense[1:], *wn1[1:])

    return pl.pallas_call(
        functools.partial(_cv_agg_kernel, nsample=k),
        out_shape=jax.ShapeDtypeStruct((b, n, c), jnp.float32),
        grid=grid,
        in_specs=[full3, idx_spec, zpk_full, z_tile]
        + specs([p.shape for p in wn2[1:]]),
        out_specs=tile3,
        interpret=interpret,
    )(p2p, idx1_km, zpk1, zq, *wn2[1:])


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
