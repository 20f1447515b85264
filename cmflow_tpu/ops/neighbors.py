"""Pallas TPU neighborhood-search kernels (sort-free ball query / knn).

The XLA formulation of ``ball_query`` (ops/pointops.py:106-151, mirroring
lib/src/ball_query_gpu.cu:9-45) is exact but pays a full ``[N]`` sort per
(radius, cloud): profiled at 0.365 ms each on the serving forward, the 8
ball-query sorts + 2 knn top-k sorts are ~3.9 ms of a 19 ms step (20%).

Sort-free formulation (this module):

* ball query wants the first ``K`` indices *in scan order* within the
  radius.  With ``hit[j] = d2[j] < r^2``, the scan position of hit ``j``
  is ``cnt[j] = sum_{j' <= j} hit[j']`` — an inclusive prefix sum, which
  on TPU is ONE bf16 matmul against a triangular 0/1 matrix (exact:
  counts are small integers, accumulated in f32 on the MXU).  Slot ``k``
  then selects the unique ``j`` with ``hit[j] and cnt[j] == k+1`` via a
  masked lane reduce — no sort anywhere.
* knn (k smallest distances, ties to the lower index — ``lax.top_k`` on
  the negated matrix) is k rounds of (min-reduce, lowest-index argmin,
  knock out) on the VMEM-resident distance tile; k <= 8 in this model
  family, so the rounds are trivial VPU work.

Distances are computed in-kernel with the exact same f32 operation order
as :func:`cmflow_tpu.ops.pointops.square_distance` (per-coordinate VPU
broadcast multiply-add, no MXU rounding), so hit/rank decisions are
bit-identical to the XLA path and the results are parity-exact.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# matches pointops._BIG (a plain float: Pallas kernels cannot capture
# traced jnp constants)
_BIG = 1e10


def _tile_sqdist(q_ref, pT_ref, valid_ref):
    """``[T, N]`` squared distances with pointops.square_distance's exact
    f32 operation order: cross = (x*x' + y*y') + z*z'; d = (-2c + q2) + p2;
    max(d, 0).  ``valid_ref`` (``[1, 1, N]`` f32 0/1) pushes invalid
    points to +BIG *after* the clamp (masked_square_distance order)."""
    q = q_ref[0].astype(jnp.float32)      # [T, 3]
    pT = pT_ref[0].astype(jnp.float32)    # [3, N]
    qx, qy, qz = q[:, 0:1], q[:, 1:2], q[:, 2:3]          # [T, 1]
    px, py, pz = pT[0:1, :], pT[1:2, :], pT[2:3, :]       # [1, N]
    cross = (qx * px + qy * py) + qz * pz                 # [T, N]
    q2 = (qx * qx + qy * qy) + qz * qz                    # [T, 1]
    p2 = (px * px + py * py) + pz * pz                    # [1, N]
    d = jnp.maximum((-2.0 * cross + q2) + p2, 0.0)
    if valid_ref is not None:
        d = jnp.where(valid_ref[0] > 0, d, _BIG)
    return d


def _ball_kernel(q_ref, pT_ref, valid_ref, *out_refs, radii, nsamples):
    """One (batch, query-tile) step: ALL radii of one ball query.

    The prefix count ``cnt = hit @ L`` (L upper-triangular ones) runs on
    the MXU — hit and L are 0/1 (exact in bf16) and counts <= N
    accumulate exactly in f32.  Slot k's index is recovered with a masked
    lane reduce; empty slots repeat the first hit (ball_query_gpu.cu:34-43
    padding), or 0 when the ball is empty."""
    t = q_ref.shape[1]
    n = pT_ref.shape[2]

    d = _tile_sqdist(q_ref, pT_ref, valid_ref)

    # upper-triangular ones: L[j', j] = 1 iff j' <= j  (inclusive scan)
    tri = (lax.broadcasted_iota(jnp.int32, (n, n), 0)
           <= lax.broadcasted_iota(jnp.int32, (n, n), 1)
           ).astype(jnp.bfloat16)
    # Mosaic iota must be integer; cast after
    jlane = lax.broadcasted_iota(jnp.int32, (t, n), 1).astype(jnp.float32)

    for s, (r, k_s) in enumerate(zip(radii, nsamples)):
        hit = d < jnp.float32(r) ** 2
        hitb = hit.astype(jnp.bfloat16)
        cnt = jnp.dot(hitb, tri, preferred_element_type=jnp.float32)
        total = cnt[:, n - 1:n]                            # [T, 1]

        colk = lax.broadcasted_iota(jnp.int32, (t, k_s), 1).astype(jnp.float32)
        acc = jnp.zeros((t, k_s), jnp.float32)
        for k in range(k_s):
            sel = jnp.logical_and(hit, cnt == jnp.float32(k + 1))
            v = jnp.sum(jnp.where(sel, jlane, 0.0), axis=1, keepdims=True)
            acc = acc + v * (colk == k)
        first = acc[:, 0:1]                                # 0 if no hits
        idx = jnp.where(colk < total, acc, first)
        out_refs[s][0] = idx.astype(jnp.int32)


def _knn_kernel(q_ref, pT_ref, valid_ref, out_ref, *, nsample):
    """One (batch, query-tile) step of exact knn: ``nsample`` rounds of
    (lane min, lowest-index argmin, knock out) — ``lax.top_k(-d)``
    semantics (ascending distance, ties to the lower index)."""
    t = q_ref.shape[1]
    n = pT_ref.shape[2]

    d = _tile_sqdist(q_ref, pT_ref, valid_ref)
    # Mosaic iota must be integer; cast after
    jlane = lax.broadcasted_iota(jnp.int32, (t, n), 1).astype(jnp.float32)
    colk = lax.broadcasted_iota(jnp.int32, (t, nsample), 1).astype(jnp.float32)

    acc = jnp.zeros((t, nsample), jnp.float32)
    for k in range(nsample):
        m = jnp.min(d, axis=1, keepdims=True)              # [T, 1]
        idxk = jnp.min(jnp.where(d == m, jlane, jnp.float32(n)),
                       axis=1, keepdims=True)              # lowest tie
        acc = acc + idxk * (colk == k)
        d = jnp.where(jlane == idxk, _BIG * 2.0, d)
    out_ref[0] = acc.astype(jnp.int32)


def _prep(points: Array, query: Array, valid: Optional[Array]):
    """Shared operand prep: transposed cloud, f32 valid plane, tile size."""
    b, n, _ = points.shape
    s = query.shape[1]
    tile = s if s <= 128 else 128
    if s % tile:
        return None
    pT = jnp.swapaxes(points, 1, 2)                        # [B, 3, N]
    if valid is None:
        vplane = jnp.ones((b, 1, n), jnp.float32)
    else:
        vplane = valid.astype(jnp.float32)[:, None, :]
    return pT, vplane, tile


def _common_specs(n: int, tile: int):
    return [
        pl.BlockSpec((1, tile, 3), lambda bi, ti: (bi, ti, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3, n), lambda bi, ti: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, n), lambda bi, ti: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
    ]


@functools.partial(jax.jit, static_argnums=(0, 1, 4))
def ball_query_multi(
    radii: Tuple[float, ...],
    nsamples: Tuple[int, ...],
    points: Array,
    query: Array,
    interpret: bool = False,
    points_valid: Optional[Array] = None,
) -> Tuple[Array, ...]:
    """All radii of a multi-scale ball query in ONE Pallas kernel.

    Args:
      radii / nsamples: static per-scale (radius, K).
      points: ``[B, N, 3]`` searched cloud.
      query: ``[B, S, 3]`` ball centers.
      points_valid: optional ``[B, N]`` bool.
    Returns:
      tuple of ``[B, S, K_s]`` int32 indices, one per scale — identical to
      per-scale :func:`cmflow_tpu.ops.pointops.ball_query` results.
    """
    b, n, _ = points.shape
    s = query.shape[1]
    prep = _prep(points, query, points_valid)
    assert prep is not None, (s, "query count must tile by 128")
    pT, vplane, tile = prep

    out = pl.pallas_call(
        functools.partial(_ball_kernel, radii=tuple(radii),
                          nsamples=tuple(nsamples)),
        out_shape=tuple(jax.ShapeDtypeStruct((b, s, k), jnp.int32)
                        for k in nsamples),
        grid=(b, s // tile),
        in_specs=_common_specs(n, tile),
        out_specs=tuple(
            pl.BlockSpec((1, tile, k), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM)
            for k in nsamples),
        interpret=interpret,
    )(query, pT, vplane)
    return out


@functools.partial(jax.jit, static_argnums=(0, 3))
def knn_pallas(
    nsample: int,
    query: Array,
    points: Array,
    interpret: bool = False,
    points_valid: Optional[Array] = None,
) -> Array:
    """Exact knn indices via the sort-free Pallas kernel.

    Same results as ``lax.top_k(-masked_square_distance(...), k)``
    (ops/pointops.py:70-91): ascending squared distance, ties broken
    toward the lower index.
    """
    b, n, _ = points.shape
    s = query.shape[1]
    prep = _prep(points, query, points_valid)
    assert prep is not None, (s, "query count must tile by 128")
    pT, vplane, tile = prep

    return pl.pallas_call(
        functools.partial(_knn_kernel, nsample=nsample),
        out_shape=jax.ShapeDtypeStruct((b, s, nsample), jnp.int32),
        grid=(b, s // tile),
        in_specs=_common_specs(n, tile),
        out_specs=pl.BlockSpec((1, tile, nsample),
                               lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(query, pT, vplane)


def pallas_ok(points: Array, query: Array) -> bool:
    """Route guard: the kernels tile queries by 128 and keep the whole
    cloud in VMEM — fine for every model shape (N <= ~1k)."""
    s, n = query.shape[1], points.shape[1]
    return (points.dtype == jnp.float32 and query.dtype == jnp.float32
            and (s <= 128 or s % 128 == 0) and n <= 2048)
