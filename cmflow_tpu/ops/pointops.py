"""Point-cloud primitive ops (TPU-native replacements for the reference's
CUDA extension ``pointnet2_cuda``).

The reference implements these as scatter/loop CUDA kernels
(``lib/src/*.cu``, bound in ``lib/pointnet2_utils.py``).  On TPU the point
counts are small and static (N=256 for training; padded buckets for eval),
so every neighborhood op here is formulated over a dense ``[B, N, M]``
distance matrix: one MXU matmul plus vectorized top-k/argmin — no scatter,
no dynamic shapes, autodiff for free.

All functions take channels-last ``[B, N, C]`` arrays and an optional
boolean ``valid`` mask marking real (non-padding) points; padded points are
excluded from every neighborhood.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


def _forced_xla(which: str) -> bool:
    """Diagnostic bisection knob: CMFLOW_FORCE_XLA_OPS is a comma list of
    op groups ("gather", "neighbors") forced onto the portable XLA
    fallbacks even on TPU.  Used to isolate kernel-path regressions in
    training runs; not a production switch."""
    return which in os.environ.get("CMFLOW_FORCE_XLA_OPS", "").split(",")

# A finite "infinity" for masked squared distances.  Large enough to push
# padded points past any real neighbor, small enough to avoid inf-inf NaNs.
_BIG = jnp.float32(1e10)


def square_distance(src: Array, dst: Array) -> Array:
    """Pairwise squared Euclidean distance, clamped at zero.

    Mirrors the reference ``square_distance``
    (utils/model_utils/radarflow_util.py:8-30), via the expanded quadratic.

    The cross term is a broadcast multiply-sum rather than a batched
    ``dot_general``: with a C=3 contraction the MXU is useless anyway
    (3/128 lanes) and the TPU backend lowers such dots through its
    SpatialMajorConvolution emitter, whose fusion cost model hard-crashes
    (SIGABRT, fusion_util.cc TransformWindow) when the surrounding ops
    fuse into it.  The broadcast form is pure VPU and fuses safely.

    Args:
      src: ``[B, N, C]``.
      dst: ``[B, M, C]``.
    Returns:
      ``[B, N, M]`` squared distances (>= 0).
    """
    cross = jnp.sum(src[:, :, None, :] * dst[:, None, :, :], axis=-1)
    d = (
        -2.0 * cross
        + jnp.sum(src * src, axis=-1, keepdims=True)
        + jnp.sum(dst * dst, axis=-1)[:, None, :]
    )
    return jnp.maximum(d, 0.0)


def masked_square_distance(
    src: Array, dst: Array, dst_valid: Optional[Array]
) -> Array:
    """``square_distance`` with invalid destination points pushed to +BIG."""
    d = square_distance(src, dst)
    if dst_valid is not None:
        d = jnp.where(dst_valid[:, None, :], d, _BIG)
    return d


def knn(
    k: int,
    query: Array,
    points: Array,
    points_valid: Optional[Array] = None,
) -> Array:
    """Indices of the k nearest ``points`` for each ``query`` point.

    Equivalent of ``knn_point`` (radarflow_util.py:88-99): top-k over the
    dense distance matrix, ascending distance order.

    Args:
      k: neighbors per query.
      query: ``[B, S, 3]``.
      points: ``[B, N, 3]``.
      points_valid: optional ``[B, N]`` bool mask.
    Returns:
      ``[B, S, k]`` int32 indices.
    """
    if jax.default_backend() == "tpu" and not _forced_xla("neighbors"):
        from cmflow_tpu.ops.neighbors import knn_pallas, pallas_ok

        if pallas_ok(points, query) and k <= 64:
            # sort-free Pallas kernel: identical results (top_k semantics,
            # ties to the lower index), ~3x faster than the [N] sort
            return knn_pallas(k, query, points,
                              points_valid=points_valid)
    return _knn_xla(k, query, points, points_valid)


def _knn_xla(
    k: int,
    query: Array,
    points: Array,
    points_valid: Optional[Array] = None,
) -> Array:
    """Portable XLA fallback of :func:`knn` (also the parity reference)."""
    d = masked_square_distance(query, points, points_valid)
    _, idx = lax.top_k(-d, k)
    return idx.astype(jnp.int32)


def knn_with_dists(
    k: int,
    query: Array,
    points: Array,
    points_valid: Optional[Array] = None,
) -> tuple[Array, Array]:
    """Like :func:`knn` but also returns the squared distances (ascending)."""
    d = masked_square_distance(query, points, points_valid)
    neg, idx = lax.top_k(-d, k)
    return -neg, idx.astype(jnp.int32)


def ball_query(
    radius: float,
    nsample: int,
    points: Array,
    query: Array,
    points_valid: Optional[Array] = None,
) -> Array:
    """Fixed-radius neighborhood indices with CUDA-exact padding semantics.

    Reproduces ``ball_query_kernel_fast`` (lib/src/ball_query_gpu.cu:9-45):
    for each query point, the first ``nsample`` point indices (in ascending
    index order) with squared distance strictly below ``radius**2``; slots
    past the last hit are padded with the *first* hit's index; queries with
    no hit at all return all-zero indices.

    Strategy: hits are marked on the dense distance matrix, then the
    ``nsample`` smallest hit *indices* are selected with ``top_k`` — index
    order equals the CUDA kernel's scan order, so the result is bit-exact.

    Args:
      radius: ball radius.
      nsample: max neighbors per ball.
      points: ``[B, N, 3]`` points searched over.
      query: ``[B, S, 3]`` ball centers.
      points_valid: optional ``[B, N]`` bool mask.
    Returns:
      ``[B, S, nsample]`` int32 indices into ``points``.
    """
    n = points.shape[1]
    if jax.default_backend() == "tpu" and not _forced_xla("neighbors"):
        from cmflow_tpu.ops.neighbors import ball_query_multi, pallas_ok

        if pallas_ok(points, query) and nsample <= n:
            # sort-free Pallas kernel (ops/neighbors.py): bit-identical
            # scan-order semantics without the [N] sort
            (idx,) = ball_query_multi((radius,), (nsample,), points, query,
                                      points_valid=points_valid)
            return idx
    return _ball_query_xla(radius, nsample, points, query, points_valid)


def _ball_query_xla(
    radius: float,
    nsample: int,
    points: Array,
    query: Array,
    points_valid: Optional[Array] = None,
) -> Array:
    """Portable XLA fallback of :func:`ball_query` (also the parity
    reference)."""
    n = points.shape[1]
    d = square_distance(query, points)
    hit = d < jnp.float32(radius) ** 2
    if points_valid is not None:
        hit = jnp.logical_and(hit, points_valid[:, None, :])
    j = lax.broadcasted_iota(jnp.int32, hit.shape, dimension=2)
    # Non-hits get sentinel index n, so the nsample smallest keys are the
    # first nsample hits in ascending index order.
    key = jnp.where(hit, j, n)
    k_eff = min(nsample, n)
    neg_sorted, _ = lax.top_k(-key, k_eff)
    idx = -neg_sorted  # ascending hit indices; sentinel n marks "no hit"
    if k_eff < nsample:  # more slots than points: extra slots become padding
        sentinel = jnp.full(idx.shape[:-1] + (nsample - k_eff,), n, idx.dtype)
        idx = jnp.concatenate([idx, sentinel], axis=-1)
    first = idx[..., :1]
    pad = jnp.where(first < n, first, 0)  # first hit, or 0 if no hits
    return jnp.where(idx < n, idx, pad).astype(jnp.int32)


def group_points(points: Array, idx: Array) -> Array:
    """Gather per-neighborhood features.

    Equivalent of ``grouping_operation`` (lib/pointnet2_utils.py:184-225,
    group_points_gpu.cu) — but channels-last and differentiable natively.

    On TPU, gathers route to the MXU one-hot implementation
    (:func:`cmflow_tpu.ops.fused.mxu_group_points`): XLA's gather emitter
    moves ~a row per cycle group (~3 ms for a [64,256,32,C] gather at any
    C) and lowers the gather transpose (the backward) to a serial
    scatter-add ~7x slower than the transpose matmul at C=512.

    Args:
      points: ``[B, N, C]``.
      idx: ``[B, S, K]`` int indices into N.
    Returns:
      ``[B, S, K, C]``.
    """
    n = points.shape[1]
    if (jax.default_backend() == "tpu" and n <= 512
            and points.dtype in (jnp.float32, jnp.bfloat16)
            and not _forced_xla("gather")):
        from cmflow_tpu.ops.fused import mxu_group_points

        return mxu_group_points(points, idx)
    return jax.vmap(lambda p, i: p[i])(points, idx)


def gather_points(points: Array, idx: Array) -> Array:
    """Gather points by flat index (gather_points_wrapper equivalent).

    Args:
      points: ``[B, N, C]``.
      idx: ``[B, S]`` int indices.
    Returns:
      ``[B, S, C]``.
    """
    return jax.vmap(lambda p, i: p[i])(points, idx)


def query_and_group(
    radius: float,
    nsample: int,
    xyz: Array,
    new_xyz: Array,
    features: Optional[Array] = None,
    xyz_valid: Optional[Array] = None,
) -> Array:
    """Ball query + relative-coordinate grouping (QueryAndGroup equivalent,
    lib/pointnet2_utils.py:259-292).

    Args:
      xyz: ``[B, N, 3]`` support points.
      new_xyz: ``[B, S, 3]`` centroids.
      features: optional ``[B, N, C]``.
      xyz_valid: optional ``[B, N]`` bool mask.
    Returns:
      ``[B, S, nsample, 3 + C]``: relative xyz, then grouped features.
    """
    idx = ball_query(radius, nsample, xyz, new_xyz, xyz_valid)
    grouped_xyz = group_points(xyz, idx) - new_xyz[:, :, None, :]
    if features is None:
        return grouped_xyz
    grouped_feat = group_points(features, idx)
    return jnp.concatenate([grouped_xyz, grouped_feat], axis=-1)


@functools.partial(jax.jit, static_argnums=(1,))
def farthest_point_sample(xyz: Array, npoint: int) -> Array:
    """Iterative farthest-point sampling (sampling_gpu.cu:94-253 equivalent).

    Deterministic variant seeded at index 0 (the CUDA kernel also starts at
    index 0).  Sequential over ``npoint`` via ``lax.fori_loop``; each step is
    a parallel distance update + argmax over N.

    Args:
      xyz: ``[B, N, 3]``.
      npoint: number of samples.
    Returns:
      ``[B, npoint]`` int32 indices.
    """
    b, n, _ = xyz.shape
    centroids0 = jnp.zeros((b, npoint), jnp.int32)
    dist0 = jnp.full((b, n), 1e10, jnp.float32)
    farthest0 = jnp.zeros((b,), jnp.int32)

    def body(i, carry):
        centroids, dist, farthest = carry
        centroids = centroids.at[:, i].set(farthest)
        centroid = jnp.take_along_axis(xyz, farthest[:, None, None], axis=1)
        d = jnp.sum((xyz - centroid) ** 2, axis=-1)
        dist = jnp.minimum(dist, d)
        farthest = jnp.argmax(dist, axis=-1).astype(jnp.int32)
        return centroids, dist, farthest

    centroids, _, _ = lax.fori_loop(0, npoint, body, (centroids0, dist0, farthest0))
    return centroids


def three_nn(query: Array, points: Array,
             points_valid: Optional[Array] = None) -> tuple[Array, Array]:
    """Three nearest neighbors + distances (interpolate_gpu.cu:80-118 equiv).

    Returns:
      (dists ``[B, S, 3]`` — Euclidean, ascending; idx ``[B, S, 3]`` int32).
    """
    d2, idx = knn_with_dists(3, query, points, points_valid)
    return jnp.sqrt(jnp.maximum(d2, 0.0)), idx


def three_interpolate(features: Array, idx: Array, weight: Array) -> Array:
    """Weighted 3-NN feature interpolation (interpolate_gpu.cu:120-180 equiv).

    Args:
      features: ``[B, N, C]``.
      idx: ``[B, S, 3]``.
      weight: ``[B, S, 3]``.
    Returns:
      ``[B, S, C]``.
    """
    grouped = group_points(features, idx)  # [B, S, 3, C]
    return jnp.sum(grouped * weight[..., None], axis=2)


def interpolation_weights(dists: Array, eps: float = 1e-8) -> Array:
    """Inverse-distance weights used with :func:`three_interpolate`."""
    recip = 1.0 / (dists + eps)
    return recip / jnp.sum(recip, axis=-1, keepdims=True)
