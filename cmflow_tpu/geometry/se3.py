"""SE(3) geometry: batched (weighted) Kabsch, rigid flow, transforms.

TPU-native equivalents of the reference's three Kabsch variants:

  * ``utils/util.py:62-98``   — unweighted, reflection correction disabled.
  * ``models/raflow.py:116-155`` — 0/1-mask weighted, centroids are
    ``mean(A * W)`` over **all** N (i.e. ``sum(A*W)/N``), reflection
    corrected by negating the third **row** of V.
  * ``models/cmflow.py:128-169`` — weights already normalized to sum 1,
    centroids are ``sum(A * W)``, same row-negation correction.

All of that is expressed here as one function, fully batched and jittable —
no per-batch python loops (the reference loops over the batch in
``SFR_module`` and ``refine_with_transform``).

Note on the reflection fix: the textbook Kabsch correction negates the last
*column* of V (as the reference's own numpy ``rigid_transform_3D`` does at
utils/util.py:136-139), while the reference's torch path negates the last
*row*.  Both restore det(R) = +1; we default to reference-exact ``"row"``
for parity and offer ``"col"`` (textbook) and ``"none"``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


@jax.custom_jvp
def _svd3(h: Array):
    """Batched 3x3 SVD with a *regularized* differentiation rule.

    ``jnp.linalg.svd``'s gradient contains ``1/(s_j^2 - s_i^2)`` terms that
    produce inf/nan for (near-)degenerate singular values.  Kabsch here is
    often evaluated on branches that a later ``jnp.where`` discards (e.g.
    RaFlow's conditional inlier re-fit, raflow.py:99-113 — the reference
    skips the computation in python, we compute it batched), and a nan in
    the discarded branch still poisons the whole gradient (0 * inf = nan).

    This custom JVP is the standard SVD differential (Townsend 2016) with
    the resolvent ``F_ij = 1/(s_j^2 - s_i^2)`` replaced by the Tikhonov-
    regularized ``d / (d^2 + eps)`` — exact when singular values are well
    separated, smoothly clamped to finite values when they collide.
    """
    return jnp.linalg.svd(h)


@_svd3.defjvp
def _svd3_jvp(primals, tangents):
    (h,) = primals
    (dh,) = tangents
    u, s, vh = jnp.linalg.svd(h)
    v = jnp.swapaxes(vh, -1, -2)
    ut = jnp.swapaxes(u, -1, -2)

    dp = ut @ dh @ v  # [..., 3, 3]
    ds = jnp.diagonal(dp, axis1=-2, axis2=-1)

    s2 = s * s
    d = s2[..., None, :] - s2[..., :, None]  # d[i,j] = s_j^2 - s_i^2
    smax2 = jnp.max(s2, axis=-1, keepdims=True)[..., None]
    # the additive floor keeps eps**2 > 0 in float32 (no subnormal underflow
    # even at H = 0, where d/(d*d+0) would be 0/0)
    eps = (1e-8 * smax2 + 1e-18) ** 2
    f = d / (d * d + eps)

    dpt = jnp.swapaxes(dp, -1, -2)
    du = u @ (f * (dp * s[..., None, :] + s[..., :, None] * dpt))
    dv = v @ (f * (s[..., :, None] * dp + dpt * s[..., None, :]))
    dvh = jnp.swapaxes(dv, -1, -2)
    return (u, s, vh), (du, ds, dvh)


def _cof3(x: Array) -> Array:
    """Cofactor matrix of batched 3x3 ``x`` (so ``x^{-T} = cof / det``)."""
    a, b, c = x[..., 0, 0], x[..., 0, 1], x[..., 0, 2]
    d, e, f = x[..., 1, 0], x[..., 1, 1], x[..., 1, 2]
    g, h, i = x[..., 2, 0], x[..., 2, 1], x[..., 2, 2]
    row0 = jnp.stack([e * i - f * h, f * g - d * i, d * h - e * g], -1)
    row1 = jnp.stack([c * h - b * i, a * i - c * g, b * g - a * h], -1)
    row2 = jnp.stack([b * f - c * e, c * d - a * f, a * e - b * d], -1)
    return jnp.stack([row0, row1, row2], -2)


def polar3(h: Array, iters: int = 9) -> Array:
    """Orthogonal polar factor ``W = U @ Vh`` of batched 3x3 ``h``
    (``h = U S Vh``), via determinant-scaled Newton iteration
    ``X <- (g X + g^-1 X^-T) / 2`` with ``g = |det X|^(-1/3)`` (Higham,
    Functions of Matrices §8.6).

    Pure elementwise math + tiny stacks — no eigh/qdwh custom calls, so a
    ``[B, 3, 3]`` batch costs microseconds on TPU where
    ``jnp.linalg.svd`` burns ~0.2-0.4 ms/step of the serving engine in
    sequential custom-call loops.  Converges to f32 roundoff in <=9
    iterations for condition numbers up to ~1e6; for exactly singular
    ``h`` the result is finite garbage (the rotation is ill-determined
    there under any algorithm).  Forward (serving) use only — gradients
    should go through the SVD path's regularized JVP.
    """
    normf = jnp.sqrt(jnp.sum(h * h, axis=(-2, -1), keepdims=True))
    x = h / jnp.maximum(normf, 1e-30)
    for _ in range(iters):
        cof = _cof3(x)
        det = jnp.sum(x[..., 0, :] * cof[..., 0, :], axis=-1)
        det_safe = jnp.where(jnp.abs(det) < 1e-30,
                             jnp.where(det < 0, -1e-30, 1e-30), det)
        gamma = jnp.abs(det_safe) ** (-1.0 / 3.0)
        gd = (gamma * det_safe)[..., None, None]
        x = 0.5 * (gamma[..., None, None] * x + cof / gd)
    return x


def weighted_kabsch(
    a: Array,
    b: Array,
    weights: Optional[Array] = None,
    *,
    centroid: str = "norm",
    reflect: str = "row",
    n_override: Optional[Array] = None,
    solver: str = "svd",
) -> Array:
    """Best-fit rigid transform T with ``b ≈ T @ a`` per batch element.

    Args:
      a: ``[B, N, 3]`` source points (channels-last).
      b: ``[B, N, 3]`` target points.
      weights: optional ``[B, N]`` nonnegative weights. ``None`` = uniform.
      centroid: how to form centroids from weights —
        ``"norm"``: normalize weights to sum 1 (the numerically sane choice;
          matches cmflow.py:96-110 where scores are pre-normalized);
        ``"mean_n"``: ``sum(x * w) / N`` exactly as raflow.py:126-127 (a 0/1
          mask divided by total N, not the inlier count);
        ``"sum"``: ``sum(x * w)`` with weights used as-is
          (cmflow.py:138-139 — caller must pre-normalize).
      reflect: ``"row"`` (reference-exact), ``"col"`` (textbook), ``"none"``
        (utils/util.py:87 disables the correction).
      n_override: optional ``[B]`` divisor replacing the static N in
        ``"mean_n"`` mode — used with padded point sets so the centroid
        divisor matches the *real* point count of each cloud (the reference
        always runs unpadded, dividing by its dynamic N).
      solver: ``"svd"`` (default; differentiable via the regularized JVP)
        or ``"polar"`` — Newton polar iteration (:func:`polar3`), exact
        for the ``"row"``/``"none"`` reflect modes because the reference's
        row-negation fix factors through the polar factor alone:
        ``R = diag(1,1,sign det H) @ (U Vh)^T``.  Serving-path use;
        ~0.3 ms/step cheaper than the TPU SVD custom calls.

    Returns:
      ``[B, 4, 4]`` homogeneous transforms.
    """
    bsz, n, _ = a.shape
    if weights is None:
        w = jnp.full((bsz, n), 1.0 / n, a.dtype)
    else:
        w = weights.astype(a.dtype)

    if centroid == "norm":
        wn = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-12)
    elif centroid == "mean_n":
        if n_override is not None:
            wn = w / jnp.maximum(n_override, 1.0)[:, None].astype(a.dtype)
        else:
            wn = w / n
    elif centroid == "sum":
        wn = w
    else:
        raise ValueError(f"unknown centroid mode {centroid!r}")

    centroid_a = jnp.einsum("bn,bnc->bc", wn, a)
    centroid_b = jnp.einsum("bn,bnc->bc", wn, b)

    am = a - centroid_a[:, None, :]
    bm = b - centroid_b[:, None, :]

    # H = Am^T diag(w) Bm  — 3x3, rides the MXU.
    h = jnp.einsum("bnc,bn,bnd->bcd", am, w, bm,
                   preferred_element_type=jnp.float32)

    if solver == "polar":
        # z = V U^T is the transpose of the polar factor W = U Vh, and
        # sign(det z) = sign(det H) (the singular values are >= 0), so
        # neither the reflection test nor the row fix needs U/V separately
        if reflect not in ("row", "none"):
            raise ValueError("solver='polar' supports reflect row|none")
        z = jnp.swapaxes(polar3(h), -1, -2)
        flip = jnp.where(jnp.linalg.det(h) < 0, -1.0, 1.0).astype(a.dtype)
        if reflect == "row":
            z = z.at[:, 2, :].multiply(flip[:, None])
        r = z
    elif solver == "svd":
        # jnp.linalg.svd returns (U, S, Vh) with H = U @ diag(S) @ Vh;
        # torch.svd returns V = Vh^T.
        u, _, vh = _svd3(h)
        v = jnp.swapaxes(vh, -1, -2)
        ut = jnp.swapaxes(u, -1, -2)

        z = v @ ut
        det = jnp.linalg.det(z)
        flip = jnp.where(det < 0, -1.0, 1.0).astype(a.dtype)

        if reflect == "row":
            # reference-exact: negate third row of V when det < 0
            v = v.at[:, 2, :].multiply(flip[:, None])
        elif reflect == "col":
            v = v.at[:, :, 2].multiply(flip[:, None])
        elif reflect != "none":
            raise ValueError(f"unknown reflect mode {reflect!r}")

        r = v @ ut
        if reflect in ("row", "none"):
            # Straight-through accuracy fix: XLA's TPU SVD solves these
            # 3x3s to only ~4e-3 rotation error at cond(H)~90 (measured,
            # scripts/diag_kabsch_tpu.py — the f64-truth delta reached
            # 8.7e-2 in the assembled transform via the ~21 m centroid
            # lever arm), while the Newton polar iteration is accurate to
            # ~2e-5 on every backend.  Take the VALUE from polar3 and keep
            # the gradient flowing through the regularized SVD JVP — both
            # express the same function R(H), so this is a numerical
            # correction, not a semantic change.  (reflect="col" composes
            # differently with the polar factor; it keeps the raw SVD.)
            rp = jnp.swapaxes(polar3(h), -1, -2)
            hflip = jnp.where(jnp.linalg.det(h) < 0, -1.0, 1.0)
            if reflect == "row":
                rp = rp.at[:, 2, :].multiply(
                    hflip.astype(a.dtype)[:, None])
            # on (near-)singular H the Newton iterate is finite garbage
            # (e.g. all-invalid padding lanes, H = 0) — keep the SVD value
            # unless the polar result is actually orthogonal
            orth_err = jnp.max(jnp.abs(
                jnp.swapaxes(rp, -1, -2) @ rp - jnp.eye(3, dtype=rp.dtype)
            ), axis=(-2, -1))
            rv = jnp.where((orth_err < 1e-2)[:, None, None], rp, r)
            r = r + jax.lax.stop_gradient(rv - r)
    else:
        raise ValueError(f"unknown solver {solver!r}")
    t = centroid_b - jnp.einsum("bij,bj->bi", r, centroid_a)
    return make_transform(r, t)


def make_transform(r: Array, t: Array) -> Array:
    """Assemble ``[B, 4, 4]`` from rotation ``[B, 3, 3]`` and translation
    ``[B, 3]``."""
    bsz = r.shape[0]
    top = jnp.concatenate([r, t[:, :, None]], axis=2)
    bottom = jnp.broadcast_to(
        jnp.array([[0.0, 0.0, 0.0, 1.0]], r.dtype), (bsz, 1, 4)
    )
    return jnp.concatenate([top, bottom], axis=1)


def rigid_to_flow(pc: Array, trans: Array) -> Array:
    """Scene flow induced by a rigid transform (utils/util.py:184-189).

    Args:
      pc: ``[B, N, 3]``.
      trans: ``[B, 4, 4]``.
    Returns:
      ``[B, N, 3]`` flow = T(pc) - pc.
    """
    moved = apply_transform(pc, trans)
    return moved - pc


def apply_transform(pc: Array, trans: Array) -> Array:
    """Apply homogeneous transform(s) to points: ``[B,N,3] x [B,4,4]``."""
    r = trans[:, :3, :3]
    t = trans[:, :3, 3]
    return jnp.einsum("bij,bnj->bni", r, pc) + t[:, None, :]


def se3_inverse(trans: Array) -> Array:
    """Batched inverse of rigid transforms ``[B, 4, 4]``."""
    r = trans[..., :3, :3]
    t = trans[..., :3, 3]
    r_inv = jnp.swapaxes(r, -1, -2)
    t_inv = -jnp.einsum("...ij,...j->...i", r_inv, t)
    return make_transform(
        r_inv.reshape(-1, 3, 3), t_inv.reshape(-1, 3)
    ).reshape(trans.shape)


def relative_se3(t1: Array, t2: Array) -> Array:
    """``t1^{-1} @ t2`` (utils/odometry_util.py:63-78), batched."""
    return se3_inverse(t1) @ t2


def quat2mat(quat: Array) -> Array:
    """Quaternion (x, y, z, w) to rotation matrix (utils/util.py:191-203)."""
    x, y, z, w = quat[:, 0], quat[:, 1], quat[:, 2], quat[:, 3]
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    rot = jnp.stack(
        [
            w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
            2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
            2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
        ],
        axis=1,
    )
    return rot.reshape(-1, 3, 3)


def get_matrix_from_ext(ext):
    """Sensor extrinsic (x, y, z, yaw, pitch, roll degrees) -> 4x4 transform
    (utils/util.py:225-243; host-side numpy, supports [6] and [N, 6])."""
    import numpy as np
    from scipy.spatial.transform import Rotation as R

    ext = np.asarray(ext)
    rot = R.from_euler("ZYX", ext[..., 3:], degrees=True).as_matrix()
    tr = np.zeros(ext.shape[:-1] + (4, 4))
    tr[..., :3, :3] = rot
    tr[..., :3, 3] = ext[..., :3]
    tr[..., 3, 3] = 1.0
    return tr


def kde_density(xyz1: Array, xyz2: Array, bandwidth: float = 1.0) -> Array:
    """Gaussian KDE point density (compute_density_loss, utils/util.py:172-182).

    Args:
      xyz1: ``[B, N, 3]`` query points.
      xyz2: ``[B, M, 3]`` reference points.
    Returns:
      ``[B, N]`` mean Gaussian density of each query point w.r.t. xyz2.
    """
    from cmflow_tpu.ops.pointops import square_distance

    sqrdists = square_distance(xyz1, xyz2)
    g = jnp.exp(-sqrdists / (2.0 * bandwidth * bandwidth)) / (2.5 * bandwidth)
    return jnp.mean(g, axis=-1)
