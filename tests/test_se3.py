"""Tests for weighted Kabsch and SE(3) utilities (vs. reference math)."""

import numpy as np
from scipy.spatial.transform import Rotation

import jax.numpy as jnp

from cmflow_tpu import geometry


def random_rigid(rng, scale=1.0):
    r = Rotation.from_rotvec(rng.randn(3) * scale).as_matrix()
    t = rng.randn(3) * scale
    trans = np.eye(4)
    trans[:3, :3] = r
    trans[:3, 3] = t
    return trans.astype(np.float32)


def np_reference_kabsch(a, b, w, centroid):
    """Reference torch math re-expressed in numpy (models/cmflow.py:128-169,
    models/raflow.py:116-155), including the row-flip reflection branch."""
    bsz, n, _ = a.shape
    if centroid == "mean_n":
        wn = w / n
    elif centroid == "sum":
        wn = w
    else:
        raise ValueError(centroid)
    ca = np.einsum("bn,bnc->bc", wn, a)
    cb = np.einsum("bn,bnc->bc", wn, b)
    am = a - ca[:, None]
    bm = b - cb[:, None]
    h = np.einsum("bnc,bn,bnd->bcd", am, w, bm)
    out = np.zeros((bsz, 4, 4))
    for i in range(bsz):
        u, _, vt = np.linalg.svd(h[i])
        v = vt.T
        z = v @ u.T
        if np.linalg.det(z) < 0:
            v = v.copy()
            v[2, :] *= -1
        r = v @ u.T
        t = -r @ ca[i] + cb[i]
        out[i, :3, :3] = r
        out[i, :3, 3] = t
        out[i, 3, 3] = 1
    return out


class TestWeightedKabsch:
    def test_recovers_exact_transform(self, rng):
        for _ in range(5):
            trans = random_rigid(rng)
            a = rng.randn(1, 64, 3).astype(np.float32)
            b = a @ trans[:3, :3].T + trans[:3, 3]
            got = np.asarray(
                geometry.weighted_kabsch(jnp.array(a), jnp.array(b))
            )
            np.testing.assert_allclose(got[0], trans, atol=1e-4)

    def test_weighted_ignores_outliers(self, rng):
        trans = random_rigid(rng)
        a = rng.randn(1, 64, 3).astype(np.float32)
        b = a @ trans[:3, :3].T + trans[:3, 3]
        # corrupt half the points; weight them to zero
        b_noisy = b.copy()
        b_noisy[:, 32:] += rng.randn(1, 32, 3) * 5
        w = np.ones((1, 64), np.float32)
        w[:, 32:] = 0
        got = np.asarray(
            geometry.weighted_kabsch(jnp.array(a), jnp.array(b_noisy),
                                     jnp.array(w))
        )
        np.testing.assert_allclose(got[0], trans, atol=1e-4)

    def test_matches_reference_math_sum_mode(self, rng):
        # normalized weights, centroid='sum' = CMFlow's WeightedKabsch
        a = rng.randn(3, 32, 3).astype(np.float32)
        b = (a + rng.randn(3, 32, 3) * 0.1).astype(np.float32)
        w = rng.rand(3, 32).astype(np.float32) + 1e-4
        w = w / w.sum(1, keepdims=True)
        got = np.asarray(
            geometry.weighted_kabsch(jnp.array(a), jnp.array(b), jnp.array(w),
                                     centroid="sum")
        )
        want = np_reference_kabsch(a, b, w, "sum")
        np.testing.assert_allclose(got, want, atol=1e-3)

    def test_matches_reference_math_mean_n_mode(self, rng):
        # 0/1 mask, centroid='mean_n' = RaFlow's rigid_transform_torch
        a = rng.randn(2, 40, 3).astype(np.float32)
        b = (a + rng.randn(2, 40, 3) * 0.05).astype(np.float32)
        w = (rng.rand(2, 40) > 0.3).astype(np.float32)
        got = np.asarray(
            geometry.weighted_kabsch(jnp.array(a), jnp.array(b), jnp.array(w),
                                     centroid="mean_n")
        )
        want = np_reference_kabsch(a, b, w, "mean_n")
        np.testing.assert_allclose(got, want, atol=1e-3)

    def test_reflection_case_det_positive(self, rng):
        # degenerate planar points can trigger det<0; result must still be a
        # proper rotation
        a = rng.randn(1, 16, 3).astype(np.float32)
        a[:, :, 2] = 0  # planar
        b = -a  # mirror-ish correspondence
        got = np.asarray(geometry.weighted_kabsch(jnp.array(a), jnp.array(b)))
        det = np.linalg.det(got[0, :3, :3])
        np.testing.assert_allclose(det, 1.0, atol=1e-4)

    def test_polar3_matches_svd_polar_factor(self, rng):
        from cmflow_tpu.geometry.se3 import polar3

        hs = []
        for i in range(64):
            u = np.linalg.qr(rng.randn(3, 3))[0]
            v = np.linalg.qr(rng.randn(3, 3))[0]
            s = 10.0 ** rng.uniform(-1.5, 1.5, 3)  # condition up to ~1e3
            if i % 2:
                u = -u  # det(h) < 0 cases
            hs.append(u @ np.diag(s) @ v.T)
        h = jnp.asarray(np.stack(hs), jnp.float32)
        w = np.asarray(polar3(h), np.float64)
        # orthogonal to f32 roundoff
        eye_err = np.abs(np.swapaxes(w, -1, -2) @ w - np.eye(3)).max()
        assert eye_err < 1e-5
        u2, _, vh2 = np.linalg.svd(np.asarray(h, np.float64))
        np.testing.assert_allclose(w, u2 @ vh2, atol=1e-4)

    def test_polar_solver_matches_svd_solver(self, rng):
        a = rng.randn(8, 64, 3).astype(np.float32) * 5
        r0 = np.linalg.qr(rng.randn(3, 3))[0]
        b = (a @ r0.T + rng.randn(8, 64, 3) * 0.1 + [1.0, 2.0, 3.0]
             ).astype(np.float32)
        w = rng.rand(8, 64).astype(np.float32)
        for centroid in ("norm", "mean_n", "sum"):
            wn = w / w.sum(1, keepdims=True) if centroid == "sum" else w
            ref = geometry.weighted_kabsch(
                jnp.array(a), jnp.array(b), jnp.array(wn),
                centroid=centroid, reflect="row")
            got = geometry.weighted_kabsch(
                jnp.array(a), jnp.array(b), jnp.array(wn),
                centroid=centroid, reflect="row", solver="polar")
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=2e-5, err_msg=centroid)
        # reflection branch: mirrored target flips det(H) negative
        b_ref = (a @ (np.diag([1.0, 1.0, -1.0]) @ r0).T).astype(np.float32)
        ref = geometry.weighted_kabsch(jnp.array(a), jnp.array(b_ref),
                                       jnp.array(w), reflect="row")
        got = geometry.weighted_kabsch(jnp.array(a), jnp.array(b_ref),
                                       jnp.array(w), reflect="row",
                                       solver="polar")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5)
        # degenerate H stays finite (padding lanes etc.)
        z = jnp.zeros((2, 8, 3))
        t = geometry.weighted_kabsch(z, z, None, solver="polar")
        assert bool(jnp.isfinite(t).all())


class TestSE3Utils:
    def test_rigid_to_flow(self, rng):
        trans = random_rigid(rng)[None]
        pc = rng.randn(1, 32, 3).astype(np.float32)
        flow = np.asarray(geometry.rigid_to_flow(jnp.array(pc), jnp.array(trans)))
        want = pc @ trans[0, :3, :3].T + trans[0, :3, 3] - pc
        np.testing.assert_allclose(flow, want, atol=1e-5)

    def test_se3_inverse(self, rng):
        trans = np.stack([random_rigid(rng) for _ in range(4)])
        inv = np.asarray(geometry.se3_inverse(jnp.array(trans)))
        prod = np.einsum("bij,bjk->bik", trans, inv)
        np.testing.assert_allclose(prod, np.tile(np.eye(4), (4, 1, 1)),
                                   atol=1e-5)

    def test_kde_density_matches_reference_formula(self, rng):
        x1 = rng.randn(1, 16, 3).astype(np.float32)
        x2 = rng.randn(1, 24, 3).astype(np.float32)
        got = np.asarray(geometry.kde_density(jnp.array(x1), jnp.array(x2), 1.0))
        d = (
            np.sum(x1**2, -1)[:, :, None]
            + np.sum(x2**2, -1)[:, None, :]
            - 2 * np.einsum("bnc,bmc->bnm", x1, x2)
        )
        want = (np.exp(-np.maximum(d, 0) / 2.0) / 2.5).mean(-1)
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestCamera:
    def test_point_on_ray_has_zero_distance(self, rng):
        proj = np.array(
            [[1495.47, 0.0, 961.27, 0.0],
             [0.0, 1495.47, 624.90, 0.0],
             [0.0, 0.0, 1.0, 0.0]], np.float32
        )
        t_cr = np.eye(4, dtype=np.float32)
        # points in front of the camera
        pts = np.abs(rng.randn(1, 8, 3)).astype(np.float32) + np.array(
            [0, 0, 5], np.float32
        )
        uv = geometry.project_radar_to_image(
            jnp.array(pts), jnp.array(proj), jnp.array(t_cr)
        )
        d = np.asarray(
            geometry.point_ray_distance(jnp.array(pts), uv, jnp.array(proj),
                                        jnp.array(t_cr))
        )
        np.testing.assert_allclose(d, 0.0, atol=1e-2)


class TestGradientSafety:
    """NaN-free gradients through branches a jnp.where later discards.

    The reference skips degenerate Kabsch fits in python (raflow.py:99-113);
    we compute them batched, so their *gradients* must stay finite even for
    zero/degenerate weight sets (0 * inf = nan would poison the whole step).
    """

    def test_kabsch_grad_finite_for_degenerate_weights(self, rng):
        import jax

        a = jnp.array(rng.randn(1, 32, 3).astype(np.float32))
        b = jnp.array(rng.randn(1, 32, 3).astype(np.float32))
        for n_in in [0, 1, 2, 32]:
            w = jnp.zeros((1, 32)).at[0, :n_in].set(1.0)

            def loss(bb):
                t = geometry.weighted_kabsch(
                    a, bb, w, centroid="mean_n", reflect="row",
                    n_override=jnp.array([32.0]),
                )
                return jnp.sum(t)

            g = jax.grad(loss)(b)
            assert bool(jnp.isfinite(g).all()), f"NaN grad at n_in={n_in}"

    def test_kabsch_grad_finite_identical_clouds(self, rng):
        import jax

        a = jnp.array(rng.randn(2, 16, 3).astype(np.float32))

        def loss(bb):
            return jnp.sum(geometry.weighted_kabsch(a, bb, centroid="norm"))

        g = jax.grad(loss)(a)  # b == a: tied singular values
        assert bool(jnp.isfinite(g).all())

    def test_svd3_jvp_matches_builtin_when_well_conditioned(self, rng):
        import jax

        h = jnp.array(rng.randn(4, 3, 3).astype(np.float32))
        dh = jnp.array(rng.randn(4, 3, 3).astype(np.float32))
        _, tan_safe = jax.jvp(geometry.se3._svd3, (h,), (dh,))
        _, tan_ref = jax.jvp(jnp.linalg.svd, (h,), (dh,))
        for ts, tr in zip(tan_safe, tan_ref):
            np.testing.assert_allclose(np.asarray(ts), np.asarray(tr),
                                       atol=1e-4)

    def test_loss_norms_zero_subgradient(self, rng):
        import jax

        from cmflow_tpu.losses import radar_loss as rl

        # duplicated points -> identical flows in the k-NN set -> exact-zero
        # diffs inside the smoothness norm
        base = rng.randn(1, 8, 3).astype(np.float32)
        pc1 = jnp.array(np.concatenate([base, base], axis=1))
        flow = jnp.array(rng.randn(1, 16, 3).astype(np.float32))
        flow = flow.at[0, 8:].set(flow[0, :8])

        g = jax.grad(lambda f: rl.spatial_smoothness_loss(pc1, f))(flow)
        assert bool(jnp.isfinite(g).all())

        # dynamic flow loss with gt == pred on a moving point
        gt = flow
        dyn = jnp.zeros((1, 16))
        g2 = jax.grad(lambda f: rl.dynamic_flow_loss(f, gt, dyn))(flow)
        assert bool(jnp.isfinite(g2).all())
