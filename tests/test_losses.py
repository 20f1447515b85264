"""Loss-function tests against numpy oracles of the reference math."""

import numpy as np

import jax.numpy as jnp

from cmflow_tpu import losses
from cmflow_tpu.train import labels as labelgen


def np_softmax(x, axis):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def np_sqrdist(a, b):
    return np.maximum(
        np.sum(a**2, -1)[:, :, None] + np.sum(b**2, -1)[:, None, :]
        - 2 * np.einsum("bnc,bmc->bnm", a, b), 0)


class TestSoftChamfer:
    def test_zero_when_aligned_and_dense(self, rng):
        pc = rng.randn(1, 32, 3).astype(np.float32) * 0.5  # dense cluster
        loss = losses.soft_chamfer_loss(
            jnp.array(pc), jnp.array(pc), jnp.array(pc))
        # warp == pc2 => distances 0 => relu(0 - 0.01) = 0
        assert float(loss) == 0.0

    def test_matches_numpy_oracle(self, rng):
        pc1 = rng.randn(2, 24, 3).astype(np.float32)
        pc2 = rng.randn(2, 24, 3).astype(np.float32)
        warp = pc1 + rng.randn(2, 24, 3).astype(np.float32) * 0.3
        got = float(losses.soft_chamfer_loss(
            jnp.array(pc1), jnp.array(pc2), jnp.array(warp)))

        def dens(a, b):
            d = np_sqrdist(a, b)
            return (np.exp(-d / 2.0) / 2.5).mean(-1)

        m1 = (dens(pc1, pc2) > 0.005).astype(np.float32)
        m2 = (dens(pc2, pc1) > 0.005).astype(np.float32)
        dw = np_sqrdist(warp, pc2)
        d1 = np.maximum(dw.min(-1) - 0.01, 0) * m1
        d2 = np.maximum(dw.min(1) - 0.01, 0) * m2
        want = d1.mean() + d2.mean()
        np.testing.assert_allclose(got, want, rtol=1e-4)


class TestSmoothness:
    def test_zero_for_constant_flow(self, rng):
        pc1 = rng.randn(1, 32, 3).astype(np.float32)
        flow = np.tile(np.array([[1.0, 2.0, 3.0]], np.float32), (32, 1))[None]
        loss = float(losses.spatial_smoothness_loss(
            jnp.array(pc1), jnp.array(flow)))
        np.testing.assert_allclose(loss, 0.0, atol=1e-5)

    def test_matches_numpy_oracle(self, rng):
        b, n, k = 2, 24, 8
        pc1 = rng.randn(b, n, 3).astype(np.float32)
        flow = rng.randn(b, n, 3).astype(np.float32)
        got = float(losses.spatial_smoothness_loss(
            jnp.array(pc1), jnp.array(flow)))

        d = np_sqrdist(pc1, pc1)
        order = np.argsort(d, -1)[:, :, 1:k + 1]
        dists = np.take_along_axis(d, order, -1)
        w = np_softmax(np.exp(-dists / 0.5).reshape(b, n * k), 1).reshape(b, n, k)
        grouped = np.stack([flow[i][order[i]] for i in range(b)])
        diff = (n * w * np.linalg.norm(grouped - flow[:, :, None], axis=-1)).sum(-1)
        np.testing.assert_allclose(got, diff.mean(), rtol=1e-3)


class TestRadialDisplacement:
    def test_zero_for_consistent_flow(self, rng):
        pc1 = rng.randn(1, 16, 3).astype(np.float32) + 5
        # flow exactly along the radial direction with |f_r| = v_r * 0.1
        vel = rng.randn(1, 16).astype(np.float32)
        unit = pc1 / np.linalg.norm(pc1, axis=-1, keepdims=True)
        flow = unit * (vel[..., None] * 0.1)
        loss = float(losses.radial_displacement_loss(
            jnp.array(pc1), jnp.array(flow), jnp.array(vel)))
        np.testing.assert_allclose(loss, 0.0, atol=1e-6)


class TestEgoMotion:
    def test_zero_when_equal(self, rng):
        pc1 = rng.randn(2, 16, 3).astype(np.float32)
        t = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
        t[:, :3, 3] = rng.randn(2, 3)
        loss = float(losses.ego_motion_loss(
            jnp.array(pc1), jnp.array(t), jnp.array(t)))
        assert loss == 0.0

    def test_pure_translation_offset(self, rng):
        pc1 = rng.randn(2, 16, 3).astype(np.float32)
        t1 = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
        t2 = t1.copy()
        t2[:, :3, 3] += np.array([3.0, 0, 0], np.float32)
        loss = float(losses.ego_motion_loss(
            jnp.array(pc1), jnp.array(t1), jnp.array(t2)))
        np.testing.assert_allclose(loss, 3.0, rtol=1e-5)


class TestMotionSeg:
    def test_balanced_means(self, rng):
        p = rng.rand(2, 32).astype(np.float32) * 0.98 + 0.01
        y = (rng.rand(2, 32) > 0.7).astype(np.float32)
        got = float(losses.motion_seg_loss(jnp.array(p), jnp.array(y)))
        bce = -(y * np.log(p) + (1 - y) * np.log(1 - p))
        want = 0.5 * (bce[y == 0].mean() + bce[y == 1].mean())
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_single_class_no_nan(self):
        p = np.full((1, 8), 0.3, np.float32)
        y = np.zeros((1, 8), np.float32)
        got = float(losses.motion_seg_loss(jnp.array(p), jnp.array(y)))
        assert np.isfinite(got)


class TestDynamicFlow:
    def test_only_moving_points_count(self, rng):
        pred = rng.randn(1, 8, 3).astype(np.float32)
        gt = pred.copy()
        gt[0, :4] += 1.0  # error only on first 4 points
        dyn = np.ones((1, 8), np.float32)
        dyn[0, :4] = 0  # first 4 are moving
        got = float(losses.dynamic_flow_loss(
            jnp.array(pred), jnp.array(gt), jnp.array(dyn)))
        np.testing.assert_allclose(got, np.sqrt(3.0), rtol=1e-5)

    def test_all_static_is_zero(self, rng):
        pred = rng.randn(1, 8, 3).astype(np.float32)
        gt = pred + 1
        dyn = np.ones((1, 8), np.float32)
        got = float(losses.dynamic_flow_loss(
            jnp.array(pred), jnp.array(gt), jnp.array(dyn)))
        assert got == 0.0


class TestOpticalFlow:
    def test_zero_when_points_on_rays(self, rng):
        proj = np.array(
            [[1000.0, 0, 500, 0], [0, 1000.0, 300, 0], [0, 0, 1, 0]],
            np.float32)
        t_cr = np.eye(4, dtype=np.float32)
        pts = np.abs(rng.randn(1, 8, 3)).astype(np.float32) + [0, 0, 5]
        # pixels = exact projections; opt flow = 0
        uvz = np.einsum("ij,bnj->bni", proj,
                        np.concatenate([pts, np.ones((1, 8, 1))], -1))
        uv = uvz[..., :2] / uvz[..., 2:]
        mseg = np.zeros((1, 8), np.float32)  # all moving
        got = float(losses.optical_flow_loss(
            jnp.zeros((1, 8, 2)), jnp.array(uv[..., 0]), jnp.array(uv[..., 1]),
            jnp.array(pts), jnp.array(mseg), jnp.array(proj), jnp.array(t_cr)))
        np.testing.assert_allclose(got, 0.0, atol=1e-3)


class TestCompositeAndLabels:
    def test_raflow_composite(self, rng):
        pc1 = rng.randn(1, 24, 3).astype(np.float32)
        pc2 = rng.randn(1, 24, 3).astype(np.float32)
        f = rng.randn(1, 24, 3).astype(np.float32) * 0.1
        vel = rng.randn(1, 24).astype(np.float32)
        total, items = losses.radar_flow_loss(
            "raflow", jnp.array(pc1), jnp.array(pc2), jnp.array(f),
            jnp.array(vel))
        want = (items["chamferLoss"] + items["smoothnessLoss"]
                + items["veloLoss"])
        np.testing.assert_allclose(float(total), float(want), rtol=1e-5)

    def test_rrv_labels_detect_moving(self, rng):
        # static points: flow = rigid flow of trans => vel consistent
        n = 64
        pc1 = (rng.randn(1, n, 3) * 5 + [10, 0, 0]).astype(np.float32)
        trans = np.eye(4, dtype=np.float32)[None]
        trans[:, :3, 3] = [0.5, 0, 0]  # ego translation
        interval = np.full((1,), 0.1, np.float32)
        # radial velocity consistent with rigid flow for static points
        rigid_flow = trans[:, None, :3, 3] + 0 * pc1
        unit = pc1 / np.linalg.norm(pc1, axis=-1, keepdims=True)
        vel = np.sum(rigid_flow * unit, -1) / interval[:, None]
        # moving points: add big radial velocity offset to the last 16
        vel_m = vel.copy()
        vel_m[:, -16:] += 30.0
        label, _ = labelgen.mseg_label_rrv(
            jnp.array(pc1), jnp.array(trans), jnp.array(vel_m),
            jnp.array(interval), vr_thres=0.3)
        label = np.asarray(label)
        assert (label[0, :-16] == 1).all()
        assert (label[0, -16:] == 0).all()

    def test_extract_dynamic_from_fg(self, rng):
        n = 32
        pc1 = rng.randn(1, n, 3).astype(np.float32)
        trans = np.eye(4, dtype=np.float32)[None]
        trans[:, :3, 3] = [1.0, 0, 0]
        rigid = np.tile(np.array([1.0, 0, 0], np.float32), (1, n, 1))
        flow = rigid.copy()
        flow[:, :8] += [0, 2.0, 0]  # genuinely moving fg
        fg_mask = np.ones((1, n), np.float32)
        fg_mask[:, :16] = 0  # first 16 marked foreground by the MOT labels
        out = np.asarray(labelgen.extract_dynamic_from_fg(
            jnp.array(fg_mask), jnp.array(pc1), jnp.array(trans),
            jnp.array(flow)))
        # fg points moving like ego (8..16) become static; truly moving stay 0
        assert (out[0, :8] == 0).all()
        assert (out[0, 8:] == 1).all()

    def test_merge_labels(self):
        rrv = np.array([[1, 0, 1, 0]], np.float32)
        dyn = np.array([[1, 1, 0, 0]], np.float32)
        got = np.asarray(labelgen.merge_mseg_labels(
            jnp.array(rrv), jnp.array(dyn)))
        np.testing.assert_array_equal(got, [[1, 0, 0, 0]])
