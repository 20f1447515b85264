"""Parity tests for cmflow_tpu.ops against pure-numpy implementations of the
reference CUDA kernel semantics (lib/src/*.cu)."""

import numpy as np
import pytest

import jax.numpy as jnp

from cmflow_tpu import ops


def np_square_distance(src, dst):
    d = (
        np.sum(src**2, -1)[:, :, None]
        + np.sum(dst**2, -1)[:, None, :]
        - 2 * np.einsum("bnc,bmc->bnm", src, dst)
    )
    return np.maximum(d, 0)


def np_ball_query(radius, nsample, points, query):
    """Literal re-expression of ball_query_kernel_fast (ball_query_gpu.cu:9-45)."""
    b, s, _ = query.shape
    n = points.shape[1]
    idx = np.zeros((b, s, nsample), np.int32)
    r2 = radius * radius
    for bi in range(b):
        for pi in range(s):
            cnt = 0
            for k in range(n):
                d2 = np.sum((query[bi, pi] - points[bi, k]) ** 2)
                if d2 < r2:
                    if cnt == 0:
                        idx[bi, pi, :] = k
                    idx[bi, pi, cnt] = k
                    cnt += 1
                    if cnt >= nsample:
                        break
    return idx


class TestSquareDistance:
    def test_matches_numpy(self, rng):
        a = rng.randn(2, 16, 3).astype(np.float32)
        b = rng.randn(2, 24, 3).astype(np.float32)
        got = np.asarray(ops.square_distance(jnp.array(a), jnp.array(b)))
        np.testing.assert_allclose(got, np_square_distance(a, b), atol=1e-4)

    def test_nonnegative(self, rng):
        a = rng.randn(1, 64, 3).astype(np.float32) * 100
        got = np.asarray(ops.square_distance(jnp.array(a), jnp.array(a)))
        assert (got >= 0).all()


class TestBallQuery:
    @pytest.mark.parametrize("radius,nsample", [(2.0, 4), (4.0, 8), (0.1, 4)])
    def test_cuda_exact(self, rng, radius, nsample):
        pts = (rng.randn(3, 32, 3) * 3).astype(np.float32)
        got = np.asarray(
            ops.ball_query(radius, nsample, jnp.array(pts), jnp.array(pts))
        )
        want = np_ball_query(radius, nsample, pts, pts)
        np.testing.assert_array_equal(got, want)

    def test_no_neighbors_returns_zero(self):
        # two far-apart points, tiny radius: only self is within radius of
        # itself; a query with no hits yields all-zero indices.
        pts = np.array([[[0, 0, 0], [100, 100, 100]]], np.float32)
        query = np.array([[[50, 50, 50]]], np.float32)
        got = np.asarray(ops.ball_query(1.0, 4, jnp.array(pts), jnp.array(query)))
        np.testing.assert_array_equal(got, np.zeros((1, 1, 4), np.int32))

    def test_pad_with_first_hit(self):
        pts = np.array(
            [[[0, 0, 0], [10, 0, 0], [0.5, 0, 0], [20, 0, 0]]], np.float32
        )
        query = np.array([[[0.1, 0, 0]]], np.float32)
        got = np.asarray(ops.ball_query(1.0, 4, jnp.array(pts), jnp.array(query)))
        # hits are indices 0 and 2 (ascending); pad slots repeat first hit 0
        np.testing.assert_array_equal(got[0, 0], [0, 2, 0, 0])

    def test_valid_mask_excludes_padding(self):
        pts = np.array([[[0, 0, 0], [0.2, 0, 0], [0.3, 0, 0]]], np.float32)
        valid = np.array([[True, True, False]])
        query = pts[:, :1]
        got = np.asarray(
            ops.ball_query(1.0, 4, jnp.array(pts), jnp.array(query),
                           jnp.array(valid))
        )
        assert not (got == 2).any()


class TestKnn:
    def test_matches_argsort(self, rng):
        pts = rng.randn(2, 40, 3).astype(np.float32)
        q = rng.randn(2, 10, 3).astype(np.float32)
        got = np.asarray(ops.knn(5, jnp.array(q), jnp.array(pts)))
        d = np_square_distance(q, pts)
        want = np.argsort(d, axis=-1, kind="stable")[:, :, :5]
        # compare distance sets (ties may reorder indices)
        got_d = np.take_along_axis(d, got, axis=-1)
        want_d = np.take_along_axis(d, want, axis=-1)
        np.testing.assert_allclose(np.sort(got_d, -1), np.sort(want_d, -1),
                                   atol=1e-4)

    def test_self_is_first(self, rng):
        pts = rng.randn(1, 30, 3).astype(np.float32)
        got = np.asarray(ops.knn(3, jnp.array(pts), jnp.array(pts)))
        np.testing.assert_array_equal(got[0, :, 0], np.arange(30))


class TestGrouping:
    def test_group_points(self, rng):
        pts = rng.randn(2, 20, 6).astype(np.float32)
        idx = rng.randint(0, 20, (2, 5, 4)).astype(np.int32)
        got = np.asarray(ops.group_points(jnp.array(pts), jnp.array(idx)))
        want = np.stack([pts[b][idx[b]] for b in range(2)])
        np.testing.assert_array_equal(got, want)

    def test_gather_points(self, rng):
        pts = rng.randn(2, 20, 3).astype(np.float32)
        idx = rng.randint(0, 20, (2, 7)).astype(np.int32)
        got = np.asarray(ops.gather_points(jnp.array(pts), jnp.array(idx)))
        want = np.stack([pts[b][idx[b]] for b in range(2)])
        np.testing.assert_array_equal(got, want)

    def test_query_and_group_shape_and_center(self, rng):
        xyz = rng.randn(2, 32, 3).astype(np.float32)
        feats = rng.randn(2, 32, 5).astype(np.float32)
        out = np.asarray(
            ops.query_and_group(2.0, 8, jnp.array(xyz), jnp.array(xyz),
                                jnp.array(feats))
        )
        assert out.shape == (2, 32, 8, 8)
        # every grouped neighbor must lie within the ball radius of its
        # centroid (relative xyz is stored in the first 3 channels)
        rel = out[..., :3]
        assert (np.sum(rel**2, -1) < 2.0**2 + 1e-4).all()


class TestFPS:
    def test_matches_numpy(self, rng):
        xyz = rng.randn(2, 50, 3).astype(np.float32)
        got = np.asarray(ops.farthest_point_sample(jnp.array(xyz), 8))

        for b in range(2):
            centroids = []
            dist = np.full(50, 1e10)
            far = 0
            for i in range(8):
                centroids.append(far)
                d = np.sum((xyz[b] - xyz[b, far]) ** 2, -1)
                dist = np.minimum(dist, d)
                far = int(np.argmax(dist))
            np.testing.assert_array_equal(got[b], centroids)


class TestInterpolate:
    def test_three_interpolate_exact_at_source(self, rng):
        pts = rng.randn(1, 20, 3).astype(np.float32)
        feats = rng.randn(1, 20, 4).astype(np.float32)
        dists, idx = ops.three_nn(jnp.array(pts), jnp.array(pts))
        w = ops.interpolation_weights(dists)
        out = np.asarray(ops.three_interpolate(jnp.array(feats), idx, w))
        # querying at the source points: nearest neighbor is self with
        # weight ~1 -> approximately reproduces the features (the dense
        # matmul distance expansion leaves ~1e-7 residual at self, so the
        # self weight is slightly below 1)
        np.testing.assert_allclose(out, feats, atol=5e-2)
        # and the self index is always the first neighbor
        np.testing.assert_array_equal(np.asarray(idx)[0, :, 0], np.arange(20))
