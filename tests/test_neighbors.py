"""Parity tests for the sort-free Pallas neighborhood kernels
(ops/neighbors.py) against the XLA reference formulations in
ops/pointops.py (which are themselves parity-tested against the CUDA
semantics of lib/src/ball_query_gpu.cu / radarflow_util.py knn_point)."""

import numpy as np
import jax.numpy as jnp
import pytest

from cmflow_tpu.ops import pointops
from cmflow_tpu.ops.neighbors import ball_query_multi, knn_pallas


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def clouds(rng, b, n, scale=20.0):
    pts = (rng.rand(b, n, 3) * scale).astype(np.float32)
    return jnp.asarray(pts)


RADII = (2.0, 4.0, 8.0, 16.0)
KS = (4, 8, 16, 32)


class TestBallQueryMulti:
    def test_matches_xla_all_scales(self, rng):
        pts = clouds(rng, 3, 256)
        outs = ball_query_multi(RADII, KS, pts, pts, True)
        for r, k, got in zip(RADII, KS, outs):
            ref = pointops.ball_query(r, k, pts, pts)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(ref),
                                          err_msg=f"radius {r}")

    def test_query_ne_points(self, rng):
        pts = clouds(rng, 2, 256)
        q = clouds(rng, 2, 128, scale=25.0)
        outs = ball_query_multi((3.0, 6.0), (8, 16), pts, q, True)
        for r, k, got in zip((3.0, 6.0), (8, 16), outs):
            ref = pointops.ball_query(r, k, pts, q)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_empty_balls_and_padding(self, rng):
        # tiny radius: most balls have only the query point itself (or,
        # for distinct clusters, nothing) -> exercises first-hit padding
        # and the all-zero empty-ball convention
        pts = clouds(rng, 2, 256, scale=200.0)
        q = pts + 0.0
        (got,) = ball_query_multi((0.5,), (8,), pts, q, True)
        ref = pointops.ball_query(0.5, 8, pts, q)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

        # queries far from every point: no hits at all -> zeros
        far = pts + 1e4
        (got,) = ball_query_multi((1.0,), (4,), pts, far, True)
        assert (np.asarray(got) == 0).all()

    def test_valid_mask(self, rng):
        pts = clouds(rng, 2, 256)
        valid = jnp.asarray(rng.rand(2, 256) > 0.4)
        outs = ball_query_multi(RADII[:2], KS[:2], pts, pts, True,
                                points_valid=valid)
        for r, k, got in zip(RADII[:2], KS[:2], outs):
            ref = pointops.ball_query(r, k, pts, pts, valid)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_multi_tile(self, rng):
        pts = clouds(rng, 1, 512, scale=30.0)
        (got,) = ball_query_multi((4.0,), (16,), pts, pts, True)
        ref = pointops.ball_query(4.0, 16, pts, pts)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


class TestKnnPallas:
    def test_matches_topk(self, rng):
        q = clouds(rng, 3, 256)
        pts = clouds(rng, 3, 256)
        got = knn_pallas(8, q, pts, True)
        ref = pointops.knn(8, q, pts)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_ties_prefer_lower_index(self):
        # duplicated points produce exact distance ties; top_k is stable
        # (lower index first) and the kernel must match
        base = np.array([[[0.0, 0, 0], [1, 0, 0], [1, 0, 0], [2, 0, 0]]],
                        np.float32)
        pts = jnp.asarray(np.tile(base, (1, 32, 1)))  # 128 points, many ties
        q = pts[:, :128]
        got = knn_pallas(8, q, pts, True)
        ref = pointops.knn(8, q, pts)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_valid_mask_and_k_over_count(self, rng):
        q = clouds(rng, 2, 128)
        pts = clouds(rng, 2, 256)
        valid = jnp.asarray(np.arange(256)[None, :] < np.array([[5], [256]]))
        got = knn_pallas(8, q, pts, True, points_valid=valid)
        ref = pointops.knn(8, q, pts, valid)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
