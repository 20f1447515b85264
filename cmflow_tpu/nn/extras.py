"""General-purpose PointNet++-style modules.

Equivalents of the reference's vendored-but-unused library layer
(lib/pointnet2_modules.py PointnetSAModule/PointnetFPModule and
lib/pytorch_utils.py SharedMLP — present in its op library though not on
the model path; provided here so the op library is feature-complete).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from cmflow_tpu.nn.blocks import PointwiseMLP
from cmflow_tpu.ops import pointops

Array = jax.Array


class SetAbstraction(nn.Module):
    """FPS downsample + ball-query grouping + shared MLP + max-pool
    (PointnetSAModule semantics, lib/pointnet2_modules.py).

    ``npoint=None`` groups all points into one region (GroupAll,
    lib/pointnet2_utils.py:295-318).
    """

    npoint: Optional[int]
    radius: Optional[float]
    nsample: Optional[int]
    mlp: Sequence[int]
    use_xyz: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, xyz: Array, features: Optional[Array],
                 train: bool = False):
        """xyz ``[B, N, 3]``, features ``[B, N, C]`` ->
        (new_xyz ``[B, S, 3]``, new_features ``[B, S, mlp[-1]]``)."""
        if self.npoint is not None:
            idx = pointops.farthest_point_sample(xyz, self.npoint)
            new_xyz = pointops.gather_points(xyz, idx)
            grouped = pointops.query_and_group(
                self.radius, self.nsample, xyz, new_xyz,
                features if self.use_xyz else None)
            if not self.use_xyz and features is not None:
                gidx = pointops.ball_query(self.radius, self.nsample, xyz,
                                           new_xyz)
                grouped = pointops.group_points(features, gidx)
        else:
            new_xyz = jnp.zeros((xyz.shape[0], 1, 3), xyz.dtype)
            parts = []
            if self.use_xyz:
                parts.append(xyz)
            if features is not None:
                parts.append(features)
            grouped = jnp.concatenate(parts, axis=-1)[:, None]  # [B,1,N,C]

        h = PointwiseMLP(self.mlp, axis_name=self.axis_name, name="mlp")(
            grouped, train)
        return new_xyz, jnp.max(h, axis=2)


class FeaturePropagation(nn.Module):
    """3-NN inverse-distance feature upsampling + shared MLP
    (PointnetFPModule semantics)."""

    mlp: Sequence[int]
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, unknown: Array, known: Array,
                 unknown_feats: Optional[Array], known_feats: Array,
                 train: bool = False) -> Array:
        """Propagate ``known_feats [B, M, C]`` at ``known [B, M, 3]`` onto
        ``unknown [B, N, 3]``; concat skip features if given."""
        dists, idx = pointops.three_nn(unknown, known)
        w = pointops.interpolation_weights(dists)
        interp = pointops.three_interpolate(known_feats, idx, w)
        if unknown_feats is not None:
            interp = jnp.concatenate([interp, unknown_feats], axis=-1)
        return PointwiseMLP(self.mlp, axis_name=self.axis_name,
                            name="mlp")(interp, train)
