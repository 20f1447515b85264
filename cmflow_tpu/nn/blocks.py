"""Neural building blocks (flax) — TPU-native equivalents of
``utils/model_utils/radarflow_util.py``.

Every 1x1 ``Conv2d`` in the reference is a pointwise channel map, which in
channels-last layout is a ``Dense`` over the trailing axis — XLA fuses the
chain of Dense+BN+ReLU into single MXU-friendly matmul kernels, replacing
the reference's CUDA group/gather kernels + cuDNN convs.

Parameter-count and math parity with the reference blocks:
  * PointLocalFeature  — radarflow_util.py:121-162
  * MultiScaleEncoder  — radarflow_util.py:101-118
  * FeatureCorrelator  — radarflow_util.py:164-237 (cost volume)
  * WeightNet          — radarflow_util.py:287-318
  * FlowHead/MotionHead — radarflow_util.py:240-285

Initializers follow torch's Conv2d defaults (kaiming-uniform with a=sqrt(5),
uniform bias in ±1/sqrt(fan_in)); the reference defines ``weights_init`` but
never applies it (models/model.py:12-17), so defaults are the real recipe.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from cmflow_tpu.ops import pointops

Array = jax.Array

# torch nn.Conv2d / nn.Linear default weight init: kaiming_uniform(a=sqrt(5))
# == variance_scaling(scale=1/3, fan_in, uniform).
torch_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)


def _torch_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class PointwiseMLP(nn.Module):
    """Stack of [Dense -> (BatchNorm) -> activation] over the channel axis.

    ``use_bn=True, use_bias=False`` matches the reference's
    ``Conv2d(bias=False) + BatchNorm2d + ReLU`` stacks; ``use_bn=False``
    matches its bn-less conv stacks (which keep the conv bias).
    """

    features: Sequence[int]
    use_bn: bool = True
    use_bias: bool = False
    negative_slope: float = 0.0  # 0 => ReLU, else LeakyReLU
    bn_momentum: float = 0.9  # torch momentum 0.1 => flax 0.9
    axis_name: Optional[str] = None  # cross-replica BN stats under shard_map

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        for i, width in enumerate(self.features):
            fan_in = x.shape[-1]
            x = nn.Dense(
                width,
                use_bias=self.use_bias,
                kernel_init=torch_kernel_init,
                bias_init=_torch_bias_init(fan_in),
                name=f"dense_{i}",
            )(x)
            if self.use_bn:
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=self.bn_momentum,
                    epsilon=1e-5,
                    axis_name=self.axis_name if train else None,
                    name=f"bn_{i}",
                )(x)
            if self.negative_slope > 0:
                x = nn.leaky_relu(x, self.negative_slope)
            else:
                x = nn.relu(x)
        return x


class PointLocalFeature(nn.Module):
    """Ball-query local feature abstraction (radarflow_util.py:121-162).

    query_and_group -> mlp (on [B,N,K,3+C]) -> max over K -> mlp2.
    """

    radius: float
    nsample: int
    mlp: Sequence[int]
    mlp2: Sequence[int]
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        xyz: Array,
        features: Array,
        train: bool,
        valid: Optional[Array] = None,
    ) -> Array:
        grouped = pointops.query_and_group(
            self.radius, self.nsample, xyz, xyz, features, xyz_valid=valid
        )  # [B, N, K, 3 + C]
        h = PointwiseMLP(self.mlp, axis_name=self.axis_name, name="mlp")(
            grouped, train
        )
        h = jnp.max(h, axis=2)  # max over neighbors
        h = PointwiseMLP(self.mlp2, axis_name=self.axis_name, name="mlp2")(
            h, train
        )
        return h  # [B, N, mlp2[-1]]


class MultiScaleEncoder(nn.Module):
    """Concatenation of per-radius PointLocalFeature branches
    (radarflow_util.py:101-118)."""

    radii: Sequence[float]
    nsamples: Sequence[int]
    mlp: Sequence[int]
    mlp2: Sequence[int]
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        xyz: Array,
        features: Array,
        train: bool,
        valid: Optional[Array] = None,
    ) -> Array:
        outs = []
        for i, (r, k) in enumerate(zip(self.radii, self.nsamples)):
            outs.append(
                PointLocalFeature(
                    r, k, self.mlp, self.mlp2,
                    axis_name=self.axis_name, name=f"scale_{i}",
                )(xyz, features, train, valid)
            )
        return jnp.concatenate(outs, axis=-1)


class WeightNet(nn.Module):
    """Small MLP from 3-D offsets to per-neighbor weights
    (radarflow_util.py:287-318; bn=False default, conv bias on)."""

    out_channel: int
    hidden: Sequence[int] = (8, 8)

    @nn.compact
    def __call__(self, offsets: Array) -> Array:
        x = offsets
        for i, width in enumerate(list(self.hidden) + [self.out_channel]):
            fan_in = x.shape[-1]
            x = nn.Dense(
                width,
                use_bias=True,
                kernel_init=torch_kernel_init,
                bias_init=_torch_bias_init(fan_in),
                name=f"dense_{i}",
            )(x)
            x = nn.relu(x)
        return x


class FeatureCorrelator(nn.Module):
    """Point-to-patch + patch-to-patch cost volume
    (radarflow_util.py:164-237; bn=False, LeakyReLU(0.1), conv bias on)."""

    nsample: int
    mlp: Sequence[int]

    @nn.compact
    def __call__(
        self,
        xyz1: Array,
        xyz2: Array,
        points1: Array,
        points2: Array,
        train: bool,
        valid1: Optional[Array] = None,
        valid2: Optional[Array] = None,
    ) -> Array:
        b, n1, _ = xyz1.shape
        k = self.nsample

        # --- point-to-patch volume over frame-2 neighborhoods
        knn_idx = pointops.knn(k, xyz1, xyz2, valid2)  # [B, N1, K]
        neighbor_xyz = pointops.group_points(xyz2, knn_idx)
        direction = neighbor_xyz - xyz1[:, :, None, :]  # [B, N1, K, 3]

        grouped2 = pointops.group_points(points2, knn_idx)  # [B, N1, K, D2]
        grouped1 = jnp.broadcast_to(
            points1[:, :, None, :], (b, n1, k, points1.shape[-1])
        )
        new_points = jnp.concatenate([grouped1, grouped2, direction], axis=-1)
        new_points = PointwiseMLP(
            self.mlp, use_bn=False, use_bias=True, negative_slope=0.1,
            name="mlp",
        )(new_points, train)

        weights = WeightNet(self.mlp[-1], name="weightnet1")(direction)
        point_to_patch = jnp.sum(weights * new_points, axis=2)  # [B, N1, C]

        # --- patch-to-patch aggregation over frame-1 neighborhoods
        knn_idx = pointops.knn(k, xyz1, xyz1, valid1)
        neighbor_xyz = pointops.group_points(xyz1, knn_idx)
        direction = neighbor_xyz - xyz1[:, :, None, :]

        weights = WeightNet(self.mlp[-1], name="weightnet2")(direction)
        grouped_cost = pointops.group_points(point_to_patch, knn_idx)
        return jnp.sum(weights * grouped_cost, axis=2)  # [B, N1, C]


class FlowHead(nn.Module):
    """Scene-flow regression head (radarflow_util.py:240-261)."""

    mlp: Sequence[int]
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, feat: Array, train: bool) -> Array:
        h = PointwiseMLP(self.mlp, axis_name=self.axis_name, name="mlp")(
            feat, train
        )
        return nn.Dense(
            3, use_bias=False, kernel_init=torch_kernel_init, name="out"
        )(h)


class MotionHead(nn.Module):
    """Static/moving classification head (radarflow_util.py:263-285).
    Returns probabilities in (0, 1), shape ``[B, N]``."""

    mlp: Sequence[int]
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, feat: Array, train: bool) -> Array:
        h = PointwiseMLP(self.mlp, axis_name=self.axis_name, name="mlp")(
            feat, train
        )
        logit = nn.Dense(
            1, use_bias=False, kernel_init=torch_kernel_init, name="out"
        )(h)
        return nn.sigmoid(logit)[..., 0]


def masked_global_max(features: Array, valid: Optional[Array]) -> Array:
    """Global max-pool over points, excluding padded points.

    Args:
      features: ``[B, N, C]``.
      valid: optional ``[B, N]`` bool.
    Returns:
      ``[B, C]``.
    """
    if valid is not None:
        features = jnp.where(valid[..., None], features, -jnp.inf)
    return jnp.max(features, axis=1)
