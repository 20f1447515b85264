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
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from cmflow_tpu.ops import pointops

Array = jax.Array

# torch nn.Conv2d / nn.Linear default weight init: kaiming_uniform(a=sqrt(5))
# == variance_scaling(scale=1/3, fan_in, uniform).
torch_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)


def _bf16_chain_mode() -> str:
    """bf16 activation-chain bisection knob (round-5 follow-up to the
    round-4 BN-f32 fix).  The round-4 bisection's CONVERGING run
    (`conv_cmflow_bf16_bnf32`, CMFLOW_BF16_BN_F32=1) tested round-2
    semantics — BN emits f32, activations STAY f32, gather bases not
    pre-rounded — but the committed fix kept the post-activation bf16
    re-rounds and the pre-rounded bases, and that configuration still
    stalls on TPU (round-5 gate `conv_cmflow_bf16_r5`: flat 0.25 over
    36 epochs).  CMFLOW_BF16_CHAIN bisects the two remaining deltas:

      "full"   — as shipped round 4 (re-rounds + pre-rounds)
      "nopre"  — gather bases/offsets stay f32 (hi/lo two-pass MXU
                 gathers; kills the cancellation amplification of
                 ``gather(feat+xyz@w) - xyz@w`` under bf16 rounding)
      "f32act" — activations stay f32 after each BN/activation
      "lastf32"— only the FINAL layer of each BN'd PointwiseMLP (the
                 tensor feeding a max-pool) stays f32; wide mid-chain
                 boundaries keep bf16 traffic
      "r2"     — both (the configuration the round-4 gate proved)
      "auto"   — the PRODUCTION default: lastf32 in train mode, full in
                 eval mode (eval has no backward; the serving parity
                 tables certify the fully-rounded eval path)

    Round-5 gate results (synthetic-320, cmflow, 16 epochs, val RNE):
    full 0.27→flat 0.25 STALL; nopre 0.27→0.27 STALL; f32act 0.26→0.119
    CONVERGES; lastf32 0.26→0.106 CONVERGES (best) — the culprit is the
    post-activation bf16 re-round on the PRE-POOL tensor (bf16
    cotangent/elementwise chains through the max-pool backward), not
    the gather-base rounding, and only the final BN'd layer needs f32.
    """
    return os.environ.get("CMFLOW_BF16_CHAIN", "auto")


def _round_boundary(train: bool, prepool: bool) -> bool:
    """Whether a bf16 materialization boundary re-round is applied at a
    BN'd activation.  ``prepool`` marks the final BN'd layer of a chain
    (its output feeds a max-pool)."""
    mode = _bf16_chain_mode()
    if mode == "auto":
        return not (train and prepool)
    if mode in ("f32act", "r2"):
        return False
    if mode == "lastf32":
        return not prepool
    return True  # "full", "nopre"


def _torch_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


# ---------------------------------------------------------------------------
# remat modes.  ``remat=True`` recomputes the whole grouped chain (gathers,
# matmuls, BN) in the backward pass — measured to LOSE ~33% at B=64 N=256
# (docs/PERF.md).  ``remat="dots"`` stores exactly the tensors named below
# (the neighbor indices, every grouped-gather output, and every pre-BN Dense
# output) and recomputes only the BatchNorm-statistics/normalize/activation
# chains between them: the expensive MXU work is never redone, while the
# saved-residual set drops the post-BN copy of every [B,N,K,C] activation.
# ---------------------------------------------------------------------------

REMAT_SAVED_NAMES = ("nbr_idx", "grouped_dot", "mlp_dot")


def remat_wrap(cls, remat, static_argnums):
    """Wrap a Module class for the requested remat mode (False/True/"dots")."""
    if not remat:
        return cls
    if remat == "dots":
        policy = jax.checkpoint_policies.save_only_these_names(
            *REMAT_SAVED_NAMES)
        return nn.remat(cls, static_argnums=static_argnums, policy=policy)
    if remat is not True:
        # a YAML typo like remat: 'dot' or 'on' must not silently select
        # FULL remat (the mode measured to lose 33%, docs/PERF.md)
        raise ValueError(
            f"remat must be False, True, or 'dots'; got {remat!r}")
    return nn.remat(cls, static_argnums=static_argnums)


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
    dtype: Optional[jnp.dtype] = None  # compute dtype (bf16 rides the MXU);
    # params and BN statistics stay float32

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        # NOTE on layouts (profiled both ways): the 4-D [B,N,K,C] chain is
        # kept as-is.  Flattening to 2-D [rows, C] looks like it should
        # avoid the conv-emitter's {1,3,2,0} layout copies, but XLA then
        # picks {0,1} layouts for the small-C 2-D matmuls and inserts the
        # same volume of copies at every boundary with the 4-D max/eq
        # ops, plus standalone broadcast/sub kernels (measured +12 ms).
        for i, width in enumerate(self.features):
            fan_in = x.shape[-1]
            x = nn.Dense(
                width,
                use_bias=self.use_bias,
                kernel_init=torch_kernel_init,
                bias_init=_torch_bias_init(fan_in),
                dtype=self.dtype,
                name=f"dense_{i}",
            )(x)
            x = checkpoint_name(x, "mlp_dot")
            if self.use_bn:
                # BatchNorm COMPUTES in f32 (dtype=None promotes the bf16
                # input with the f32 scale/bias params).  Running BN's
                # normalize+affine natively in bf16 on the TPU VPU breaks
                # training: the (x-mean) cancellation and the backward's
                # scale/bias reduces degrade enough that every model
                # family stalls (round-4 bisection, docs/PERF.md "bf16
                # train-path convergence"); the CPU emitter internally
                # evaluates bf16 elementwise math in f32, which is why
                # CPU gates never caught it.  Mid-chain outputs re-round
                # to bf16 below (halved [rows, C] boundary HBM traffic);
                # the FINAL BN'd layer — the pre-pool tensor — stays f32
                # in train mode (_round_boundary; the round-5 bisection
                # showed re-rounding it stalls TPU training).
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
            if (self.dtype is not None
                    and _round_boundary(train, self.use_bn
                                        and i == len(self.features) - 1)):
                x = x.astype(self.dtype)  # bf16 materialization boundary
        return x


class PointLocalFeature(nn.Module):
    """Ball-query local feature abstraction (radarflow_util.py:121-162).

    query_and_group -> mlp (on [B,N,K,3+C]) -> max over K -> mlp2.

    TPU optimization (exact, not approximate): the first grouped layer is
    ``W @ concat(rel_xyz, feat[idx])`` with no bias — a linear map — so the
    feature half is computed **per point** (N rows) and then gathered,
    instead of transforming each of the N*K gathered copies.  For the
    propagation encoder (C=1027 -> 512) this cuts the dominant matmul's
    FLOPs and HBM traffic by ~sum(K)=60x while producing bitwise-equivalent
    math modulo fp reassociation.
    """

    radius: float
    nsample: int
    mlp: Sequence[int]
    mlp2: Sequence[int]
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        xyz: Array,
        features: Array,
        train: bool,
        valid: Optional[Array] = None,
    ) -> Array:
        c_in = features.shape[-1] + 3
        c1 = self.mlp[0]
        w0 = self.param("w0", torch_kernel_init, (c_in, c1))
        cdt = self.dtype or w0.dtype  # bf16 multiplies, f32 accumulation

        idx = checkpoint_name(
            pointops.ball_query(self.radius, self.nsample, xyz, xyz, valid),
            "nbr_idx")

        # factored first layer with the rel-offset FOLDED into the gather
        # (same associativity trick as the serving kernel, ops/fused.py
        # _plf_kernel): since ``rel @ w0[:3]`` is linear,
        #   rel @ wrel + feat_tx[idx] = (feat_tx + xyz_c @ wrel)[idx]
        #                               - xyz_c @ wrel,
        # one gather instead of two (the xyz gather and the [B,N,K,3] rel
        # tensor never exist, in either direction of the train step).
        # xyz is centered per cloud first — exact cancellation, but keeps
        # the MXU gather's hi/lo rounding at scene-extent scale.
        xyz_c = xyz - jnp.mean(xyz, axis=1, keepdims=True)
        off = jnp.einsum("bnc,cd->bnd",
                         xyz_c.astype(cdt), w0[:3].astype(cdt),
                         preferred_element_type=jnp.float32)
        feat_tx = jnp.einsum("bnc,cd->bnd",
                             features.astype(cdt), w0[3:].astype(cdt),
                             preferred_element_type=jnp.float32)
        base = feat_tx + off
        if (self.dtype is not None
                and _bf16_chain_mode() not in ("nopre", "r2")):
            # bf16 mode: pre-round the gathered base — the MXU one-hot
            # gather runs single-pass (vs hi/lo two-pass for f32), in
            # BOTH directions of the train step.  Properly exonerated
            # for the bf16 convergence stall by the round-5 "nopre"
            # bisection arm (removing ONLY this rounding still stalls;
            # the pre-pool boundary was the culprit — docs/PERF.md
            # "bf16 train-path convergence").
            base = base.astype(self.dtype)
            off = off.astype(self.dtype)
        pre = checkpoint_name(
            pointops.group_points(base, idx) - off[:, :, None, :],
            "grouped_dot")
        # bn0 computes in f32 (same TPU-bf16 convergence constraint as
        # PointwiseMLP); the bf16 re-round keeps the boundary tensors half
        h = nn.relu(nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            axis_name=self.axis_name if train else None,
            name="bn0",
        )(pre))
        if (self.dtype is not None
                and _round_boundary(train, len(self.mlp) == 1)):
            h = h.astype(self.dtype)

        if len(self.mlp) > 1:
            h = PointwiseMLP(self.mlp[1:], axis_name=self.axis_name,
                             dtype=self.dtype, name="mlp")(h, train)
        h = jnp.max(h, axis=2)  # max over neighbors
        h = PointwiseMLP(self.mlp2, axis_name=self.axis_name,
                         dtype=self.dtype, name="mlp2")(h, train)
        return h  # [B, N, mlp2[-1]]


class MultiScaleEncoder(nn.Module):
    """Concatenation of per-radius PointLocalFeature branches
    (radarflow_util.py:101-118)."""

    radii: Sequence[float]
    nsamples: Sequence[int]
    mlp: Sequence[int]
    mlp2: Sequence[int]
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    remat: object = False  # False | True | "dots" (see remat_wrap)

    @nn.compact
    def __call__(
        self,
        xyz: Array,
        features: Array,
        train: bool,
        valid: Optional[Array] = None,
    ) -> Array:
        # remat: recompute (all of, or the BN/activation slices of) each
        # scale's [B,N,K,C] grouped chain in the backward pass instead of
        # storing its residuals — trades recompute for the HBM round-trips
        # of the saved activations (the largest tensors in the train step).
        # `train` (arg 3 counting self) must be static: it selects the
        # BatchNorm branch.
        cls = remat_wrap(PointLocalFeature, self.remat, (3,))
        outs = []
        for i, (r, k) in enumerate(zip(self.radii, self.nsamples)):
            outs.append(
                cls(
                    r, k, self.mlp, self.mlp2,
                    axis_name=self.axis_name, dtype=self.dtype,
                    name=f"scale_{i}",
                )(xyz, features, train, valid)
            )
        return jnp.concatenate(outs, axis=-1)


class WeightNet(nn.Module):
    """Small MLP from 3-D offsets to per-neighbor weights
    (radarflow_util.py:287-318; bn=False default, conv bias on)."""

    out_channel: int
    hidden: Sequence[int] = (8, 8)
    dtype: Optional[jnp.dtype] = None

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
                dtype=self.dtype,
                name=f"dense_{i}",
            )(x)
            x = nn.relu(checkpoint_name(x, "mlp_dot"))
        return x.astype(jnp.float32)


class FeatureCorrelator(nn.Module):
    """Point-to-patch + patch-to-patch cost volume
    (radarflow_util.py:164-237; bn=False, LeakyReLU(0.1), conv bias on).

    TPU optimization (exact): the first correlation layer is
    ``W @ concat(f1_broadcast, f2[idx], dir) + b`` — linear — so the two
    feature halves are transformed **per point** (N rows each) and combined
    after broadcast/gather, instead of transforming all N*K expanded copies.
    Cuts the first-layer matmul FLOPs/HBM traffic by ~K x (K=8).  The param
    is a single ``[D1+D2+3, C]`` kernel (sliced into blocks), so the init
    distribution is identical to the unfactored Dense.
    """

    nsample: int
    mlp: Sequence[int]
    dtype: Optional[jnp.dtype] = None

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
        d1 = points1.shape[-1]
        d2 = points2.shape[-1]
        c_in = d1 + d2 + 3
        c1 = self.mlp[0]

        # --- point-to-patch volume over frame-2 neighborhoods
        knn_idx = checkpoint_name(
            pointops.knn(k, xyz1, xyz2, valid2), "nbr_idx")  # [B, N1, K]
        neighbor_xyz = pointops.group_points(xyz2, knn_idx)
        direction = checkpoint_name(
            neighbor_xyz - xyz1[:, :, None, :], "grouped_dot")  # [B,N1,K,3]

        w0 = self.param("w0", torch_kernel_init, (c_in, c1))
        b0 = self.param("b0", _torch_bias_init(c_in), (c1,))
        cdt = self.dtype or w0.dtype
        f1_tx = jnp.einsum("bnc,cd->bnd",
                           points1.astype(cdt), w0[:d1].astype(cdt),
                           preferred_element_type=jnp.float32)
        f2_tx = jnp.einsum("bnc,cd->bnd",
                           points2.astype(cdt), w0[d1:d1 + d2].astype(cdt),
                           preferred_element_type=jnp.float32)
        # direction @ w0 FOLDED into the frame-2 gather (linearity, same
        # trick as PointLocalFeature):
        #   dir @ wd = (xyz2_c[idx] - xyz1_c) @ wd
        # with one shared center so the per-point terms combine BEFORE the
        # [B,N,K,C] broadcast — one gather + one broadcast-add instead of
        # a gather + a [B,N,K,3] matmul + a 4-operand add tree.
        center = jnp.mean(xyz1, axis=1, keepdims=True)
        wd = w0[d1 + d2:].astype(cdt)
        off2 = jnp.einsum("bnc,cd->bnd",
                          (xyz2 - center).astype(cdt), wd,
                          preferred_element_type=jnp.float32)
        off1 = jnp.einsum("bnc,cd->bnd",
                          (xyz1 - center).astype(cdt), wd,
                          preferred_element_type=jnp.float32)
        base2 = f2_tx + off2
        point_term = f1_tx - off1 + b0
        if (self.dtype is not None
                and _bf16_chain_mode() not in ("nopre", "r2")):
            # single-pass bf16 MXU gather (same cancellation caveat as
            # PointLocalFeature — see _bf16_chain_mode)
            base2 = base2.astype(self.dtype)
            point_term = point_term.astype(self.dtype)
        pre = checkpoint_name(
            point_term[:, :, None, :] + pointops.group_points(base2, knn_idx),
            "grouped_dot")
        new_points = nn.leaky_relu(pre, 0.1)
        if len(self.mlp) > 1:
            new_points = PointwiseMLP(
                self.mlp[1:], use_bn=False, use_bias=True,
                negative_slope=0.1, dtype=self.dtype, name="mlp",
            )(new_points, train)

        weights = WeightNet(self.mlp[-1], dtype=self.dtype,
                            name="weightnet1")(direction)
        point_to_patch = jnp.sum(weights * new_points, axis=2)  # [B, N1, C]

        # --- patch-to-patch aggregation over frame-1 neighborhoods
        knn_idx = checkpoint_name(
            pointops.knn(k, xyz1, xyz1, valid1), "nbr_idx")
        neighbor_xyz = pointops.group_points(xyz1, knn_idx)
        direction = checkpoint_name(
            neighbor_xyz - xyz1[:, :, None, :], "grouped_dot")

        weights = WeightNet(self.mlp[-1], dtype=self.dtype,
                            name="weightnet2")(direction)
        p2p = (point_to_patch
               if self.dtype is None
               or _bf16_chain_mode() in ("nopre", "r2")
               else point_to_patch.astype(self.dtype))
        grouped_cost = checkpoint_name(
            pointops.group_points(p2p, knn_idx), "grouped_dot")
        return jnp.sum(weights * grouped_cost, axis=2)  # [B, N1, C]


class FlowHead(nn.Module):
    """Scene-flow regression head (radarflow_util.py:240-261).
    Output is always float32 (feeds Kabsch/losses)."""

    mlp: Sequence[int]
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, feat: Array, train: bool) -> Array:
        h = PointwiseMLP(self.mlp, axis_name=self.axis_name,
                         dtype=self.dtype, name="mlp")(feat, train)
        out = nn.Dense(
            3, use_bias=False, kernel_init=torch_kernel_init,
            dtype=self.dtype, name="out"
        )(h)
        return out.astype(jnp.float32)


class MotionHead(nn.Module):
    """Static/moving classification head (radarflow_util.py:263-285).
    Returns float32 probabilities in (0, 1), shape ``[B, N]``."""

    mlp: Sequence[int]
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, feat: Array, train: bool) -> Array:
        h = PointwiseMLP(self.mlp, axis_name=self.axis_name,
                         dtype=self.dtype, name="mlp")(feat, train)
        logit = nn.Dense(
            1, use_bias=False, kernel_init=torch_kernel_init,
            dtype=self.dtype, name="out"
        )(h).astype(jnp.float32)
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
