"""CMFlow — per-pair cross-modal radar scene-flow model.

TPU-native re-design of ``models/cmflow.py`` (reference lines cited
inline).  Differences from the reference are layout (channels-last) and
vectorization only:

  * ``refine_with_transform``'s per-batch python loop (cmflow.py:112-125)
    becomes a single ``jnp.where``;
  * the ego-motion head's weighted Kabsch (cmflow.py:96-110,128-169) is the
    batched SVD in :mod:`cmflow_tpu.geometry.se3` with reference-exact
    centroid and reflection semantics;
  * optional validity masks support padded (static-shape) point sets.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from cmflow_tpu.geometry import se3
from cmflow_tpu.models.backbone import (
    BackboneConfig,
    SceneFlowTrunk,
    concat_global,
)
from cmflow_tpu.nn.blocks import FlowHead, MotionHead, masked_global_max

Array = jax.Array


class CMFlow(nn.Module):
    """forward(pc1, pc2, ft1, ft2, label_m, train) ->
    (sf_agg, stat_cls, pre_trans, mask)  — cmflow.py:171-197."""

    stat_thres: float = 0.5
    cfg: BackboneConfig = BackboneConfig()
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    remat: object = False  # False | True | "dots" (nn/blocks.py remat_wrap)

    @nn.compact
    def __call__(
        self,
        pc1: Array,
        pc2: Array,
        feature1: Array,
        feature2: Array,
        label_m: Optional[Array],
        train: bool,
        valid1: Optional[Array] = None,
        valid2: Optional[Array] = None,
    ) -> Tuple[Array, Array, Array, Array]:
        cfg = self.cfg
        prop = SceneFlowTrunk(cfg, axis_name=self.axis_name,
                              dtype=self.dtype, remat=self.remat,
                              name="trunk")(
            pc1, pc2, feature1, feature2, train, valid1, valid2
        )
        final = concat_global(prop, masked_global_max(prop, valid1))

        output = FlowHead(cfg.head_mlp, axis_name=self.axis_name,
                          dtype=self.dtype, name="fp")(
            final, train
        )  # [B, N, 3] initial flow
        stat_cls = MotionHead(
            cfg.head_mlp, axis_name=self.axis_name, dtype=self.dtype,
            name="mp"
        )(final, train)  # [B, N] static probability

        # training uses the pseudo mask label for ego-motion; inference the
        # predicted probabilities (cmflow.py:180-185)
        if train and label_m is not None:
            scores = label_m
        else:
            scores = stat_cls

        mask = scores > self.stat_thres
        if valid1 is not None:
            mask = jnp.logical_and(mask, valid1)

        # EgoMotionHead (cmflow.py:96-110): normalize scores to weights and
        # solve weighted Kabsch on (pc1 -> pc1 + flow)
        w = scores + 1e-4
        if valid1 is not None:
            w = w * valid1
        w = w / jnp.sum(w, axis=1, keepdims=True)
        pre_trans = se3.weighted_kabsch(
            pc1, pc1 + output, w, centroid="sum", reflect="row"
        )

        # refine: static points take the rigid flow (cmflow.py:112-125)
        sf_rg = se3.rigid_to_flow(pc1, pre_trans)
        sf_agg = jnp.where(mask[..., None], sf_rg, output)

        return sf_agg, stat_cls, pre_trans, mask
