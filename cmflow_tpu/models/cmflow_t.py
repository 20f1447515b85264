"""CMFlow_T — temporal CMFlow with a GRU over the global feature.

TPU-native re-design of ``models/cmflow_t.py``.  The recurrent state is a
single ``[B, 256]`` vector carried across frames; the temporal loop itself
lives in the training/eval steps as a ``lax.scan`` (train/steps.py), the
module only performs one frame step, mirroring cmflow_t.py:185-211.

GRU note: torch ``nn.GRU`` keeps two redundant bias vectors per gate
(b_ih + b_hh); flax ``GRUCell`` folds them into one (except the candidate
gate, where the hidden bias is kept separate exactly like torch).  The
function class is identical.
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


class CMFlowT(nn.Module):
    """forward(pc1, pc2, ft1, ft2, label_m, train, gfeat) ->
    (sf_agg, stat_cls, pre_trans, mask, gfeat_new) — cmflow_t.py:185-211.

    ``gfeat`` is the previous GRU state ``[B, prop_width]``; pass zeros at a
    clip start (the reference's ``None`` also becomes zeros,
    cmflow_t.py:97-98).
    """

    stat_thres: float = 0.5  # hardcoded in the reference (cmflow_t.py:18)
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
        gfeat: Array,
        valid1: Optional[Array] = None,
        valid2: Optional[Array] = None,
    ) -> Tuple[Array, Array, Array, Array, Array]:
        cfg = self.cfg
        prop = SceneFlowTrunk(cfg, axis_name=self.axis_name,
                              dtype=self.dtype, remat=self.remat,
                              name="trunk")(
            pc1, pc2, feature1, feature2, train, valid1, valid2
        )

        # GRU over the pooled global feature (cmflow_t.py:94-107)
        pooled = masked_global_max(prop, valid1)  # [B, prop_width]
        gfeat_new, _ = nn.GRUCell(features=cfg.prop_width, name="gru")(
            gfeat, pooled
        )
        final = concat_global(prop, gfeat_new)

        output = FlowHead(cfg.head_mlp, axis_name=self.axis_name,
                          dtype=self.dtype, name="fp")(
            final, train
        )
        stat_cls = MotionHead(
            cfg.head_mlp, axis_name=self.axis_name, dtype=self.dtype,
            name="mp"
        )(final, train)

        if train and label_m is not None:
            scores = label_m
        else:
            scores = stat_cls

        mask = scores > self.stat_thres
        if valid1 is not None:
            mask = jnp.logical_and(mask, valid1)

        # EgoMotionHead: CMFlow_T normalizes the raw scores *without* the
        # +1e-4 floor CMFlow uses (cmflow_t.py:118-120 vs cmflow.py:105-106)
        w = scores
        if valid1 is not None:
            w = w * valid1
        w = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-12)
        pre_trans = se3.weighted_kabsch(
            pc1, pc1 + output, w, centroid="sum", reflect="row"
        )

        sf_rg = se3.rigid_to_flow(pc1, pre_trans)
        sf_agg = jnp.where(mask[..., None], sf_rg, output)

        return sf_agg, stat_cls, pre_trans, mask, gfeat_new
