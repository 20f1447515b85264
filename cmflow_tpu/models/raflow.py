"""RaFlow — self-supervised radar scene-flow baseline (RA-L'22).

TPU-native re-design of ``models/raflow.py``.  The reference's
``SFR_module`` re-fits Kabsch per batch element inside a python loop with a
data-dependent branch (raflow.py:99-113); here both branches are computed
batched and selected with ``jnp.where`` — identical numerics, no dynamic
control flow, fully jittable.
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
from cmflow_tpu.nn.blocks import FlowHead, masked_global_max

Array = jax.Array


class RaFlow(nn.Module):
    """forward(pc1, pc2, ft1, ft2, interval, train) ->
    (coarse_flow, sf_agg, pre_trans, mask_s) — raflow.py:157-164."""

    rigid_thres: float = 0.15
    rigid_pcs: float = 0.25  # min inlier fraction to apply the rigid re-fit
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
        interval: Array,
        train: bool,
        valid1: Optional[Array] = None,
        valid2: Optional[Array] = None,
    ) -> Tuple[Array, Array, Array, Array]:
        cfg = self.cfg
        # ROFE module (raflow.py:46-76): trunk + FlowDecoder head
        prop = SceneFlowTrunk(cfg, axis_name=self.axis_name,
                              dtype=self.dtype, remat=self.remat,
                              name="trunk")(
            pc1, pc2, feature1, feature2, train, valid1, valid2
        )
        final = concat_global(prop, masked_global_max(prop, valid1))
        output = FlowHead(cfg.head_mlp, axis_name=self.axis_name,
                          dtype=self.dtype, name="fp")(
            final, train
        )

        # ---- SFR module (raflow.py:78-114) ----
        b, n, _ = pc1.shape
        pc1_warp = pc1 + output

        if valid1 is not None:
            all_mask = valid1.astype(pc1.dtype)
            n_valid = jnp.sum(all_mask, axis=1)
        else:
            all_mask = jnp.ones((b, n), pc1.dtype)
            n_valid = jnp.full((b,), float(n), pc1.dtype)

        # initial fit assuming all (valid) points static; the reference
        # divides centroids by its dynamic N (raflow.py:126-127), which for
        # padded clouds is the per-batch valid count
        trans = se3.weighted_kabsch(
            pc1, pc1_warp, all_mask, centroid="mean_n", reflect="row",
            n_override=n_valid,
        )
        sf_rg = se3.rigid_to_flow(pc1, trans)

        # static-point approximation by Doppler residual (raflow.py:93-97):
        # project the rigid flow radially, compare to measured v_r * dt
        vel1 = feature1[..., 0]
        pc1_norm = jnp.linalg.norm(pc1, axis=-1)
        sf_proj = jnp.sum(sf_rg * pc1, axis=-1) / pc1_norm
        residual = vel1 * interval[:, None] - sf_proj
        # |residual / v_r| < thres; v_r == 0 yields inf/nan -> False, the
        # same IEEE behaviour as the reference
        mask_s = jnp.abs(residual / vel1) < self.rigid_thres
        if valid1 is not None:
            mask_s = jnp.logical_and(mask_s, valid1)

        # conditional rigid re-fit on inliers (raflow.py:99-113), batched:
        refit = se3.weighted_kabsch(
            pc1, pc1_warp, mask_s.astype(pc1.dtype),
            centroid="mean_n", reflect="row", n_override=n_valid,
        )
        frac = jnp.sum(mask_s, axis=1) / n_valid
        use_refit = frac > self.rigid_pcs  # [B]

        pre_trans = jnp.where(use_refit[:, None, None], refit, trans)
        sf_refit = se3.rigid_to_flow(pc1, refit)
        take_rigid = jnp.logical_and(use_refit[:, None], mask_s)
        sf_agg = jnp.where(take_rigid[..., None], sf_refit, output)

        return output, sf_agg, pre_trans, mask_s
