"""Shared scene-flow backbone: multi-scale encoder + cost volume +
propagation encoder (the common trunk of models/raflow.py:46-76,
models/cmflow.py:59-93, models/cmflow_t.py:64-107).

Architecture hyper-parameters are fixed to the reference values
(cmflow.py:21-48): 4 radii [2,4,8,16], nsamples [4,8,16,32],
sa mlp [32,32,64] + mlp2 [64,64,64]  =>  per-cloud local feature 256,
with global max-pool concat  =>  512; cost volume width 512;
propagation mlp [512,256,64] + mlp2 [64,64,64]  =>  256 (+256 global).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from cmflow_tpu.nn import blocks
from cmflow_tpu.nn.blocks import (
    FeatureCorrelator,
    MultiScaleEncoder,
    masked_global_max,
)

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class BackboneConfig:
    sa_radii: Sequence[float] = (2.0, 4.0, 8.0, 16.0)
    sa_nsamples: Sequence[int] = (4, 8, 16, 32)
    sa_mlp: Sequence[int] = (32, 32, 64)
    sa_mlp2: Sequence[int] = (64, 64, 64)
    fc_nsample: int = 8

    @property
    def fc_inch(self) -> int:
        # num_sas * sa_mlp2[-1] * 2 (local + global), cmflow.py:30
        return len(self.sa_radii) * self.sa_mlp2[-1] * 2

    @property
    def fc_mlp(self) -> Sequence[int]:
        return (self.fc_inch, self.fc_inch, self.fc_inch)

    @property
    def ep_mlp(self) -> Sequence[int]:
        f = self.fc_inch
        return (f, f // 2, f // 8)

    @property
    def ep_mlp2(self) -> Sequence[int]:
        f = self.fc_inch // 8
        return (f, f, f)

    @property
    def prop_width(self) -> int:
        # num_eps * ep_mlp2[-1], the width of prop_features and of the
        # CMFlow_T GRU state (cmflow_t.py:46)
        return len(self.sa_radii) * self.ep_mlp2[-1]

    @property
    def head_inch(self) -> int:
        return self.prop_width * 2

    @property
    def head_mlp(self) -> Sequence[int]:
        s = self.head_inch
        return (s // 2, s // 4, s // 8)


class SceneFlowTrunk(nn.Module):
    """Encoder + cost volume + flow-embedding propagation.

    Returns ``prop_features [B, N, prop_width]`` — per-point flow
    embeddings *before* the global feature concat, so per-pair models can
    max-pool directly while CMFlow_T routes the pooled vector through its
    GRU first.
    """

    cfg: BackboneConfig = BackboneConfig()
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    # recompute the grouped [B,N,K,C] chains in the backward pass instead
    # of storing their residuals: False | True (full) | "dots" (keep the
    # MXU outputs, recompute only BN/activation slices) — see
    # nn/blocks.py remat_wrap
    remat: object = False

    @nn.compact
    def __call__(
        self,
        pc1: Array,
        pc2: Array,
        feature1: Array,
        feature2: Array,
        train: bool,
        valid1: Optional[Array] = None,
        valid2: Optional[Array] = None,
    ) -> Array:
        cfg = self.cfg
        mse = MultiScaleEncoder(
            cfg.sa_radii, cfg.sa_nsamples, cfg.sa_mlp, cfg.sa_mlp2,
            axis_name=self.axis_name, dtype=self.dtype, remat=self.remat,
            name="mse_layer",
        )
        # shared weights across the two frames, like the reference's single
        # self.mse_layer applied to both clouds
        pc1_feat = mse(pc1, feature1, train, valid1)
        pc2_feat = mse(pc2, feature2, train, valid2)

        g1 = masked_global_max(pc1_feat, valid1)
        g2 = masked_global_max(pc2_feat, valid2)
        n1, n2 = pc1.shape[1], pc2.shape[1]
        pc1_feat = jnp.concatenate(
            [pc1_feat, jnp.broadcast_to(g1[:, None], (g1.shape[0], n1, g1.shape[-1]))],
            axis=-1,
        )
        pc2_feat = jnp.concatenate(
            [pc2_feat, jnp.broadcast_to(g2[:, None], (g2.shape[0], n2, g2.shape[-1]))],
            axis=-1,
        )

        fc_cls = blocks.remat_wrap(FeatureCorrelator, self.remat, (5,))
        cor = fc_cls(
            cfg.fc_nsample, cfg.fc_mlp, dtype=self.dtype, name="fc_layer"
        )(pc1, pc2, pc1_feat, pc2_feat, train, valid1, valid2)

        embeddings = jnp.concatenate([feature1, pc1_feat, cor], axis=-1)
        prop = MultiScaleEncoder(
            cfg.sa_radii, cfg.sa_nsamples, cfg.ep_mlp, cfg.ep_mlp2,
            axis_name=self.axis_name, dtype=self.dtype, remat=self.remat,
            name="mse_layer2",
        )(pc1, embeddings, train, valid1)
        return prop


def concat_global(prop: Array, gfeat: Array) -> Array:
    """Tile a global feature onto per-point features and concat."""
    b, n, _ = prop.shape
    g = jnp.broadcast_to(gfeat[:, None], (b, n, gfeat.shape[-1]))
    return jnp.concatenate([prop, g], axis=-1)
