"""Jitted train/eval steps.

The whole reference per-batch pipeline (main_util.py:39-90) — pseudo-label
generation, forward, 5-term loss, backward, Adam update — is one fused XLA
program here.  Data parallelism is SPMD: the step is wrapped in
``shard_map`` over the ``data`` mesh axis, gradients/metrics are
``lax.pmean``-ed over ICI, and BatchNorm statistics sync through the same
axis (flax ``axis_name``), replacing the reference's ``nn.DataParallel``.

CMFlow_T's truncated-BPTT schedule (clip_util.py:34-66: per-frame optimizer
step with a detached GRU carry) is a ``lax.scan`` whose carry is
(TrainState, stop_gradient(gfeat)).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P

from cmflow_tpu.losses import radar_loss as rl
from cmflow_tpu.parallel.mesh import DATA_AXIS
from cmflow_tpu.train import labels as labelgen
from cmflow_tpu.train.state import TrainState

Array = jax.Array
Batch = Dict[str, Array]


def _vars(state: TrainState):
    return {"params": state.params, "batch_stats": state.batch_stats}


def _frame_loss(
    model_name: str,
    model,
    params,
    batch_stats,
    batch: Batch,
    proj: Array,
    tcr: Array,
    vr_thres: float,
    gfeat: Optional[Array] = None,
    axis_name: Optional[str] = None,
):
    """Label generation + forward + composite loss for one frame pair.
    Returns (loss, (items, new_batch_stats, gfeat_new))."""
    pc1, pc2 = batch["pc1"], batch["pc2"]
    ft1, ft2 = batch["ft1"], batch["ft2"]
    vel1 = ft1[..., 0]
    variables = {"params": params, "batch_stats": batch_stats}

    if model_name == "raflow":
        outs, mut = model.apply(
            variables, pc1, pc2, ft1, ft2, batch["interval"], True,
            mutable=["batch_stats"],
        )
        _, sf_agg, _, _ = outs
        loss, items = rl.radar_flow_loss("raflow", pc1, pc2, sf_agg, vel1)
        return loss, (items, mut["batch_stats"], None)

    # cross-modal models: generate pseudo labels in-step
    # (main_util.py:63-67)
    dyn_mask = labelgen.extract_dynamic_from_fg(
        batch["mask"], pc1, batch["trans"], batch["labels"]
    )
    mseg_rrv, _ = labelgen.mseg_label_rrv(
        pc1, batch["trans"], vel1, batch["interval"], vr_thres
    )
    mseg_gt = labelgen.merge_mseg_labels(mseg_rrv, dyn_mask)

    if model_name == "cmflow":
        outs, mut = model.apply(
            variables, pc1, pc2, ft1, ft2, mseg_gt, True,
            mutable=["batch_stats"],
        )
        pred_f, mseg_pre, pre_trans, _ = outs
        gfeat_new = None
    elif model_name == "cmflow_t":
        outs, mut = model.apply(
            variables, pc1, pc2, ft1, ft2, mseg_gt, True, gfeat,
            mutable=["batch_stats"],
        )
        pred_f, mseg_pre, pre_trans, _, gfeat_new = outs
    else:
        raise ValueError(model_name)

    loss, items = rl.radar_flow_loss(
        model_name, pc1, pc2, pred_f, vel1,
        gt_f=batch["labels"], pre_trans=pre_trans, mseg_pre=mseg_pre,
        gt_trans=batch["trans"], mseg_gt=mseg_gt, dyn_mask=dyn_mask,
        radar_u=batch["radar_u"], radar_v=batch["radar_v"],
        opt=batch["opt_flow"], projection=proj, t_camera_radar=tcr,
        axis_name=axis_name,
    )
    return loss, (items, mut["batch_stats"], gfeat_new)


def make_train_step(
    model_name: str,
    model,
    calib_projection: np.ndarray,
    calib_t_camera_radar: np.ndarray,
    vr_thres: float = 0.3,
    mesh=None,
) -> Callable[[TrainState, Batch], Tuple[TrainState, Dict[str, Array]]]:
    """Build the jitted per-batch train step for frame-pair models.

    Training always runs the flax path: every recompute-based
    alternative measured slower at this size (remat +33%; the retired
    recompute-VJP Pallas train engine 160.3 vs 58.2 ms/it bf16 — see
    docs/PERF.md "Train step" and the round-3 ledger)."""
    proj = jnp.asarray(calib_projection)
    tcr = jnp.asarray(calib_t_camera_radar)
    axis = DATA_AXIS if mesh is not None else None

    def step(state: TrainState, batch: Batch):
        def loss_fn(params):
            return _frame_loss(
                model_name, model, params, state.batch_stats, batch,
                proj, tcr, vr_thres, axis_name=axis,
            )

        (_, (items, new_stats, _)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        if axis is not None:
            grads = lax.pmean(grads, axis)
            items = lax.pmean(items, axis)
            # BN stats are already cross-replica (axis_name in the model)
        new_state = state.apply_gradients(grads, new_stats)
        return new_state, items

    if mesh is not None:
        step = jax.shard_map(
            step, mesh=mesh,
            in_specs=(P(), P(DATA_AXIS)),
            out_specs=(P(), P()),
            check_vma=False,
        )
    return jax.jit(step, donate_argnums=(0,))


def make_train_step_seq(
    model,
    calib_projection: np.ndarray,
    calib_t_camera_radar: np.ndarray,
    vr_thres: float = 0.3,
    mesh=None,
    model_name: str = "cmflow_t",
) -> Callable[[TrainState, Batch], Tuple[TrainState, Dict[str, Array]]]:
    """Temporal mini-clip train step: ``lax.scan`` over the ``T`` axis with
    a per-frame optimizer update and a detached recurrent carry
    (clip_util.py:34-66).

    ``model_name`` selects the per-frame loss the same way
    :func:`make_train_step` does.  The reference's clip trainer only ever
    runs cmflow_t (clip_util.py:43), but its loss registry
    (losses/loss_dict.py:5-35) is model-keyed, so non-recurrent models
    are accepted here too: when the per-frame loss yields no new carry
    (cmflow/raflow), the incoming ``gfeat`` is carried through unchanged
    to keep the ``lax.scan`` carry pytree static."""
    proj = jnp.asarray(calib_projection)
    tcr = jnp.asarray(calib_t_camera_radar)
    axis = DATA_AXIS if mesh is not None else None

    def step(state: TrainState, clip: Batch):
        b = clip["pc1"].shape[0]
        gfeat0 = jnp.zeros((b, model.cfg.prop_width), jnp.float32)

        # [B, T, ...] -> [T, B, ...] for scan
        frames = jax.tree_util.tree_map(
            lambda x: jnp.swapaxes(x, 0, 1) if x.ndim > 1 else x, clip
        )

        def body(carry, frame):
            st, gfeat = carry

            def loss_fn(params):
                return _frame_loss(
                    model_name, model, params, st.batch_stats, frame,
                    proj, tcr, vr_thres, gfeat, axis_name=axis,
                )

            (_, (items, new_stats, gfeat_new)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(st.params)
            if gfeat_new is None:  # non-recurrent per-frame loss
                gfeat_new = gfeat
            if axis is not None:
                grads = lax.pmean(grads, axis)
                items = lax.pmean(items, axis)
            st = st.apply_gradients(grads, new_stats)
            # truncated BPTT: detach the carry between frames
            # (clip_util.py:54)
            return (st, lax.stop_gradient(gfeat_new)), items

        (state, _), items_t = lax.scan(body, (state, gfeat0), frames)
        items = jax.tree_util.tree_map(lambda x: jnp.mean(x), items_t)
        return state, items

    if mesh is not None:
        step = jax.shard_map(
            step, mesh=mesh,
            in_specs=(P(), P(DATA_AXIS)),
            out_specs=(P(), P()),
            check_vma=False,
        )
    return jax.jit(step, donate_argnums=(0,))


def _use_fused_inference(fused: str) -> bool:
    """Resolve the fused-inference setting: "auto" = Pallas path on TPU,
    flax path elsewhere (the kernel only compiles for TPU)."""
    if fused == "auto":
        return jax.default_backend() == "tpu"
    return fused in ("on", "true", "1", True)


def make_eval_step(model_name: str, model, mesh=None,
                   fused: str = "auto", compute_dtype=jnp.float32):
    """Inference step returning (pred_f, pred_cls, pred_trans, pred_mask
    [, gfeat]) in eval mode (main_util.py:139-142, clip_util.py:226-233).

    With ``fused`` resolved true, cmflow/raflow run the Pallas fused
    serving forward (models/inference.py) — parity-tested against
    ``model.apply``."""
    use_fused = _use_fused_inference(fused)

    def step(state: TrainState, batch: Batch, gfeat: Optional[Array] = None):
        v1 = batch.get("valid1")
        v2 = batch.get("valid2")
        variables = _vars(state)
        if model_name == "raflow":
            if use_fused:
                from cmflow_tpu.models.inference import raflow_infer

                _, sf_agg, pre_trans, mask_s = raflow_infer(
                    variables, batch["pc1"], batch["pc2"], batch["ft1"],
                    batch["ft2"], batch["interval"], v1, v2,
                    rigid_thres=model.rigid_thres,
                    rigid_pcs=model.rigid_pcs, cfg=model.cfg,
                    compute_dtype=compute_dtype,
                )
            else:
                _, sf_agg, pre_trans, mask_s = model.apply(
                    variables, batch["pc1"], batch["pc2"], batch["ft1"],
                    batch["ft2"], batch["interval"], False,
                    valid1=v1, valid2=v2,
                )
            return sf_agg, mask_s.astype(jnp.float32), pre_trans, mask_s
        if model_name == "cmflow":
            if use_fused:
                from cmflow_tpu.models.inference import cmflow_infer

                sf_agg, stat_cls, pre_trans, mask = cmflow_infer(
                    variables, batch["pc1"], batch["pc2"], batch["ft1"],
                    batch["ft2"], v1, v2,
                    stat_thres=model.stat_thres, cfg=model.cfg,
                    compute_dtype=compute_dtype,
                )
            else:
                sf_agg, stat_cls, pre_trans, mask = model.apply(
                    variables, batch["pc1"], batch["pc2"], batch["ft1"],
                    batch["ft2"], None, False, valid1=v1, valid2=v2,
                )
            return sf_agg, stat_cls, pre_trans, mask
        if model_name == "cmflow_t":
            if use_fused:
                from cmflow_tpu.models.inference import cmflow_t_infer

                sf_agg, stat_cls, pre_trans, mask, gfeat_new = \
                    cmflow_t_infer(
                        variables, batch["pc1"], batch["pc2"], batch["ft1"],
                        batch["ft2"], gfeat, v1, v2,
                        stat_thres=model.stat_thres, cfg=model.cfg,
                        compute_dtype=compute_dtype,
                    )
            else:
                sf_agg, stat_cls, pre_trans, mask, gfeat_new = model.apply(
                    variables, batch["pc1"], batch["pc2"], batch["ft1"],
                    batch["ft2"], None, False, gfeat, valid1=v1, valid2=v2,
                )
            return sf_agg, stat_cls, pre_trans, mask, gfeat_new
        raise ValueError(model_name)

    if mesh is not None:
        # SPMD eval: replicate the state, shard every batch leaf (and the
        # temporal GRU carry) on the data axis.  Outputs stay sharded;
        # the host consumes them with ordinary fetches.  check_vma=False
        # for the Pallas serving kernels under shard_map (CLAUDE.md).
        if model_name == "cmflow_t":
            sharded = jax.shard_map(
                lambda s, b, g: step(s, b, g), mesh=mesh,
                in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
                out_specs=P(DATA_AXIS), check_vma=False)
        else:
            sharded = jax.shard_map(
                lambda s, b: step(s, b), mesh=mesh,
                in_specs=(P(), P(DATA_AXIS)),
                out_specs=P(DATA_AXIS), check_vma=False)
        return jax.jit(sharded)

    return jax.jit(step)
