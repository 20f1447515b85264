"""Train state + optimizer matching the reference recipe.

Reference: Adam(lr=1e-3, weight_decay=1e-4) with StepLR(step=decay_epochs,
gamma=decay_rate) (main.py:107-108, configs.yaml:8-11).  torch Adam's
weight decay is L2-added-to-gradient *before* the moment updates, i.e.
``optax.add_decayed_weights`` in front of ``optax.adam`` (NOT adamw's
decoupled decay).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import optax
from flax import struct
from flax.core import FrozenDict


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(
            grads, self.opt_state, self.params
        )
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=(
                new_batch_stats if new_batch_stats is not None
                else self.batch_stats
            ),
        )


def make_optimizer(
    lr: float = 1e-3,
    weight_decay: float = 1e-4,
    decay_epochs: int = 1,
    decay_rate: float = 0.9,
    steps_per_epoch: Optional[int] = None,
) -> optax.GradientTransformation:
    """StepLR-style staircase decay + torch-Adam-with-L2.

    Always built as a schedule (constant when ``steps_per_epoch`` is
    unknown) so the optimizer-state tree structure is identical between
    training and restore-for-eval contexts.
    """
    if steps_per_epoch:
        schedule = optax.exponential_decay(
            init_value=lr,
            transition_steps=decay_epochs * steps_per_epoch,
            decay_rate=decay_rate,
            staircase=True,
        )
    else:
        schedule = optax.constant_schedule(lr)
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.adam(schedule, b1=0.9, b2=0.999, eps=1e-8),
    )


def create_train_state(
    model, rng, example_inputs, tx: optax.GradientTransformation,
    abstract: bool = False,
) -> TrainState:
    """Initialize variables with an example batch and build the state.

    ``abstract=True`` builds the state from ``jax.eval_shape`` without
    compiling or running the init program — for paths that immediately
    overwrite every value from a checkpoint (on this runtime the unfused
    flax init program costs minutes of remote compile)."""
    if abstract:
        import numpy as np

        shapes = jax.eval_shape(
            lambda r: model.init({"params": r}, *example_inputs), rng)
        # NUMPY zeros: jnp.zeros per leaf would compile ~22 distinct
        # broadcast programs through the remote compile server
        variables = jax.tree_util.tree_map(
            lambda s: np.zeros(s.shape, s.dtype), shapes)
    else:
        variables = model.init({"params": rng}, *example_inputs)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    return TrainState(
        step=jax.numpy.zeros((), jax.numpy.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
    )
