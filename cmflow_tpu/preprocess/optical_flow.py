"""Pluggable optical-flow providers for preprocessing.

The camera modality is one of three cross-modal supervision sources; the
reference hard-wires a torch RAFT-small (preprocess/utils/optical_flow.py).
Here the provider is an interface so flow can come from the JAX RAFT port,
precomputed files, or be disabled — and the model is initialized ONCE per
run (the reference re-initializes per frame pair, get_flow_samples.py:46).

A provider is any callable ``(img1_rgb_uint8, img2_rgb_uint8) -> flow
[H, W, 2] float32``.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


class ZeroFlowProvider:
    """Disable the camera modality (optical-flow loss weight 0.1 simply
    sees zero targets)."""

    def __call__(self, img1: np.ndarray, img2: np.ndarray) -> np.ndarray:
        return np.zeros((*img1.shape[:2], 2), np.float32)


class PrecomputedFlowProvider:
    """Read flow from ``<dir>/<key>.npy``; keys assigned via
    ``set_key`` before each call (lets a driver reuse cached RAFT output)."""

    def __init__(self, flow_dir: str):
        self.flow_dir = flow_dir
        self._key: Optional[str] = None

    def set_key(self, key: str) -> None:
        self._key = key

    def __call__(self, img1: np.ndarray, img2: np.ndarray) -> np.ndarray:
        if self._key is None:
            raise RuntimeError("set_key() before requesting flow")
        return np.load(os.path.join(self.flow_dir, f"{self._key}.npy"))


class RaftSmallProvider:
    """JAX RAFT-small provider (jitted once, runs on the default device).

    Args:
      weights_path: optional path to the public torch ``raft-small.pth``
        checkpoint; randomly initialized otherwise (useful only for
        pipeline testing).
      iters: GRU iterations (the reference uses 12,
        preprocess/utils/optical_flow.py:23).
    """

    def __init__(self, weights_path: Optional[str] = None, iters: int = 12):
        import jax

        from cmflow_tpu.models.raft import RaftSmall, load_torch_raft_small

        self.model = RaftSmall()
        self.iters = iters
        self._params = None
        self._weights_path = weights_path
        self._fwd = jax.jit(
            lambda p, a, b: self.model.apply({"params": p}, a, b,
                                             iters=self.iters))

    def _init_params(self, img_shape):
        import jax
        import jax.numpy as jnp

        if self._weights_path:
            from cmflow_tpu.models.raft import load_torch_raft_small

            self._params = load_torch_raft_small(self._weights_path)
        else:
            dummy = jnp.zeros((1, *img_shape[:2], 3), jnp.float32)
            self._params = self.model.init(
                {"params": jax.random.PRNGKey(0)}, dummy, dummy, iters=1
            )["params"]

    def __call__(self, img1: np.ndarray, img2: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        h, w = img1.shape[:2]
        ph = (8 - h % 8) % 8
        pw = (8 - w % 8) % 8
        if ph or pw:
            pad = ((0, ph), (0, pw), (0, 0))
            img1 = np.pad(img1, pad)
            img2 = np.pad(img2, pad)
        if self._params is None:
            self._init_params(img1.shape)
        flow = self._fwd(self._params, jnp.asarray(img1)[None],
                         jnp.asarray(img2)[None])
        flow = np.asarray(flow[0], np.float32)
        return flow[:h, :w]
