"""Model registry (equivalent of models/model.py:19-47 + dataset_dict
pattern)."""

from typing import Any

from cmflow_tpu.models.backbone import BackboneConfig, SceneFlowTrunk
from cmflow_tpu.models.cmflow import CMFlow
from cmflow_tpu.models.cmflow_t import CMFlowT
from cmflow_tpu.models.raflow import RaFlow

MODEL_REGISTRY = {
    "raflow": RaFlow,
    "cmflow": CMFlow,
    "cmflow_t": CMFlowT,
}


def build_model(name: str, config: Any = None, axis_name=None):
    """Instantiate a model by registry name with config-derived thresholds.

    ``config`` is any object with the reference configs.yaml attributes
    (rigid_thres, stat_thres); missing attributes fall back to reference
    defaults.
    """
    name = name.lower()
    if name not in MODEL_REGISTRY:
        raise KeyError(f"unknown model {name!r}; have {list(MODEL_REGISTRY)}")
    kwargs = {"axis_name": axis_name}
    compute_dtype = getattr(config, "compute_dtype", None)
    if compute_dtype and compute_dtype != "float32":
        import jax.numpy as jnp

        kwargs["dtype"] = jnp.dtype(compute_dtype)
    remat = getattr(config, "remat", False)
    if remat:
        kwargs["remat"] = remat
    if name == "raflow":
        kwargs["rigid_thres"] = getattr(config, "rigid_thres", 0.15)
    elif name == "cmflow":
        kwargs["stat_thres"] = getattr(config, "stat_thres", 0.5)
    # cmflow_t hardcodes stat_thres=0.5 like the reference
    return MODEL_REGISTRY[name](**kwargs)


__all__ = [
    "BackboneConfig",
    "SceneFlowTrunk",
    "CMFlow",
    "CMFlowT",
    "RaFlow",
    "MODEL_REGISTRY",
    "build_model",
]
