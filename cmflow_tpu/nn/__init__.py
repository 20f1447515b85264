from cmflow_tpu.nn.blocks import (
    FeatureCorrelator,
    FlowHead,
    MotionHead,
    MultiScaleEncoder,
    PointLocalFeature,
    PointwiseMLP,
    WeightNet,
    masked_global_max,
)

__all__ = [
    "FeatureCorrelator",
    "FlowHead",
    "MotionHead",
    "MultiScaleEncoder",
    "PointLocalFeature",
    "PointwiseMLP",
    "WeightNet",
    "masked_global_max",
]
