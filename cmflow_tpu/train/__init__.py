from cmflow_tpu.train import labels, state, steps

__all__ = ["labels", "state", "steps"]
