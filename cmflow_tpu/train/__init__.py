from cmflow_tpu.train import labels

__all__ = ["labels"]
