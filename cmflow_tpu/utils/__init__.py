from cmflow_tpu.utils.config import Config, load_config
from cmflow_tpu.utils.logging import IOStream, MetricsWriter, init_experiment_dir

__all__ = ["Config", "IOStream", "MetricsWriter", "init_experiment_dir", "load_config"]
