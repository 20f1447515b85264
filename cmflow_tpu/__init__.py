"""cmflow_tpu — a TPU-native (JAX/XLA/Pallas) radar scene-flow framework.

A from-scratch rebuild of the capabilities of Toytiny/CMFlow (CVPR'23
"Hidden Gems: 4D Radar Scene Flow Learning Using Cross-Modal Supervision"):
scene-flow / motion-segmentation / ego-motion models for 4D-radar point
clouds, trained with cross-modal supervision, redesigned for TPU:

  * static shapes + validity masks instead of dynamic point counts,
  * dense MXU-friendly distance matrices instead of scatter CUDA kernels,
  * `lax.scan` temporal recurrence instead of python frame loops,
  * `shard_map` data parallelism over a device mesh instead of DataParallel.

Layout convention: points and features are channels-last ``[B, N, C]``
(the reference uses torch channels-first ``[B, C, N]``).
"""

__version__ = "0.1.0"
