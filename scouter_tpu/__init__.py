"""scouter_tpu — a TPU-native JAX framework with the capabilities of wbw520/scouter.

SCOUTER (ICCV 2021) is a slot-attention-based explainable image classifier: a CNN
backbone produces a spatial feature map, an "xSlot" module (one or more slots per
class) attends over the positions, and the per-slot attention-weighted feature sums
*are* the class confidences. This package rebuilds that capability TPU-first:

- ``scouter_tpu.ops``      — numeric contracts (sine position embedding, the xSlot
  iteration, GRU slot update, SCOUTER loss) as pure JAX functions plus fused Pallas
  TPU kernels for the hot paths.
- ``scouter_tpu.models``   — backbone zoo (ResNet / ResNeSt families) in Flax,
  NHWC layout, plus the SlotModel head and a torch-checkpoint converter.
- ``scouter_tpu.data``     — host input pipeline (MNIST IDX, ConText/ImageNet/CUB
  list builders, resize/normalize/augment) feeding sharded device batches.
- ``scouter_tpu.train``    — jitted train/eval steps over a ``jax.sharding.Mesh``
  (data parallelism via sharding annotations, gradient psum by XLA), optax AdamW +
  StepLR, checkpointing with the reference's naming convention, CLI parity.
- ``scouter_tpu.explain``  — per-slot heatmap rendering, area metrics, and the
  XAI baseline attribution suite (CAM/Grad-CAM family, RISE, extremal
  perturbation, IBA, IGOS) as batched JAX programs.
- ``scouter_tpu.parallel`` — mesh construction and sharding rules.

Reference behavior is cited throughout as ``<path>:<line>`` into the upstream
repository (wbw520/scouter).
"""

__version__ = "0.1.0"
