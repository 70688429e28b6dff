"""fatezero-tpu: TPU-native zero-shot text-driven video editing framework.

A from-scratch JAX/Flax/XLA/Pallas rebuild of the capabilities of FateZero
(ChenyangQiQi/FateZero): pseudo-3D Stable Diffusion UNet with sparse-causal
spatio-temporal attention, DDIM inversion with functional attention capture,
prompt-to-prompt editing-time attention fusion, spatial blending, one-shot
Tune-A-Video fine-tuning, and on-device CLIP evaluation.

Layer map (mirrors SURVEY.md §1, re-architected for TPU):
  - ``fatezero_tpu.common``   config/YAML, logging, seeds, image IO
  - ``fatezero_tpu.ops``      schedulers, attention kernels (XLA + Pallas)
  - ``fatezero_tpu.models``   Flax pseudo-3D UNet, VAE, CLIP text/vision
  - ``fatezero_tpu.ptp``      functional attention store + edit controllers
  - ``fatezero_tpu.pipelines``inversion / editing / sampling loops
  - ``fatezero_tpu.trainer``  one-shot fine-tuning (optax)
  - ``fatezero_tpu.parallel`` mesh axes and sharding rules
  - ``fatezero_tpu.data``     image-sequence dataset + transforms
  - ``fatezero_tpu.convert``  torch checkpoint -> Flax params converters
  - ``fatezero_tpu.eval``     CLIP Frame-Acc / Tem-Con metrics
  - ``fatezero_tpu.native``   C++ data-loading backend (ctypes)
  - ``fatezero_tpu.cli``      edit / train / evaluate entry points
"""

__version__ = "0.1.0"
