"""fnssl_tpu — TPU-native sound-source-localization framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Audio-WestlakeU/FN-SSL (FN-SSL, IPDnet, IPDnet2): direct-path IPD estimation
from multichannel audio, decoded to direction of arrival.

Layers (mirrors the reference's conceptual stack, built TPU-first):
  core/     L0  DSP & array ops (STFT, pair features, online norm, GCC/SRP)
  physics/  L1  ground-truth synthesis (DP-IPD templates & targets, VAD)
  sim/      L1' acoustic scene simulation (image-source RIR engine)
  data/     L2  input pipeline (segmenting, datasets, deterministic sharding)
  models/   L3  FN-SSL / IPDnet / variable-array IPDnet / IPDnet2 SpatialNet
  kernels/  --  Pallas TPU kernels for the hot ops
  train/    L4  train loops, losses (PIT), optimizers, checkpointing
  eval/     L5  DOA decoding (IDL/PD) and localization metrics
  parallel/ --  device mesh / sharding utilities (data parallelism)
  cli/      L6  fit/test/predict entry points
"""

__version__ = "0.1.0"
