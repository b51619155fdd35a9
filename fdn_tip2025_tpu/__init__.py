"""fdn_tip2025_tpu — TPU-native rebuild of FDN (Fourier-based Decoupling Network, TIP 2025).

A from-scratch JAX/XLA/Pallas framework with the capabilities of the reference
PyTorch repo (Jabruson/FDN-TIP2025): joint low-light enhancement + deblurring via
a three-network cascade (I_predict_net ratio regressor, MAR amplitude restorer,
FDformer frequency-domain transformer), plus the surrounding training engine,
data pipeline, metrics, checkpointing, and distributed execution — all designed
TPU-first (NHWC layouts, DFT-as-matmul patch FFTs on the MXU, pjit/shard_map
data parallelism over a jax.sharding.Mesh).

Layout convention: all image tensors are NHWC (channels-last) — the natural TPU
layout — whereas the reference uses NCHW. Checkpoint converters transpose.
"""

__version__ = "0.1.0"
