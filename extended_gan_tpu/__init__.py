"""extended_gan_tpu — a TPU-native adversarial video-frame-prediction framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
GiulioZani/extended-gan (see SURVEY.md): vanilla GAN, DCGAN-style
frame-prediction GAN with dual discriminators, CycleGAN, convolutional-GAT
and SmaAt-UNet frame predictors, streaming data pipelines, experiment
management, metrics/history/visualisation, and benchmark harnesses —
re-designed TPU-first:

- all compute under ``jax.jit`` (one compiled program per train step,
  including the full adversarial G/D update),
- data parallelism via ``jax.sharding.Mesh`` + NamedSharding over ICI,
- NHWC conv layouts, bf16-capable precision policy, static shapes,
- Pallas kernels for hot fused ops (``extended_gan_tpu.ops.pallas``).
"""

__version__ = "0.1.0"
