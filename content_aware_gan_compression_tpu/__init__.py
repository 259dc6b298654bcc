"""content_aware_gan_compression_tpu — TPU-native Content-Aware GAN Compression.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference PyTorch implementation of "Content-Aware GAN Compression"
(CVPR 2021, lychenyoko/content-aware-gan-compression): StyleGAN2
generator/discriminator, content-aware channel pruning, knowledge-distillation
retraining, FID/PPL evaluation, and image projection — all redesigned
TPU-first (SPMD over `jax.sharding.Mesh`, functional pytree params,
Pallas kernels on the hot ops).

Layer map (mirrors SURVEY.md section 1, rebuilt idiomatically):
  ops/        — upfirdn2d + fused bias-act (lax reference + Pallas fast path)
  models/     — StyleGAN2 G/D, BiSeNet face parser, InceptionV3 (FID), LPIPS VGG
  pruning/    — channel metrics, schedulers, pytree mask surgery, content-aware scoring
  evaluation/ — FID and PPL evaluators
  train/      — distillation retraining loop (jitted steps, shard_map DP)
  data/       — FFHQ image pipeline
  parallel/   — mesh construction + sharding helpers
  utils/      — checkpoint import/export (torch <-> pytree), FLOPs, config, logging
  projector/  — latent-space image projection
"""

__version__ = "0.1.0"
