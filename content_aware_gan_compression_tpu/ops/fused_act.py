"""Fused bias + LeakyReLU + gain — reference op/fused_act.py semantics.

The reference ships a CUDA elementwise kernel with hand-written
double-backward (op/fused_bias_act_kernel.cu:36-45) because torch cannot
fuse bias-add + LeakyReLU + scale and R1/path-length need grad-of-grad.
Under XLA both concerns vanish: the expression below is a single fused VPU
loop after XLA elementwise fusion, and autodiff composes to any order.
A Pallas fast path exists in ops/pallas/ for when this op is fused with
noise injection in the generator's hot loop.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def fused_leaky_relu(
    x: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    negative_slope: float = 0.2,
    scale: float = math.sqrt(2.0),
    channel_axis: int = -1,
) -> jnp.ndarray:
    """(x + bias) -> LeakyReLU(negative_slope) -> * scale.

    Matches reference op/fused_act.py:104-119. ``channel_axis`` is the axis
    the 1-D bias broadcasts over (-1 for NHWC feature maps and [B, D]
    vectors; the reference's NCHW equivalent is axis 1).
    """
    if bias is not None:
        shape = [1] * x.ndim
        shape[channel_axis] = bias.shape[0]
        x = x + bias.reshape(shape)
    return jnp.where(x >= 0, x, x * negative_slope) * scale


def scaled_leaky_relu(x: jnp.ndarray, negative_slope: float = 0.2) -> jnp.ndarray:
    """LeakyReLU * sqrt(2) without bias (reference model.py:174-183)."""
    return jnp.where(x >= 0, x, x * negative_slope) * math.sqrt(2.0)
