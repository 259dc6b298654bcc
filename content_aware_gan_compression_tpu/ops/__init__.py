"""Resampling / activation ops — the TPU-native equivalent of the reference's
two CUDA extensions (reference: op/upfirdn2d.py, op/fused_act.py).

Two tiers:
  * a pure-`lax` reference implementation (always correct, autodiff to any
    order via XLA, used as the oracle in tests), and
  * Pallas fast paths (ops/pallas/) selected automatically on TPU for the
    shapes the model actually uses.
"""

from .upfirdn2d import (
    upfirdn2d,
    make_kernel,
    upsample_2d,
    downsample_2d,
    blur,
)
from .fused_act import fused_leaky_relu, scaled_leaky_relu

__all__ = [
    "upfirdn2d",
    "make_kernel",
    "upsample_2d",
    "downsample_2d",
    "blur",
    "fused_leaky_relu",
    "scaled_leaky_relu",
]
