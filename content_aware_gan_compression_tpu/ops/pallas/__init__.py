"""Pallas TPU fast paths for the hot ops.

The reference fuses these on GPU with hand-written CUDA
(op/fused_bias_act_kernel.cu, op/upfirdn2d_kernel.cu); here the same fusions
are Pallas kernels with custom VJPs, selected by `use_pallas()` (env
CAGC_USE_PALLAS=1/0; defaults on for TPU backends) with the lax
implementations as both fallback and testing oracle.
"""

import os

import jax


def use_pallas() -> bool:
    env = os.environ.get("CAGC_USE_PALLAS")
    if env is not None:
        return env not in ("0", "false", "False")
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


from .fused_act_pallas import fused_noise_bias_lrelu  # noqa: E402
from .upfirdn2d_pallas import blur4_pallas  # noqa: E402

__all__ = ["use_pallas", "fused_noise_bias_lrelu", "blur4_pallas"]
