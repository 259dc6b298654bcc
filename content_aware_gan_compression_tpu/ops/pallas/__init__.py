"""Pallas TPU fast paths for the hot ops.

The reference fuses these on GPU with hand-written CUDA
(op/fused_bias_act_kernel.cu, op/upfirdn2d_kernel.cu); here the same fusions
are Pallas kernels with custom VJPs, selected by `use_pallas()` (env
CAGC_USE_PALLAS=1) with the lax implementations as fallback and testing
oracle.

Measured on TPU v5e (16x128x128x154 fp32, fetch-blocked): XLA's fused
elementwise chain and bf16 depthwise conv currently beat these kernels
(act 1.6ms vs 3.3ms; blur 3.1ms vs 4.5ms), so dispatch defaults OFF and the
kernels stand as a verified capability + precision option (they accumulate
the FIR in fp32 where the lax conv rounds through bf16 at default precision).
"""

import os

import jax


def use_pallas() -> bool:
    env = os.environ.get("CAGC_USE_PALLAS")
    if env is not None:
        return env not in ("0", "false", "False")
    return False


from .fused_act_pallas import fused_noise_bias_lrelu  # noqa: E402
from .upfirdn2d_pallas import blur4_pallas  # noqa: E402

__all__ = ["use_pallas", "fused_noise_bias_lrelu", "blur4_pallas"]
