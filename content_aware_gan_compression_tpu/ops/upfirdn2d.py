"""upfirdn2d — upsample, FIR filter, downsample in one fused XLA op.

TPU-native re-design of the reference CUDA op (reference: op/upfirdn2d.py,
op/upfirdn2d_kernel.cu). Exact semantics of the reference's CPU formula
(op/upfirdn2d.py:159-200):

    1. zero-insert upsample by ``up`` (zeros placed AFTER each sample, so the
       upsampled extent is ``H*up``, not ``H*up - (up-1)``),
    2. pad by ``(pad0, pad1)`` per axis (negative pads crop),
    3. 2-D correlate with the spatially flipped kernel (== convolve with the
       kernel),
    4. downsample by taking every ``down``-th sample.

Instead of a hand-written kernel with custom double-backward (the reference
needs one because R1/path-length regularizers differentiate through
gradients), we express the whole pipeline as ONE ``lax.conv_general_dilated``
with ``lhs_dilation`` — XLA lowers it onto the TPU convolution units and
autodiff to any order is free. Layout is NHWC (TPU-native: channels on the
128-lane minor dimension, so the depthwise FIR vectorizes on the VPU).

``out_h = (in_h * up + pad0 + pad1 - kernel_h) // down + 1`` (matches
reference op/upfirdn2d.py:103-104).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def make_kernel(k) -> jnp.ndarray:
    """Build a normalized 2-D FIR kernel from a 1-D or 2-D tap list.

    Mirrors reference model.py:27-35: a 1-D list becomes its outer product;
    the kernel is normalized to sum to 1.
    """
    k = np.asarray(k, dtype=np.float32)
    if k.ndim == 1:
        k = k[None, :] * k[:, None]
    k = k / k.sum()
    return jnp.asarray(k)


def _depthwise_fir(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    up: tuple[int, int],
    down: tuple[int, int],
    pad: tuple[int, int, int, int],
) -> jnp.ndarray:
    """Core NHWC pipeline. pad = (pad_x0, pad_x1, pad_y0, pad_y1)."""
    b, h, w, c = x.shape
    up_x, up_y = up
    down_x, down_y = down
    pad_x0, pad_x1, pad_y0, pad_y1 = pad
    kh, kw = kernel.shape

    # Correlation with the flipped kernel == convolution with the kernel.
    k = jnp.flip(kernel, (0, 1)).astype(x.dtype)
    # Depthwise: HWIO with I=1, O=C, feature_group_count=C.
    k = jnp.broadcast_to(k[:, :, None, None], (kh, kw, 1, c))

    # Zero-insertion via lhs_dilation leaves (up-1) fewer trailing zeros than
    # the reference's "zeros after every sample"; fold them into the high pad.
    eff_pad_y = (pad_y0, pad_y1 + up_y - 1)
    eff_pad_x = (pad_x0, pad_x1 + up_x - 1)

    if min(pad_x0, pad_y0) < 0 or pad_x1 + up_x - 1 < 0 or pad_y1 + up_y - 1 < 0:
        # Negative padding: materialize the dilate+pad+crop with lax.pad
        # (supports negative edge padding), then run an unpadded conv.
        x = lax.pad(
            x,
            jnp.asarray(0, x.dtype),
            ((0, 0, 0),
             (eff_pad_y[0], eff_pad_y[1], up_y - 1),
             (eff_pad_x[0], eff_pad_x[1], up_x - 1),
             (0, 0, 0)),
        )
        return lax.conv_general_dilated(
            x, k,
            window_strides=(down_y, down_x),
            padding=((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    return lax.conv_general_dilated(
        x, k,
        window_strides=(down_y, down_x),
        padding=(eff_pad_y, eff_pad_x),
        lhs_dilation=(up_y, up_x),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def _rank1_taps(kernel) -> np.ndarray | None:
    """1-D factor of a separable (rank-1) concrete 2-D FIR, else None."""
    if isinstance(kernel, jax.core.Tracer):
        return None
    k = np.asarray(kernel, np.float64)
    if k.ndim != 2 or k.shape[0] != k.shape[1]:
        return None
    i = int(np.abs(k).sum(1).argmax())
    if abs(k[i, i]) < 1e-12:
        return None
    col = k[:, i] / np.sqrt(abs(k[i, i]))
    row = k[i, :] / np.sqrt(abs(k[i, i]))
    if not np.allclose(np.outer(col, row), k, rtol=1e-6, atol=1e-12):
        return None
    # the shifted-add path applies ONE tap vector on both axes — reject
    # asymmetric separable kernels (outer([1,2],[2,1]) is rank-1 but needs
    # different row/col taps); every model-family FIR is symmetric
    if not np.allclose(col, row, rtol=1e-6, atol=1e-12):
        return None
    return col.astype(np.float32)


def _separable_shift_fir(x, taps: np.ndarray, pad) -> jnp.ndarray:
    """up=down=1 FIR as two passes of shifted adds.

    Measured on v5e at [4,1024,1024,32] bf16 (scalar-fetch fenced): the
    grouped-depthwise conv lowering runs 17.7 ms — XLA reformats the
    low-channel tensor through 5-D grouped-conv layouts — while this form
    is 6.6 ms and differentiates to shifted adds of the same cost. At
    C=128 the grouped conv is the fast path (1.4 ms, round-1 table), so
    callers gate this to small C.
    """
    f = taps[::-1]  # correlate with the flipped kernel == convolve
    n = len(f)
    px0, px1, py0, py1 = pad
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (py0, py1), (0, 0), (0, 0)))
    ho = h + py0 + py1 - (n - 1)
    y = None
    for j in range(n):
        t = float(f[j]) * lax.slice_in_dim(xp, j, j + ho, axis=1)
        y = t if y is None else y + t
    yp = jnp.pad(y, ((0, 0), (0, 0), (px0, px1), (0, 0)))
    wo = w + px0 + px1 - (n - 1)
    out = None
    for j in range(n):
        t = float(f[j]) * lax.slice_in_dim(yp, j, j + wo, axis=2)
        out = t if out is None else out + t
    return out


# channel count at or below which the shifted-add separable FIR beats the
# grouped-depthwise conv lowering (see _separable_shift_fir docstring)
_SHIFT_FIR_MAX_C = 64


@partial(jax.jit, static_argnames=("up", "down", "pad", "data_format"))
def upfirdn2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    up: int | tuple[int, int] = 1,
    down: int | tuple[int, int] = 1,
    pad: tuple[int, ...] = (0, 0),
    data_format: str = "NHWC",
) -> jnp.ndarray:
    """Upsample-FIR-downsample (reference op/upfirdn2d.py:145-156 semantics).

    Args:
      x: [B, H, W, C] (NHWC, default) or [B, C, H, W] (NCHW).
      kernel: [kh, kw] FIR taps.
      up / down: int or (x, y) factors.
      pad: (pad0, pad1) applied to both axes, or (pad_x0, pad_x1, pad_y0, pad_y1).
    """
    if isinstance(up, int):
        up = (up, up)
    if isinstance(down, int):
        down = (down, down)
    if len(pad) == 2:
        pad = (pad[0], pad[1], pad[0], pad[1])

    if data_format == "NCHW":
        x = jnp.transpose(x, (0, 2, 3, 1))
        out = _depthwise_fir(x, kernel, up, down, pad)
        return jnp.transpose(out, (0, 3, 1, 2))
    if data_format != "NHWC":
        raise ValueError(f"unknown data_format {data_format!r}")
    return _depthwise_fir(x, kernel, up, down, pad)


def upsample_2d(x, kernel, factor: int = 2, data_format: str = "NHWC"):
    """FIR upsample (reference model.py:38-56): kernel pre-scaled by factor^2,
    pad0 = (k - factor + 1)//2 + factor - 1, pad1 = (k - factor)//2."""
    kh = kernel.shape[0]
    p = kh - factor
    pad0 = (p + 1) // 2 + factor - 1
    pad1 = p // 2
    return upfirdn2d(x, kernel * (factor ** 2), up=factor, down=1,
                     pad=(pad0, pad1), data_format=data_format)


def downsample_2d(x, kernel, factor: int = 2, data_format: str = "NHWC"):
    """FIR downsample (reference model.py:59-77)."""
    kh = kernel.shape[0]
    p = kh - factor
    pad0 = (p + 1) // 2
    pad1 = p // 2
    return upfirdn2d(x, kernel, up=1, down=factor,
                     pad=(pad0, pad1), data_format=data_format)


def blur(x, kernel, pad: tuple[int, int], upsample_factor: int = 1,
         data_format: str = "NHWC"):
    """FIR blur with explicit pads (reference model.py:80-96). When placed
    after a transposed conv, the kernel is pre-scaled by upsample_factor^2.

    With CAGC_USE_PALLAS=1 the 4x4 NHWC case routes through the Pallas
    fast-path kernel (fp32 FIR accumulation)."""
    gain = float(upsample_factor ** 2) if upsample_factor > 1 else 1.0
    if (data_format == "NHWC" and kernel.shape == (4, 4)
            and min(pad) >= 0 and not isinstance(kernel, jax.core.Tracer)):
        from .pallas import use_pallas

        if use_pallas():
            from .pallas import blur4_pallas

            return blur4_pallas(x, np.asarray(kernel), tuple(pad), gain)
    if (data_format == "NHWC" and x.ndim == 4
            and x.shape[-1] <= _SHIFT_FIR_MAX_C and min(pad) >= 0):
        taps = _rank1_taps(kernel)
        if taps is not None:
            if gain != 1.0:
                taps = taps * np.sqrt(gain).astype(np.float32)
            return _separable_shift_fir(
                x, taps, (pad[0], pad[1], pad[0], pad[1]))
    if gain != 1.0:
        kernel = kernel * gain
    return upfirdn2d(x, kernel, up=1, down=1, pad=pad, data_format=data_format)
