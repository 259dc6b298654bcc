"""Pallas TPU kernel for the blur-form upfirdn2d (up=1, down=1, 4x4 FIR).

This is the hottest resampling case in the generator: every upsampling
ModulatedConv2d and every ToRGB skip-upsample ends in a 4x4 blur (reference
model.py:207-213, 38-56 — the CUDA kernel specializes exactly these modes,
op/upfirdn2d_kernel.cu:250-290). The kernel computes the 16-tap FIR as
shifted multiply-adds over a VMEM tile, with the halo rows DMA'd from HBM
per row-tile (double-buffer-free: one async copy per grid step, overlapped
by the pipeline across grid steps).

Padding is applied by XLA beforehand (one fusable pad op); the kernel is a
pure valid correlation with the (already flipped) kernel taps baked in as
compile-time scalars.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KH = KW = 4


def _make_kernel_fn(taps, th, w):
    """taps: 4x4 python floats of the FLIPPED kernel (correlation form)."""

    def kernel(x_ref, out_ref):
        acc = None
        for di in range(KH):
            for dj in range(KW):
                t = taps[di][dj]
                if t == 0.0:
                    continue
                part = x_ref[0, di:di + th, dj:dj + w, :] * t
                acc = part if acc is None else acc + part
        out_ref[0] = acc

    return kernel


@partial(jax.jit, static_argnames=("taps", "interpret"))
def _blur4_padded(x_padded, taps, interpret=False):
    """x_padded: [B, H+3, W+3, C] (already padded). Returns [B, H, W, C].

    Overlapping row windows come in via element-indexed BlockSpecs
    (pl.Element), so the pipeline DMAs each tile+halo without a hand-rolled
    copy."""
    b, hp, wp, c = x_padded.shape
    h, w = hp - KH + 1, wp - KW + 1
    # row tile: keep in-tile + out-tile (double-buffered each) well under the
    # 16MB scoped-VMEM limit; dtype-aware so bf16 gets tiles twice as tall
    # (fewer grid steps -> bigger, better-amortized DMAs)
    budget = 4 * 1024 * 1024
    itemsize = jnp.dtype(x_padded.dtype).itemsize
    th = max(1, min(h, budget // max(wp * c * itemsize * 2, 1)))
    while h % th:
        th -= 1

    kernel = _make_kernel_fn(taps, th, w)
    return pl.pallas_call(
        kernel,
        grid=(b, h // th),
        in_specs=[pl.BlockSpec(
            (pl.Element(1), pl.Element(th + KH - 1), pl.Element(wp),
             pl.Element(c)),
            lambda i, j: (i, j * th, 0, 0),
            memory_space=pltpu.VMEM)],
        # output must be element-indexed too: mixing Blocked output with an
        # Element input defeats Mosaic's pipelining and spills the whole
        # output into scoped VMEM.
        out_specs=pl.BlockSpec(
            (pl.Element(1), pl.Element(th), pl.Element(w), pl.Element(c)),
            lambda i, j: (i, j * th, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x_padded.dtype),
        interpret=interpret,
    )(x_padded)


def _taps_tuple(kernel4, gain, flip):
    k = np.asarray(kernel4, np.float64) * gain
    if flip:
        k = k[::-1, ::-1]
    return tuple(tuple(float(v) for v in row) for row in k)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _blur4_core(x, taps, pad, interpret):
    """taps: static 4x4 tuple-of-tuples of the UNflipped kernel values."""
    p0, p1 = pad
    xp = jnp.pad(x, ((0, 0), (p0, p1), (p0, p1), (0, 0)))
    # correlation with flipped kernel == convolution with kernel
    flipped = tuple(tuple(reversed(r)) for r in reversed(taps))
    return _blur4_padded(xp, flipped, interpret=interpret)


def _blur4_fwd(x, taps, pad, interpret):
    return _blur4_core(x, taps, pad, interpret), None


def _blur4_bwd(taps, pad, interpret, _res, g):
    p0, p1 = pad
    # adjoint of pad+correlate(flipped): correlate g with the UNflipped
    # kernel, padded with (k-1-p0, k-1-p1) — mirrors the reference's g_pad
    # arithmetic (op/upfirdn2d.py:111-116). Blur is CLOSED under
    # transposition, so the backward is expressed as _blur4_core again
    # (with flipped taps): reverse-mode differentiates through it to any
    # order — R1 and path-length grad-of-grad stay on the Pallas path.
    gp0, gp1 = KH - 1 - p0, KW - 1 - p1
    flipped = tuple(tuple(reversed(r)) for r in reversed(taps))
    dx = _blur4_core(g, flipped, (gp0, gp1), interpret)
    return (dx,)


_blur4_core.defvjp(_blur4_fwd, _blur4_bwd)


def blur4_pallas(x, kernel4, pad, gain=1.0, interpret=False):
    """upfirdn2d(x, kernel4*gain, up=1, down=1, pad=pad) for a 4x4 kernel.

    x: [B, H, W, C] NHWC; kernel4: 4x4 normalized FIR taps (numpy/list —
    static, baked into the kernel); pad: (p0, p1) >= 0. Gradients of any
    order stay inside the Pallas fast path via the custom VJP.
    """
    taps = _taps_tuple(kernel4, gain, flip=False)
    return _blur4_core(x, taps, tuple(pad), bool(interpret))
