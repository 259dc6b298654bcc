"""Fused noise-injection + bias + LeakyReLU + gain Pallas kernel.

One VPU pass over the StyledConv epilogue (the reference runs NoiseInjection
and FusedLeakyReLU as separate CUDA launches, model.py:351-367 +
op/fused_bias_act_kernel.cu): out = lrelu(x + nw * noise + bias) * sqrt(2),
with a custom VJP whose backward is a second elementwise Pallas kernel — the
sign mask is recomputed from the saved OUTPUT, exactly like the CUDA grad
kernel (fused_bias_act_kernel.cu case 31).

Layout: NHWC; bias is per-channel (lane dim); noise is [B, H, W, 1]
broadcast over channels.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SLOPE = 0.2
_SCALE = math.sqrt(2.0)


def _fwd_kernel(x_ref, noise_ref, bias_ref, nw_ref, out_ref):
    nw = nw_ref[0, 0]
    pre = x_ref[...] + nw * noise_ref[...] + bias_ref[...]
    out_ref[...] = jnp.where(pre >= 0, pre, pre * _SLOPE) * _SCALE


def _bwd_kernel(g_ref, out_ref, dx_ref):
    # out >= 0 <=> pre-activation >= 0 (scale > 0)
    mask = out_ref[...] >= 0
    dx_ref[...] = jnp.where(mask, g_ref[...], g_ref[...] * _SLOPE) * _SCALE


def _block_h(h, w, c, dtype_bytes=4, budget=4 * 1024 * 1024):
    per_row = w * c * dtype_bytes * 3  # x + out + noise/bias slack
    rows = max(1, min(h, budget // max(per_row, 1)))
    while h % rows:
        rows -= 1
    return rows


def _run_fwd(x, noise, bias, nw):
    b, h, w, c = x.shape
    th = _block_h(h, w, c)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, w, 1), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x, noise.astype(x.dtype), bias.astype(x.dtype), nw)


def _run_bwd(g, out):
    b, h, w, c = out.shape
    th = _block_h(h, w, c)
    spec = pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _bwd_kernel,
        grid=(b, h // th),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(out.shape, out.dtype),
    )(g.astype(out.dtype), out)


@jax.custom_vjp
def _masked_scale(g, out):
    """g * (out >= 0 ? 1 : slope) * scale — the CUDA case-31 grad kernel.
    Linear in g with a piecewise-constant mask, so its own VJP reapplies the
    same kernel to the incoming cotangent (CUDA case 32) and sends a zero
    cotangent to `out` (the mask's a.e. derivative) — this keeps R1 and
    path-length grad-of-grad differentiable through the Pallas path."""
    return _run_bwd(g, out)


def _masked_scale_fwd(g, out):
    return _run_bwd(g, out), out


def _masked_scale_bwd(out, gg):
    return _masked_scale(gg, out), jnp.zeros_like(out)


_masked_scale.defvjp(_masked_scale_fwd, _masked_scale_bwd)


@jax.custom_vjp
def fused_noise_bias_lrelu(x, noise, bias, noise_weight):
    """lrelu(x + noise_weight * noise + bias) * sqrt(2).

    x: [B, H, W, C]; noise: [B, H, W, 1]; bias: [C]; noise_weight: scalar.
    """
    nw = jnp.asarray(noise_weight, x.dtype).reshape(1, 1)
    return _run_fwd(x, noise, bias, nw)


def _fwd_vjp(x, noise, bias, noise_weight):
    # Route through the custom_vjp function itself (not the raw pallas_call)
    # so higher-order differentiation can linearize the residual path: the
    # recursive call hits this same custom rule, one level per grad order.
    out = fused_noise_bias_lrelu(x, noise, bias, noise_weight)
    return out, (out, noise, jnp.asarray(noise_weight, x.dtype))


def _bwd_vjp(res, g):
    out, noise, nw = res
    dx = _masked_scale(g, out)
    sum_c_dx = jnp.sum(dx, axis=-1, keepdims=True)        # [B,H,W,1]
    dnoise = (nw * sum_c_dx).astype(noise.dtype)
    dbias = jnp.sum(dx, axis=(0, 1, 2))
    dnw = jnp.sum(sum_c_dx * noise.astype(sum_c_dx.dtype)).astype(nw.dtype)
    return dx, dnoise, dbias, dnw


fused_noise_bias_lrelu.defvjp(_fwd_vjp, _bwd_vjp)
