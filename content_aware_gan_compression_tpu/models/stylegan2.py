"""StyleGAN2 generator / discriminator — TPU-native functional re-design.

Capability parity with reference model.py (Generator at model.py:398,
Discriminator at model.py:740) but built JAX-first:

  * Params are pytrees (nested dicts) whose key paths mirror the reference
    torch state-dict names ('conv1.conv.weight' -> params['conv1']['conv']
    ['weight'], same tensor layouts). That makes checkpoint import a
    mechanical key split and channel-pruning surgery a pure pytree->pytree
    transform (the reference slices state dicts, Util/mask_util.py).
  * Activations are NHWC internally (channels ride the 128-lane minor dim on
    TPU); public inputs/outputs are NCHW for API parity with the reference.
  * Per-sample weight modulation (reference model.py:241-289 folds batch into
    conv groups — hostile to the MXU) is rewritten as the mathematically
    identical scale-input/scale-output form: one SHARED batched conv plus two
    cheap elementwise scalings, with the demodulation norm computed as a tiny
    [B,in]x[in,out] matmul. Grouped convs never appear.
  * Style mixing takes a *dynamic* inject_index (a traced scalar) so one jit
    trace covers all mixing points (the reference re-randomizes in Python,
    model.py:604-610).
  * Path-length regularization (reference model.py:661-666) is a jax.vjp
    against the latent — no hand-written double-backward anywhere.

Net widths are data: `net_shape` is a tuple of per-layer channel counts
(reference's generator_net_shape, model.py:407,452-457,499-518), so pruned
(non-uniform-width) generators are just configs with a different tuple.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field, replace
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, random

from ..ops import fused_leaky_relu, scaled_leaky_relu, make_kernel, upfirdn2d, upsample_2d, blur

Params = dict  # nested {str: Params | jnp.ndarray}


# ---------------------------------------------------------------------------
# configs
# ---------------------------------------------------------------------------

def default_channels(channel_multiplier: int = 2) -> dict[int, int]:
    """Per-resolution channel table (reference model.py:432-442)."""
    return {
        4: 512, 8: 512, 16: 512, 32: 512,
        64: 256 * channel_multiplier,
        128: 128 * channel_multiplier,
        256: 64 * channel_multiplier,
        512: 32 * channel_multiplier,
        1024: 16 * channel_multiplier,
    }


def default_net_shape(size: int, channel_multiplier: int = 2) -> tuple[int, ...]:
    """Canonical per-layer widths for the unpruned generator.

    Layout (len == n_convs + 1): [conv1_in, conv1_out, up_out, conv_out,
    up_out, conv_out, ...] — matches Get_Network_Shape over a full-size
    checkpoint (reference Util/network_util.py:27-38).
    """
    ch = default_channels(channel_multiplier)
    log_size = int(math.log2(size))
    shape = [ch[4], ch[4]]
    for i in range(3, log_size + 1):
        shape += [ch[2 ** i], ch[2 ** i]]
    return tuple(shape)


@dataclass(frozen=True)
class GeneratorConfig:
    """Static (hashable, jit-safe) generator architecture description."""
    size: int
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: int = 2
    blur_kernel: tuple[int, ...] = (1, 3, 3, 1)
    lr_mlp: float = 0.01
    net_shape: tuple[int, ...] | None = None

    def __post_init__(self):
        if self.net_shape is None:
            object.__setattr__(
                self, "net_shape",
                default_net_shape(self.size, self.channel_multiplier))
        else:
            object.__setattr__(self, "net_shape", tuple(int(c) for c in self.net_shape))
        want = 2 * (self.log_size - 2) + 2
        if len(self.net_shape) != want:
            raise ValueError(
                f"net_shape has {len(self.net_shape)} entries but size="
                f"{self.size} needs n_convs+1 = {want}")

    @property
    def log_size(self) -> int:
        return int(math.log2(self.size))

    @property
    def num_layers(self) -> int:
        """Number of noise-injection layers (reference model.py:460)."""
        return (self.log_size - 2) * 2 + 1

    @property
    def n_latent(self) -> int:
        return self.log_size * 2 - 2

    @property
    def n_convs(self) -> int:
        return self.num_layers  # conv1 + len(convs)

    def with_net_shape(self, net_shape) -> "GeneratorConfig":
        return replace(self, net_shape=tuple(int(c) for c in net_shape))


@dataclass(frozen=True)
class DiscriminatorConfig:
    size: int
    channel_multiplier: int = 2
    blur_kernel: tuple[int, ...] = (1, 3, 3, 1)
    stddev_group: int = 4
    stddev_feat: int = 1
    # Clamp on the per-resolution channel table. 512 == the reference table
    # exactly (model.py:743-751 uses the same dict as the generator); smaller
    # values give a narrow D for fast compile-check/dryrun configs on CPU.
    channel_max: int = 512

    @property
    def log_size(self) -> int:
        return int(math.log2(self.size))

    def channels(self) -> dict[int, int]:
        return {k: min(v, self.channel_max)
                for k, v in default_channels(self.channel_multiplier).items()}


# ---------------------------------------------------------------------------
# primitive layers (init + apply pairs over plain dicts)
# ---------------------------------------------------------------------------

def _equal_linear_init(key, in_dim, out_dim, bias=True, bias_init=0.0, lr_mul=1.0):
    p = {"weight": random.normal(key, (out_dim, in_dim)) / lr_mul}
    if bias:
        p["bias"] = jnp.full((out_dim,), float(bias_init))
    return p


def _equal_linear(p, x, lr_mul=1.0, activation=None):
    """Equalized-lr linear (reference model.py:137-166). weight layout [out,in]."""
    in_dim = p["weight"].shape[1]
    scale = (1.0 / math.sqrt(in_dim)) * lr_mul
    w = (p["weight"] * scale).astype(x.dtype)
    out = x @ w.T
    bias = p.get("bias")
    if activation == "fused_lrelu":
        return fused_leaky_relu(out, None if bias is None else (bias * lr_mul).astype(x.dtype))
    if bias is not None:
        out = out + (bias * lr_mul).astype(x.dtype)
    return out


def _equal_conv2d_init(key, in_ch, out_ch, k, bias=True):
    p = {"weight": random.normal(key, (out_ch, in_ch, k, k))}
    if bias:
        p["bias"] = jnp.zeros((out_ch,))
    return p


def _equal_conv2d(p, x_nhwc, stride=1, padding=0, precision=None):
    """Equalized-lr conv (reference model.py:99-128). weight layout OIHW."""
    out_ch, in_ch, k, _ = p["weight"].shape
    scale = 1.0 / math.sqrt(in_ch * k * k)
    w = (p["weight"] * scale).astype(x_nhwc.dtype)
    out = lax.conv_general_dilated(
        x_nhwc, jnp.transpose(w, (2, 3, 1, 0)),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
    )
    if "bias" in p:
        out = out + p["bias"].astype(out.dtype)
    return out


def _modulated_conv2d_init(key, in_ch, out_ch, k, style_dim):
    k_w, k_m = random.split(key)
    return {
        # [1, out, in, k, k] — exact reference layout (model.py:227-229)
        "weight": random.normal(k_w, (1, out_ch, in_ch, k, k)),
        "modulation": _equal_linear_init(k_m, style_dim, in_ch, bias_init=1.0),
    }


def _modulated_conv2d(
    p, x_nhwc, style_w, *, demodulate=True, up=False, down=False,
    blur_kernel=(1, 3, 3, 1), precision=None, return_style_scalars=False,
    packed=False, packed_in=False,
):
    """Per-sample modulated conv, scale-input/scale-output form.

    Reference math (model.py:241-289): w' = scale*W*s_in ; if demodulate,
    d_o = rsqrt(sum_{in,k,k} w'^2 + 1e-8) and w'' = w'*d_o ; conv per-sample.
    Because the conv is linear in both operands:
        conv(x, w'') == d * conv(x * s, scale * W)
    and d is computable as a tiny matmul:
        d[b,o] = rsqrt(scale^2 * sum_i s[b,i]^2 * (sum_kk W[o,i]^2) + 1e-8).
    One shared conv -> straight to the MXU; no batch-grouped convs.
    """
    w = p["weight"][0]  # [out, in, k, k]
    out_ch, in_ch, k, _ = w.shape
    scale = 1.0 / math.sqrt(in_ch * k * k)

    s = _equal_linear(p["modulation"], style_w)  # [B, in]

    demod = None
    if demodulate:
        wsq = jnp.sum(jnp.square(w.astype(jnp.float32)), axis=(2, 3))  # [out, in]
        sigma = (scale * scale) * (jnp.square(s.astype(jnp.float32)) @ wsq.T) + 1e-8
        demod = lax.rsqrt(sigma).astype(x_nhwc.dtype)  # [B, out]

    if packed:
        # packed-trunk execution (ops/packed.py): per-sample modulation
        # scales tile across the four pixel phases; the conv runs as one
        # dense packed conv with statically-gathered weights. Exact same
        # math as the unpacked branches below.
        from ..ops.packed import packed_conv, packed_conv_up

        ws = (w * scale).astype(x_nhwc.dtype)
        w_hwio = jnp.transpose(ws, (2, 3, 1, 0))
        s_in = s.astype(x_nhwc.dtype)
        if packed_in:
            s_in = jnp.tile(s_in, (1, 4))
        xs = x_nhwc * s_in[:, None, None, :]
        taps = np.asarray(blur_kernel, np.float32)
        taps = taps / taps.sum()
        if up:
            factor = 2
            pb = (len(blur_kernel) - factor) - (k - 1)
            pad0 = (pb + 1) // 2 + factor - 1
            pad1 = pb // 2 + 1
            out = packed_conv_up(xs, w_hwio, fir=taps, fir_pad=(pad0, pad1),
                                 fir_gain=float(factor ** 2),
                                 packed_in=packed_in, precision=precision)
        else:
            assert packed_in, "packed s1 styled conv needs packed input"
            out = packed_conv(xs, w_hwio, stride=1, pad=k // 2,
                              precision=precision)
        if demod is not None:
            out = out * jnp.tile(demod, (1, 4))[:, None, None, :]
        if return_style_scalars:
            return out, s
        return out

    xs = x_nhwc * s[:, None, None, :].astype(x_nhwc.dtype)
    ws = (w * scale).astype(x_nhwc.dtype)

    if up:
        # torch conv_transpose2d(x, W^T, stride=2, padding=0)
        # == correlate(dilate(x, 2), flip_spatial(W)) with full (k-1) padding.
        w_t = jnp.transpose(jnp.flip(ws, (2, 3)), (2, 3, 1, 0))  # HWIO
        out = lax.conv_general_dilated(
            xs, w_t,
            window_strides=(1, 1),
            padding=((k - 1, k - 1), (k - 1, k - 1)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=precision,
        )
        if demod is not None:
            out = out * demod[:, None, None, :]
        # blur pads for the upsample path (reference model.py:207-213)
        factor = 2
        pb = (len(blur_kernel) - factor) - (k - 1)
        pad0 = (pb + 1) // 2 + factor - 1
        pad1 = pb // 2 + 1
        out = blur(out, make_kernel(blur_kernel), pad=(pad0, pad1), upsample_factor=factor)
    elif down:
        factor = 2
        pb = (len(blur_kernel) - factor) + (k - 1)
        pad0 = (pb + 1) // 2
        pad1 = pb // 2
        xs = blur(xs, make_kernel(blur_kernel), pad=(pad0, pad1))
        out = lax.conv_general_dilated(
            xs, jnp.transpose(ws, (2, 3, 1, 0)),
            window_strides=(2, 2),
            padding=((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=precision,
        )
        if demod is not None:
            out = out * demod[:, None, None, :]
    else:
        pad = k // 2
        out = lax.conv_general_dilated(
            xs, jnp.transpose(ws, (2, 3, 1, 0)),
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=precision,
        )
        if demod is not None:
            out = out * demod[:, None, None, :]

    if return_style_scalars:
        return out, s
    return out


def _styled_conv_init(key, in_ch, out_ch, k, style_dim):
    k_c, = random.split(key, 1)
    return {
        "conv": _modulated_conv2d_init(k_c, in_ch, out_ch, k, style_dim),
        "noise": {"weight": jnp.zeros((1,))},
        "activate": {"bias": jnp.zeros((out_ch,))},
    }


def _styled_conv(p, x, style_w, noise, *, up=False, blur_kernel=(1, 3, 3, 1),
                 precision=None, return_style_scalars=False,
                 packed=False, packed_in=False):
    """StyledConv = modulated conv + noise injection + fused bias-LeakyReLU
    (reference model.py:323-367). ``noise`` is [B, H, W, 1] — or, when
    packed=True, the pre-packed [*, H/2, W/2, 4*out_ch] form from
    ops.packed.pack_noise."""
    r = _modulated_conv2d(
        p["conv"], x, style_w, demodulate=True, up=up, blur_kernel=blur_kernel,
        precision=precision, return_style_scalars=return_style_scalars,
        packed=packed, packed_in=packed_in)
    out, s = r if return_style_scalars else (r, None)
    if packed:
        from ..ops.packed import tile_channel_vector

        nw = p["noise"]["weight"][0].astype(out.dtype)
        out = out + nw * noise.astype(out.dtype)
        out = fused_leaky_relu(
            out, tile_channel_vector(p["activate"]["bias"]).astype(out.dtype))
        if return_style_scalars:
            return out, s
        return out
    from ..ops.pallas import use_pallas

    if use_pallas() and out.dtype == jnp.float32:
        from ..ops.pallas import fused_noise_bias_lrelu

        out = fused_noise_bias_lrelu(
            out, noise.astype(out.dtype), p["activate"]["bias"].astype(out.dtype),
            p["noise"]["weight"][0].astype(out.dtype))
    else:
        out = out + p["noise"]["weight"][0].astype(out.dtype) * noise.astype(out.dtype)
        out = fused_leaky_relu(out, p["activate"]["bias"].astype(out.dtype))
    if return_style_scalars:
        return out, s
    return out


def _to_rgb_init(key, in_ch, style_dim):
    return {
        "conv": _modulated_conv2d_init(key, in_ch, 3, 1, style_dim),
        "bias": jnp.zeros((1, 3, 1, 1)),  # reference layout (model.py:378)
    }


def _to_rgb(p, x, style_w, skip=None, *, blur_kernel=(1, 3, 3, 1),
            precision=None, return_style_scalars=False,
            packed=False, skip_packed=False):
    """1x1 modulated conv (no demod) + bias + upsampled skip accumulation
    (reference model.py:370-395). packed=True consumes a packed x and
    produces a PACKED 12-channel rgb; the incoming skip may be packed
    (skip_packed) or the unpacked 3-channel image from the level below
    the packed trunk."""
    r = _modulated_conv2d(
        p["conv"], x, style_w, demodulate=False, precision=precision,
        return_style_scalars=return_style_scalars,
        packed=packed, packed_in=packed)
    out, s = r if return_style_scalars else (r, None)
    bias_nhwc = jnp.transpose(p["bias"], (0, 2, 3, 1))
    if packed:
        from ..ops.packed import (
            packed_upfirdn_up2, packed_conv_up, tile_channel_vector)

        out = out + tile_channel_vector(bias_nhwc[0, 0, 0]).astype(out.dtype)
        if skip is not None:
            taps = np.asarray(blur_kernel, np.float32)
            taps = taps / taps.sum()
            if skip_packed:
                skip = packed_upfirdn_up2(skip, taps, pad=(2, 1), gain=4.0,
                                          precision=precision)
            else:
                eye = jnp.eye(skip.shape[-1], dtype=skip.dtype)[None, None]
                skip = packed_conv_up(skip, eye, fir=taps, fir_pad=(2, 1),
                                      fir_gain=4.0, packed_in=False,
                                      precision=precision)
            out = out + skip
        if return_style_scalars:
            return out, s
        return out
    out = out + bias_nhwc.astype(out.dtype)
    if skip is not None:
        skip = upsample_2d(skip, make_kernel(blur_kernel))
        out = out + skip
    if return_style_scalars:
        return out, s
    return out


# ---------------------------------------------------------------------------
# Generator
# ---------------------------------------------------------------------------

def generator_init(key, config: GeneratorConfig) -> Params:
    """Init a generator param pytree (torch-init-equivalent distributions)."""
    ns = config.net_shape
    D = config.style_dim
    n_keys = (config.n_mlp + 4 + config.num_layers
              + 3 * (len(ns) // 2) + 8)
    keys = iter(random.split(key, n_keys))

    style = {}
    for i in range(config.n_mlp):
        style[str(i + 1)] = _equal_linear_init(
            next(keys), D, D, bias_init=0.0, lr_mul=config.lr_mlp)

    params: Params = {
        "style": style,
        "input": {"input": random.normal(next(keys), (1, ns[0], 4, 4))},
        "conv1": _styled_conv_init(next(keys), ns[0], ns[1], 3, D),
        "to_rgb1": _to_rgb_init(next(keys), ns[1], D),
        "convs": {},
        "to_rgbs": {},
        "noises": {},
    }
    for layer_idx in range(config.num_layers):
        res = (layer_idx + 5) // 2
        params["noises"][f"noise_{layer_idx}"] = random.normal(
            next(keys), (1, 1, 2 ** res, 2 ** res))

    for i in range(1, len(ns) // 2):
        params["convs"][str(2 * i - 2)] = _styled_conv_init(
            next(keys), ns[2 * i - 1], ns[2 * i], 3, D)
        params["convs"][str(2 * i - 1)] = _styled_conv_init(
            next(keys), ns[2 * i], ns[2 * i + 1], 3, D)
        params["to_rgbs"][str(i - 1)] = _to_rgb_init(next(keys), ns[2 * i + 1], D)
    return params


def net_shape_from_params(params: Params) -> tuple[int, ...]:
    """Read per-layer widths off conv kernel shapes [1,out,in,k,k] —
    the pytree analogue of Get_Network_Shape (reference
    Util/network_util.py:27-38)."""
    shape = [int(params["conv1"]["conv"]["weight"].shape[2]),
             int(params["conv1"]["conv"]["weight"].shape[1])]
    n = len(params["convs"])
    for i in range(n):
        shape.append(int(params["convs"][str(i)]["conv"]["weight"].shape[1]))
    return tuple(shape)


def _style_mlp(params, config, z, dtype=None):
    x = z if dtype is None else z.astype(dtype)
    # PixelNorm (reference model.py:14-24)
    x = x * lax.rsqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True) + 1e-8)
    for i in range(config.n_mlp):
        x = _equal_linear(params["style"][str(i + 1)], x,
                          lr_mul=config.lr_mlp, activation="fused_lrelu")
    return x


def generator_get_latent(params, config, z, dtype=None):
    """z -> W (reference Generator.get_latent, model.py:542-543)."""
    return _style_mlp(params, config, z, dtype)


def generator_mean_latent(params, config, key, n_latent: int, dtype=None):
    """Mean W over n_latent random z (reference model.py:534-540)."""
    z = random.normal(key, (n_latent, config.style_dim))
    return jnp.mean(_style_mlp(params, config, z, dtype), axis=0, keepdims=True)


def generator_make_noise(key, config: GeneratorConfig, batch: int = 1):
    """Per-layer NHWC noise maps [B,H,W,1] (reference model.py:523-532)."""
    noises = []
    keys = random.split(key, config.num_layers)
    for layer_idx in range(config.num_layers):
        res = 2 ** ((layer_idx + 5) // 2)
        noises.append(random.normal(keys[layer_idx], (batch, res, res, 1)))
    return noises


def _noise_buffers_nhwc(params, config):
    return [
        jnp.transpose(params["noises"][f"noise_{i}"], (0, 2, 3, 1))
        for i in range(config.num_layers)
    ]


def _synthesis(params, config, latent, noise, *, precision=None, dtype=None,
               return_style_scalars=False, remat=False,
               packed=False, packed_max_ch: int = 64,
               packed_min_res: int = 64):
    """Core synthesis network: W+ latent [B, n_latent, D] + per-layer noise
    -> NHWC image + per-scale rgb skips (reference model.py:612-646).

    remat=True wraps each (up-conv, conv, to_rgb) resolution block in
    jax.checkpoint — trades ~1/3 extra FLOPs for activation memory, which is
    what makes 1024px training fit comfortably (SURVEY section 7 stage 8).

    packed=True runs the lane-sparse high-res tail (every pair whose widths
    are <= packed_max_ch, at res >= packed_min_res) in space-to-depth
    layout: styled convs, noise, to_rgb and the rgb skip chain all stay
    packed (ops/packed.py). Exact same math.

    packed_min_res: training keeps the default 64 (packing a width-39
    res-256 pair measured +1.5% on the 256px retrain bench); forward-only
    generation passes 512 — at res <= 256 packing costs fwd throughput
    (256px pruned student: 3823 unpacked vs 2742 packed img/s; excluding
    the res-256 pair at 1024px: 381 vs 369 img/s; round 2)."""
    bk = config.blur_kernel
    batch = latent.shape[0]

    ns = config.net_shape
    n_pairs_total = len(params["convs"]) // 2
    pair_packed = [False] * n_pairs_total
    if packed:
        for pair in range(n_pairs_total):
            i_ = pair + 1
            res = 2 ** (i_ + 2)
            pair_packed[pair] = (max(ns[2 * i_], ns[2 * i_ + 1])
                                 <= packed_max_ch
                                 and res >= max(64, packed_min_res))
        # packing must be a contiguous TAIL: a packed pair hands its output
        # to the next pair in packed layout and there is no mid-trunk
        # unpack transition. Widths normally shrink with resolution so the
        # qualifying pairs already form a suffix; for a non-monotone pruned
        # net_shape (net widths are data — CLAUDE.md) fall back to unpacked
        # for every pair at or before the last non-qualifying one.
        last_false = max((p for p in range(n_pairs_total)
                          if not pair_packed[p]), default=-1)
        pair_packed = [p > last_false for p in range(n_pairs_total)]

    x = jnp.transpose(params["input"]["input"], (0, 2, 3, 1))
    if dtype is not None:
        x = x.astype(dtype)
        latent = latent.astype(dtype)
    x = jnp.tile(x, (batch, 1, 1, 1))

    styles_list = []
    r = _styled_conv(params["conv1"], x, latent[:, 0], noise[0], blur_kernel=bk,
                     precision=precision, return_style_scalars=return_style_scalars)
    if return_style_scalars:
        x, s = r
        styles_list.append(s)
    else:
        x = r

    rgb_list = []
    skip = _to_rgb(params["to_rgb1"], x, latent[:, 1], blur_kernel=bk,
                   precision=precision)
    rgb_list.append(skip)

    n_pairs = len(params["convs"]) // 2
    i = 1
    for pair in range(n_pairs):
        c1 = params["convs"][str(2 * pair)]
        c2 = params["convs"][str(2 * pair + 1)]
        trgb = params["to_rgbs"][str(pair)]
        last_rgb_scalars = return_style_scalars and (i + 3) == latent.shape[1]
        pk = pair_packed[pair]
        pk_in = pair > 0 and pair_packed[pair - 1]

        def block(x, skip, c1, c2, trgb, lat_i, lat_i1, lat_i2, n1, n2,
                  pk=pk, pk_in=pk_in):
            s_list = []
            if pk:
                from ..ops.packed import pack_noise

                n1 = pack_noise(n1, int(c1["activate"]["bias"].shape[0]))
                n2 = pack_noise(n2, int(c2["activate"]["bias"].shape[0]))
            r = _styled_conv(c1, x, lat_i, n1, up=True, blur_kernel=bk,
                             precision=precision,
                             return_style_scalars=return_style_scalars,
                             packed=pk, packed_in=pk_in)
            x, s = r if return_style_scalars else (r, None)
            if s is not None:
                s_list.append(s)
            r = _styled_conv(c2, x, lat_i1, n2, blur_kernel=bk,
                             precision=precision,
                             return_style_scalars=return_style_scalars,
                             packed=pk, packed_in=pk)
            x, s = r if return_style_scalars else (r, None)
            if s is not None:
                s_list.append(s)
            if last_rgb_scalars:
                # last ToRGB's scalars are collected too (model.py:637-639)
                skip, s = _to_rgb(trgb, x, lat_i2, skip, blur_kernel=bk,
                                  precision=precision,
                                  return_style_scalars=True,
                                  packed=pk, skip_packed=pk_in)
                s_list.append(s)
            else:
                skip = _to_rgb(trgb, x, lat_i2, skip, blur_kernel=bk,
                               precision=precision,
                               packed=pk, skip_packed=pk_in)
            return x, skip, s_list

        if remat:
            block = jax.checkpoint(block, static_argnums=())
        x, skip, s_list = block(
            x, skip, c1, c2, trgb, latent[:, i], latent[:, i + 1],
            latent[:, i + 2], noise[2 * pair + 1], noise[2 * pair + 2])
        styles_list.extend(s_list)
        if pk:
            from ..ops.packed import depth_to_space

            rgb_list.append(depth_to_space(skip))
        else:
            rgb_list.append(skip)
        i += 2

    if n_pairs and pair_packed[n_pairs - 1]:
        skip = rgb_list[-1]

    return skip, rgb_list, styles_list


def generator_apply(
    params: Params,
    config: GeneratorConfig,
    noise_z=None,
    *,
    latent_styles=None,
    input_is_latent: bool = False,
    inject_index=None,
    truncation: float = 1.0,
    truncation_latent=None,
    noise=None,
    randomize_noise: bool = True,
    rng=None,
    return_latents: bool = False,
    return_rgb_list: bool = False,
    return_style_scalars: bool = False,
    PPL_regularize: bool = False,
    ppl_rng=None,
    precision=None,
    dtype=None,
    remat: bool = False,
    packed: bool = False,
    packed_max_ch: int = 64,
    packed_min_res: int = 64,
    output_format: str = "NCHW",
):
    """Generator forward (reference Generator.forward, model.py:545-666).

    packed=True runs the lane-sparse high-res synthesis tail in
    space-to-depth layout (ops/packed.py, exact math — see _synthesis).

    Args:
      noise_z: list of z latents [B, D] (1 or 2 entries; 2 -> style mixing).
      latent_styles: list of W latents (used when input_is_latent=True). A
        single [B, n_latent, D] W+ tensor is also accepted.
      inject_index: mixing point — int, traced scalar, or None (None with two
        styles requires `rng` and samples uniform in [1, n_latent-1]).
      noise: explicit list of per-layer NHWC noise maps [B, H, W, 1]; if None
        and randomize_noise, fresh noise is drawn from `rng`; if None and not
        randomize_noise, the persistent `noises.noise_*` buffers are used.
      PPL_regularize: return (image, path_lengths) where path_lengths is the
        per-sample ||J^T y|| of the synthesis wrt the W+ latent, y ~ N(0, I/HW)
        (reference model.py:661-666); requires `ppl_rng`.
      dtype: compute dtype for activations (e.g. jnp.bfloat16); params stay
        in their stored dtype and are cast at use.

    Returns NCHW images in [-1, 1]-ish range (training decides the range).
    output_format="NHWC" skips the torch-parity transpose — synthesis is
    NHWC-native, so in-loop consumers (discriminator_apply data_format=
    "NHWC", layout-agnostic losses) avoid two C=3 layout round-trips per
    image, which the TPU tiles at 3/128 lane occupancy.
    """
    cfg = config
    to_out = ((lambda x: x) if output_format == "NHWC"
              else (lambda x: jnp.transpose(x, (0, 3, 1, 2))))

    if not input_is_latent:
        styles = [_style_mlp(params, cfg, z, dtype) for z in noise_z]
    else:
        styles = latent_styles
        if not isinstance(styles, (list, tuple)):
            styles = [styles]

    # noise maps
    if noise is None:
        if randomize_noise:
            if rng is None:
                raise ValueError("randomize_noise=True requires rng")
            batch = styles[0].shape[0]
            noise = generator_make_noise(rng, cfg, batch)
        else:
            noise = _noise_buffers_nhwc(params, cfg)
    if dtype is not None:
        noise = [n.astype(dtype) for n in noise]

    # truncation trick (reference model.py:583-591)
    if truncation is not None and not (isinstance(truncation, (int, float)) and truncation == 1):
        styles = [truncation_latent + truncation * (s - truncation_latent) for s in styles]

    # W -> W+ with style mixing (reference model.py:593-610)
    if len(styles) < 2:
        if styles[0].ndim < 3:
            latent = jnp.repeat(styles[0][:, None, :], cfg.n_latent, axis=1)
        else:
            latent = styles[0]
    else:
        if inject_index is None:
            if rng is None:
                raise ValueError("two styles with inject_index=None requires rng")
            inject_index = random.randint(rng, (), 1, cfg.n_latent)
        pos = jnp.arange(cfg.n_latent)[None, :, None]
        latent = jnp.where(pos < inject_index,
                           styles[0][:, None, :], styles[1][:, None, :])

    if PPL_regularize:
        if ppl_rng is None:
            raise ValueError("PPL_regularize requires ppl_rng")

        def synth(lat):
            img, _, _ = _synthesis(params, cfg, lat, noise,
                                   precision=precision, dtype=dtype,
                                   remat=remat, packed=packed,
                                   packed_max_ch=packed_max_ch,
                                   packed_min_res=packed_min_res)
            return img

        image, vjp_fn = jax.vjp(synth, latent)
        h, w = image.shape[1], image.shape[2]
        y = random.normal(ppl_rng, image.shape, dtype=image.dtype) / math.sqrt(h * w)
        (grad,) = vjp_fn(y)
        path_lengths = jnp.sqrt(
            jnp.mean(jnp.sum(jnp.square(grad.astype(jnp.float32)), axis=2), axis=1))
        return to_out(image), path_lengths

    image, rgb_list, styles_list = _synthesis(
        params, cfg, latent, noise, precision=precision, dtype=dtype,
        return_style_scalars=return_style_scalars, remat=remat,
        packed=packed, packed_max_ch=packed_max_ch,
        packed_min_res=packed_min_res)

    if return_rgb_list:
        returns = [to_out(r) for r in rgb_list]
    else:
        returns = to_out(image)
    if return_style_scalars:
        returns = (returns, styles_list)
    if return_latents:
        returns = (returns, latent)
    return returns


def generator_feature_maps(params, config, z, *, rng=None, noise=None,
                           precision=None):
    """Per-layer activations [const_input, conv1_out, convs_0_out, ...] as
    NCHW arrays — the analogue of Get_Layer_Output (reference
    Util/network_util.py:54-87), which feeds the map-based pruning metrics.
    The same single W (not W+) conditions every layer, and noise is freshly
    random unless given, both matching the reference's scoring path.
    """
    cfg = config
    w = _style_mlp(params, cfg, z)
    if noise is None:
        if rng is None:
            raise ValueError("need rng or explicit noise")
        noise = generator_make_noise(rng, cfg, z.shape[0])
    bk = cfg.blur_kernel

    x = jnp.transpose(params["input"]["input"], (0, 2, 3, 1))
    x = jnp.tile(x, (z.shape[0], 1, 1, 1))
    outs = [jnp.transpose(x, (0, 3, 1, 2))]
    x = _styled_conv(params["conv1"], x, w, noise[0], blur_kernel=bk,
                     precision=precision)
    outs.append(jnp.transpose(x, (0, 3, 1, 2)))
    for i in range(len(params["convs"])):
        up = (i % 2 == 0)
        x = _styled_conv(params["convs"][str(i)], x, w, noise[i + 1], up=up,
                         blur_kernel=bk, precision=precision)
        outs.append(jnp.transpose(x, (0, 3, 1, 2)))
    return outs


def generator_modulation_styles(params, config, z):
    """Modulation scalars s = A(W) for [conv1] + convs + [to_rgbs[-1]] — the
    analogue of Get_Generator_Styles (reference Util/network_util.py:168-198).
    Returns a list of [N, in_ch] arrays."""
    w = _style_mlp(params, config, z)
    mods = [params["conv1"]["conv"]["modulation"]]
    for i in range(len(params["convs"])):
        mods.append(params["convs"][str(i)]["conv"]["modulation"])
    last_rgb = str(len(params["to_rgbs"]) - 1)
    mods.append(params["to_rgbs"][last_rgb]["conv"]["modulation"])
    return [_equal_linear(m, w) for m in mods]


def generator_effective_weight_means(params, config, z):
    """Batch-mean of the (de)modulated kernels for [conv1] + convs +
    [to_rgbs[-1]] without materializing per-sample weights.

    The reference materializes w[b] = scale*W*s[b,i]*d[b,o] per sample on the
    CPU (Util/network_util.py:106-165). Since w[b] is a rank-1 modulation of
    a shared kernel, mean_b w = scale * W * mean_b(d[b,o] s[b,i]), an [O,I]
    outer-product mean — a tiny matmul instead of an [N,O,I,k,k] tensor.
    Returns a list of [O, I, k, k] mean effective kernels.
    """
    styles = generator_modulation_styles(params, config, z)
    weights = [params["conv1"]["conv"]["weight"]]
    demods = [True]
    for i in range(len(params["convs"])):
        weights.append(params["convs"][str(i)]["conv"]["weight"])
        demods.append(True)
    last_rgb = str(len(params["to_rgbs"]) - 1)
    weights.append(params["to_rgbs"][last_rgb]["conv"]["weight"])
    demods.append(False)  # ToRGB never demodulates (reference model.py:377)

    outs = []
    for w5, s, demod in zip(weights, styles, demods):
        w = w5[0].astype(jnp.float32)  # [O, I, k, k]
        o, i_, k, _ = w.shape
        scale = 1.0 / math.sqrt(i_ * k * k)
        s = s.astype(jnp.float32)
        if demod:
            wsq = jnp.sum(jnp.square(w), axis=(2, 3))  # [O, I]
            sigma = (scale * scale) * (jnp.square(s) @ wsq.T) + 1e-8
            d = lax.rsqrt(sigma)  # [N, O]
            m = jnp.einsum("no,ni->oi", d, s) / s.shape[0]
        else:
            m = jnp.broadcast_to(jnp.mean(s, axis=0)[None, :], (o, i_))
        outs.append(scale * w * m[:, :, None, None])
    return outs


# ---------------------------------------------------------------------------
# Discriminator
# ---------------------------------------------------------------------------

def _conv_layer_init(key, in_ch, out_ch, k, *, downsample=False, bias=True,
                     activate=True):
    """ConvLayer (reference model.py:670-716). Param indices mirror the torch
    Sequential: with downsample the Blur occupies index 0 (buffer only), the
    conv sits at '1' and the activation at '2'; without, conv '0', act '1'."""
    conv_idx = "1" if downsample else "0"
    p = {conv_idx: _equal_conv2d_init(key, in_ch, out_ch, k,
                                      bias=bias and not activate)}
    if activate and bias:
        act_idx = "2" if downsample else "1"
        p[act_idx] = {"bias": jnp.zeros((out_ch,))}
    return p


def _conv_layer(p, x, k, *, downsample=False, bias=True, activate=True,
                blur_kernel=(1, 3, 3, 1), precision=None):
    if downsample:
        factor = 2
        pb = (len(blur_kernel) - factor) + (k - 1)
        x = blur(x, make_kernel(blur_kernel), pad=((pb + 1) // 2, pb // 2))
        out = _equal_conv2d(p["1"], x, stride=2, padding=0, precision=precision)
        act_idx = "2"
    else:
        out = _equal_conv2d(p["0"], x, stride=1, padding=k // 2, precision=precision)
        act_idx = "1"
    if activate:
        if bias:
            out = fused_leaky_relu(out, p[act_idx]["bias"].astype(out.dtype))
        else:
            out = scaled_leaky_relu(out)
    return out


def _packed_conv_layer(p, xp, k, blur_taps, *, downsample=False, bias=True,
                       activate=True, precision=None):
    """_conv_layer on a PACKED tensor (ops/packed.py): the blur+conv pair
    becomes one dense packed conv with the FIR folded into the statically
    gathered weights; bias/activation map channelwise (tiled by phase).
    Same math as _conv_layer to conv-order reassociation."""
    from ..ops.packed import packed_conv, tile_channel_vector

    conv_idx = "1" if downsample else "0"
    pw = p[conv_idx]["weight"]
    out_ch, in_ch, kk, _ = pw.shape
    scale = 1.0 / math.sqrt(in_ch * kk * kk)
    w = (pw * scale).astype(xp.dtype)
    w_hwio = jnp.transpose(w, (2, 3, 1, 0))
    if downsample:
        pb = (len(blur_taps) - 2) + (k - 1)
        out = packed_conv(xp, w_hwio, stride=2, pad=0, fir=blur_taps,
                          fir_pad=((pb + 1) // 2, pb // 2),
                          precision=precision)
        act_idx = "2"
    else:
        out = packed_conv(xp, w_hwio, stride=1, pad=k // 2,
                          precision=precision)
        act_idx = "1"
    if "bias" in p[conv_idx]:
        out = out + tile_channel_vector(
            p[conv_idx]["bias"]).astype(out.dtype)
    if activate:
        if bias:
            out = fused_leaky_relu(
                out, tile_channel_vector(p[act_idx]["bias"]).astype(out.dtype))
        else:
            out = scaled_leaky_relu(out)
    return out


def _packed_res_block(p, xp, blur_taps, precision=None):
    out = _packed_conv_layer(p["conv1"], xp, 3, blur_taps,
                             precision=precision)
    out = _packed_conv_layer(p["conv2"], out, 3, blur_taps, downsample=True,
                             precision=precision)
    skip = _packed_conv_layer(p["skip"], xp, 1, blur_taps, downsample=True,
                              activate=False, bias=False,
                              precision=precision)
    return (out + skip) / math.sqrt(2)


def _res_block_init(key, in_ch, out_ch):
    k1, k2, k3 = random.split(key, 3)
    return {
        "conv1": _conv_layer_init(k1, in_ch, in_ch, 3),
        "conv2": _conv_layer_init(k2, in_ch, out_ch, 3, downsample=True),
        "skip": _conv_layer_init(k3, in_ch, out_ch, 1, downsample=True,
                                 activate=False, bias=False),
    }


def _res_block(p, x, blur_kernel, precision=None):
    out = _conv_layer(p["conv1"], x, 3, blur_kernel=blur_kernel, precision=precision)
    out = _conv_layer(p["conv2"], out, 3, downsample=True,
                      blur_kernel=blur_kernel, precision=precision)
    skip = _conv_layer(p["skip"], x, 1, downsample=True, activate=False,
                       bias=False, blur_kernel=blur_kernel, precision=precision)
    return (out + skip) / math.sqrt(2)


def discriminator_init(key, config: DiscriminatorConfig) -> Params:
    ch = config.channels()
    keys = iter(random.split(key, config.log_size + 4))
    convs = {"0": _conv_layer_init(next(keys), 3, ch[config.size], 1)}
    in_ch = ch[config.size]
    idx = 1
    for i in range(config.log_size, 2, -1):
        out_ch = ch[2 ** (i - 1)]
        convs[str(idx)] = _res_block_init(next(keys), in_ch, out_ch)
        in_ch = out_ch
        idx += 1
    return {
        "convs": convs,
        "final_conv": _conv_layer_init(next(keys), in_ch + 1, ch[4], 3),
        "final_linear": {
            "0": _equal_linear_init(next(keys), ch[4] * 4 * 4, ch[4]),
            "1": _equal_linear_init(next(keys), ch[4], 1),
        },
    }


def _minibatch_stddev(x_nhwc, group_size, stddev_feat):
    """Minibatch stddev feature (reference model.py:780-791). The reference
    groups samples with stride B//group (a view(group, -1, ...) over dim 0),
    computes the biased std across the group and appends its mean as one
    constant channel per sample."""
    b, h, w, c = x_nhwc.shape
    group = min(b, group_size)
    m = b // group
    y = x_nhwc.reshape(group, m, h, w, stddev_feat, c // stddev_feat)
    y = y.astype(jnp.float32)
    var = jnp.var(y, axis=0)  # biased, over the group dim -> [m,H,W,feat,C/feat]
    std = jnp.sqrt(var + 1e-8)
    # mean over (C//feat, H, W), keeping one value per (m, feat)
    std = jnp.mean(std, axis=(1, 2, 4))  # mean over H, W, C//feat -> [m, feat]
    # sample b = g*m + j gets std[j] (torch .repeat(group,1,H,W) tiling)
    std = jnp.tile(std[None, :, :], (group, 1, 1)).reshape(b, stddev_feat)
    std = jnp.broadcast_to(std[:, None, None, :], (b, h, w, stddev_feat))
    return jnp.concatenate([x_nhwc, std.astype(x_nhwc.dtype)], axis=-1)


def discriminator_apply(params: Params, config: DiscriminatorConfig, image,
                        *, precision=None, dtype=None,
                        data_format: str = "NCHW", remat: bool = False,
                        packed: bool = False, packed_max_ch: int = 64):
    """Discriminator forward (reference model.py:780-798). Input NCHW by
    default; data_format="NHWC" consumes the TPU-native layout directly
    (the network is NHWC-internal either way).

    remat=True wraps each res-block in jax.checkpoint. This is what makes
    the R1 regularizer fit at 1024px: its grad-of-grad otherwise stores
    linearization residuals for every full-width D layer, and the low-C
    high-res ones ([B,1024,1024,32] bf16) pad 4x on the lane dim — the
    batch-4 OOM breakdown was dominated by exactly those buffers.

    packed=True runs the low-channel high-res trunk in space-to-depth
    layout (ops/packed.py): the image is packed once, every conv of a
    res-block whose input width is <= packed_max_ch executes as one dense
    packed conv (blur folded in), and the trunk unpacks where widths reach
    MXU/lane density. Exact same math; measured 3.3x on the 1024px C=32
    conv fwd+bwd (round-2 trace: 81% of 1024px device time was layout
    copies + conv fusions over these C<=64 tensors)."""
    x = image if data_format == "NHWC" else jnp.transpose(image, (0, 2, 3, 1))
    if dtype is not None:
        x = x.astype(dtype)
    bk = config.blur_kernel

    n_blocks = len(params["convs"]) - 1
    # static per-block packing decision from the param widths
    block_in_ch = [int(params["convs"][str(i)]["conv1"]["0"]["weight"].shape[1])
                   for i in range(1, n_blocks + 1)]
    blk_packed = [False] * (n_blocks + 1)
    if packed:
        for i in range(1, n_blocks + 1):
            # spatial size of block i's input: size / 2^(i-1); pack while the
            # width is lane-sparse and the packed grid stays >= 8
            res = config.size >> (i - 1)
            blk_packed[i] = (block_in_ch[i - 1] <= packed_max_ch
                             and res >= 32)
        # packing must be a contiguous PREFIX from block 1: the trunk packs
        # the image once up front and unpacks exactly once (below); a
        # packed block after an unpacked one would consume the wrong layout
        # (and `taps` is only bound on the packed entry path). D widths
        # normally grow with depth so qualifying blocks already form a
        # prefix; for non-monotone pruned widths cut at the first gap.
        for i in range(1, n_blocks + 1):
            if not blk_packed[i]:
                for j in range(i, n_blocks + 1):
                    blk_packed[j] = False
                break

    if packed and blk_packed[1]:
        from ..ops.packed import space_to_depth, packed_conv, \
            tile_channel_vector
        xp = space_to_depth(x)
        c0 = params["convs"]["0"]
        w0 = c0["0"]["weight"]
        scale0 = 1.0 / math.sqrt(w0.shape[1] * w0.shape[2] * w0.shape[3])
        out = packed_conv(
            xp, jnp.transpose((w0 * scale0).astype(xp.dtype), (2, 3, 1, 0)),
            stride=1, pad=0, precision=precision)
        x = fused_leaky_relu(
            out, tile_channel_vector(c0["1"]["bias"]).astype(out.dtype))
        taps = np.asarray(bk, np.float32)
        taps = taps / taps.sum()
    else:
        x = _conv_layer(params["convs"]["0"], x, 1, blur_kernel=bk,
                        precision=precision)

    for i in range(1, n_blocks + 1):
        if blk_packed[i]:
            fn = partial(_packed_res_block, blur_taps=taps,
                         precision=precision)
        else:
            fn = partial(_res_block, blur_kernel=bk, precision=precision)
        if remat:
            fn = jax.checkpoint(lambda p, x, fn=fn: fn(p, x))
        x = fn(params["convs"][str(i)], x)
        if blk_packed[i] and (i == n_blocks or not blk_packed[i + 1]):
            from ..ops.packed import depth_to_space
            x = depth_to_space(x)

    x = _minibatch_stddev(x, config.stddev_group, config.stddev_feat)
    x = _conv_layer(params["final_conv"], x, 3, blur_kernel=bk, precision=precision)

    # flatten in torch's NCHW order so final_linear weights are
    # checkpoint-compatible (reference model.py:795)
    b = x.shape[0]
    x = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, -1)
    x = _equal_linear(params["final_linear"]["0"], x, activation="fused_lrelu")
    x = _equal_linear(params["final_linear"]["1"], x)
    return x
