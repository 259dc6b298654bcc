"""Generator FLOPs accounting (reference Util/Calculators.py).

Same formulas and constants; operates on either a generator param pytree or
a net_shape tuple (widths ARE the model description here)."""

from __future__ import annotations

import numpy as np

MAP_SIZE = []
for _i in range(2, 11):
    _m = 2 ** _i
    MAP_SIZE += [_m, _m]

STYLE_CONV_KER_SIZE = 3
TORGB_CONV_KER_SIZE = 1
NUM_RGB_CHANNEL = 3
GENERATOR_FLOPS_256PX = 45_124_673_536   # reference Calculators.py:13
GENERATOR_FLOPS_1024PX = 74_266_894_336  # reference Calculators.py:14


def _net_shape(params_or_shape):
    if isinstance(params_or_shape, (tuple, list)):
        return list(params_or_shape)
    from ..models.stylegan2 import net_shape_from_params

    return list(net_shape_from_params(params_or_shape))


def styled_conv_flops(params_or_shape, return_detail=True):
    """Styled-conv FLOPs (reference Calculators.py:16-37)."""
    net_shape = _net_shape(params_or_shape)
    lay = [net_shape[i] * net_shape[i + 1] * STYLE_CONV_KER_SIZE ** 2
           * MAP_SIZE[i] ** 2 for i in range(len(net_shape) - 1)]
    return (sum(lay), lay) if return_detail else sum(lay)


def to_rgb_flops(params_or_shape, return_detail=True):
    """ToRGB conv FLOPs (reference Calculators.py:39-61)."""
    net_shape = _net_shape(params_or_shape)
    lst = [net_shape[2 * i + 1] * NUM_RGB_CHANNEL * TORGB_CONV_KER_SIZE ** 2
           * MAP_SIZE[2 * i + 1] ** 2 for i in range(len(net_shape) // 2)]
    return (sum(lst), lst) if return_detail else sum(lst)


def mapping_network_flops(params):
    """Style-MLP FLOPs from weight shapes (reference Calculators.py:63-77)."""
    total = 0
    for layer in params["style"].values():
        total += int(np.prod(layer["weight"].shape))
    return total


def style_modulation_flops(params):
    """Modulation affine FLOPs (reference Calculators.py:79-93)."""
    total = 0
    mods = [params["conv1"], params["to_rgb1"]]
    mods += list(params["convs"].values()) + list(params["to_rgbs"].values())
    for m in mods:
        total += int(np.prod(m["conv"]["modulation"]["weight"].shape))
    return total


def stylegan2_flops(params):
    """Total generator FLOPs (reference Calculators.py:95-105)."""
    return (styled_conv_flops(params, False) + to_rgb_flops(params, False)
            + mapping_network_flops(params) + style_modulation_flops(params))


def discriminator_flops(size: int, channel_multiplier: int = 2,
                        channel_max: int = 512):
    """Discriminator MAC count per image (TPU extension — the reference
    counts only generator FLOPs). Mirrors the architecture of
    models/stylegan2.discriminator_init: 1x1 stem, log2(size)-2 residual
    blocks (conv1 3x3 same-res, conv2 3x3 stride-2, 1x1 skip), minibatch
    stddev channel, final 3x3 conv + two linears."""
    from ..models.stylegan2 import default_channels

    ch = {k: min(v, channel_max) for k, v in
          default_channels(channel_multiplier).items()}
    total = 3 * ch[size] * size * size  # stem 1x1
    res = size
    in_ch = ch[size]
    while res > 4:
        out_ch = ch[res // 2]
        total += in_ch * in_ch * 9 * res * res          # conv1 3x3
        total += in_ch * out_ch * 9 * (res // 2) ** 2   # conv2 3x3 stride 2
        total += in_ch * out_ch * (res // 2) ** 2       # skip 1x1
        in_ch = out_ch
        res //= 2
    total += (in_ch + 1) * ch[4] * 9 * 16               # final_conv @4x4
    total += ch[4] * 16 * ch[4] + ch[4]                 # final linears
    return total
