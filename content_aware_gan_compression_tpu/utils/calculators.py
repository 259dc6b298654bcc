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
