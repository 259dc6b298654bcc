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


def vgg16_lpips_flops(input_size: int = 256):
    """MACs of ONE LPIPS forward pass (VGG16 features through relu5_3 plus
    the five 1x1 calibration heads) at input_size**2 — TPU extension used for
    MFU accounting of the KD-LPIPS objective (reference train.py:509-512,
    lpips/networks_basic.py:64-92). Per image, per branch; a student
    fwd+input-grad backward costs ~2x this, the teacher branch 1x."""
    from ..models.lpips import VGG16_CONVS, POOL_POSITIONS, SLICE_ENDS, \
        LPIPS_CHANNELS

    total = 0
    hw = input_size
    seq = 0
    slice_i = 0
    for idx, cin, cout in VGG16_CONVS:
        while seq in POOL_POSITIONS:
            hw //= 2
            seq += 1
        assert idx == seq, (idx, seq)
        total += cin * cout * 9 * hw * hw
        seq += 2
        if seq - 1 in SLICE_ENDS:
            # 1x1 linear head on the [C, hw, hw] slice output
            total += LPIPS_CHANNELS[slice_i] * hw * hw
            slice_i += 1
    return total


def bisenet_flops(input_size: int = 512):
    """MACs of one BiSeNet head-0 parse at input_size**2 (the reference's
    content-masking cost per G step, Util/content_aware_pruning.py:61-88) —
    live path only: ResNet-18 context path + ARM16/32 + FFM + the fused-head
    output; the two auxiliary heads are dead under argmax and DCE'd by XLA.
    Forward-only (the parse input is stop-gradiented teacher imagery)."""
    s2, s4 = input_size // 2, input_size // 4
    s8, s16, s32 = input_size // 8, input_size // 16, input_size // 32
    t = 3 * 64 * 49 * s2 * s2                       # conv1 7x7 stride 2
    t += 2 * 2 * 64 * 64 * 9 * s4 * s4              # layer1: 2 basic blocks

    def down_layer(cin, cout, res):
        # block0 (conv1 s2 + conv2 + 1x1 downsample) + block1 (2 convs)
        return (cin * cout * 9 * res * res + cout * cout * 9 * res * res
                + cin * cout * res * res + 2 * cout * cout * 9 * res * res)

    t += down_layer(64, 128, s8)                    # layer2 -> feat8
    t += down_layer(128, 256, s16)                  # layer3 -> feat16
    t += down_layer(256, 512, s32)                  # layer4 -> feat32
    t += 512 * 128                                  # conv_avg 1x1 @ 1x1
    t += 512 * 128 * 9 * s32 * s32 + 128 * 128      # arm32 conv + attention
    t += 128 * 128 * 9 * s16 * s16                  # conv_head32 @ feat16 res
    t += 256 * 128 * 9 * s16 * s16 + 128 * 128      # arm16 conv + attention
    t += 128 * 128 * 9 * s8 * s8                    # conv_head16 @ feat8 res
    t += 256 * 256 * s8 * s8 + 256 * 64 + 64 * 256  # FFM convblk + attens
    t += 256 * 256 * 9 * s8 * s8 + 256 * 19 * s8 * s8  # fused output head
    return t


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
