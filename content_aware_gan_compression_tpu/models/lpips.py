"""LPIPS perceptual distance (net-lin, VGG16) — JAX port.

Math parity with the reference's vendored lpips package (lpips/
networks_basic.py:27-110): scaling layer -> VGG16 features at
relu{1_2,2_2,3_3,4_3,5_3} -> per-layer unit-normalize over channels
(eps=1e-10, lpips/__init__.py:42-44) -> squared diff -> learned 1x1 heads ->
spatial mean -> sum over the 5 layers.

Weights: the 1x1 calibration heads ship in the reference repo
(lpips/weights/v0.1/vgg.pth) and import directly; the VGG16 backbone uses
torchvision's pretrained tensors (features.N.{weight,bias} schema) via
`import_vgg16_features` when a checkpoint is supplied — this environment has
no network egress, so callers must provide the file (or use random init for
smoke testing, which preserves the metric's structure but not its values).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, random

# torchvision vgg16 cfg 'D' conv layout: (features index, in_ch, out_ch)
VGG16_CONVS = [
    (0, 3, 64), (2, 64, 64),
    (5, 64, 128), (7, 128, 128),
    (10, 128, 256), (12, 256, 256), (14, 256, 256),
    (17, 256, 512), (19, 512, 512), (21, 512, 512),
    (24, 512, 512), (26, 512, 512), (28, 512, 512),
]
# features indices after which a slice output is captured (relu outputs)
SLICE_ENDS = (3, 8, 15, 22, 29)
# maxpool positions in the features sequence
POOL_POSITIONS = (4, 9, 16, 23)
LPIPS_CHANNELS = (64, 128, 256, 512, 512)

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv_bias(p, x, padding=1):
    out = lax.conv_general_dilated(
        x, jnp.transpose(p["weight"], (2, 3, 1, 0)).astype(x.dtype),
        window_strides=(1, 1),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p["bias"].astype(out.dtype)


def _maxpool2(x):
    return lax.reduce_window(x, -jnp.inf, lax.max,
                             (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def vgg16_features(params, img, data_format="NCHW"):
    """VGG16 slice features. Input: scaled images (after the LPIPS scaling
    layer), NCHW by default or NHWC (the trunk's native layout — NHWC input
    skips the layout copy). Returns 5 NHWC feature maps."""
    x = (jnp.transpose(img, (0, 2, 3, 1)) if data_format == "NCHW" else img)
    feats = []
    conv_i = 0
    seq = 0
    while len(feats) < len(SLICE_ENDS):
        if seq in POOL_POSITIONS:
            x = _maxpool2(x)
            seq += 1
            continue
        # conv + relu pair
        idx, _, _ = VGG16_CONVS[conv_i]
        assert idx == seq, (idx, seq)
        x = jax.nn.relu(_conv_bias(params[str(idx)], x))
        conv_i += 1
        seq += 2
        if seq - 1 in SLICE_ENDS:
            feats.append(x)
    return feats


def lpips_apply(params, in0, in1, *, normalize=False,
                spatial=False, ret_per_layer=False, dtype=None,
                data_format="NCHW"):
    """LPIPS(in0, in1). Inputs in [-1, 1] (or [0, 1] with normalize=True,
    matching PerceptualLoss.forward, lpips/__init__.py:26-40).
    Returns [N, 1, 1, 1] like the reference.

    dtype: compute dtype for the VGG trunk (the scaling layer stays f32).
    bfloat16 is the TPU fast path for the KD-LPIPS term; None keeps exact
    f32 (the CPU parity-test configuration).

    data_format: layout of in0/in1. "NHWC" is the zero-copy TPU path (the
    VGG trunk is NHWC-native); spatial=True heads are only defined for
    NCHW callers."""
    if normalize:
        in0 = 2 * in0 - 1
        in1 = 2 * in1 - 1
    ch_shape = ((1, 3, 1, 1) if data_format == "NCHW" else (1, 1, 1, 3))
    shift = jnp.asarray(_SHIFT).reshape(ch_shape)
    scale = jnp.asarray(_SCALE).reshape(ch_shape)
    x0 = (in0 - shift) / scale
    x1 = (in1 - shift) / scale
    if dtype is not None:
        x0, x1 = x0.astype(dtype), x1.astype(dtype)

    f0 = vgg16_features(params["vgg"], x0, data_format=data_format)
    f1 = vgg16_features(params["vgg"], x1, data_format=data_format)

    res = []
    for kk, (a, b) in enumerate(zip(f0, f1)):
        if dtype is not None:
            # the head math (unit-normalize = a 512-term reduction, squared
            # diff, calibration sum) runs f32 even on the bf16 fast path —
            # elementwise cost is negligible next to the conv trunk, and
            # bf16's 8-bit mantissa visibly degrades the normalization
            a, b = a.astype(jnp.float32), b.astype(jnp.float32)
        # unit-normalize over channels (NHWC last axis), eps=1e-10
        na = a / (jnp.sqrt(jnp.sum(jnp.square(a), axis=-1, keepdims=True)) + 1e-10)
        nb = b / (jnp.sqrt(jnp.sum(jnp.square(b), axis=-1, keepdims=True)) + 1e-10)
        diff = jnp.square(na - nb)
        w = params["lins"][str(kk)]["weight"]  # [1, C, 1, 1] torch layout
        head = jnp.sum(diff * w[:, :, 0, 0].astype(diff.dtype), axis=-1,
                       keepdims=True)  # 1x1 conv, no bias
        if spatial:
            res.append(head)
        else:
            res.append(jnp.mean(head, axis=(1, 2), keepdims=True))
    val = sum(res[1:], res[0])
    val = jnp.transpose(val, (0, 3, 1, 2))  # [N,1,1,1]
    if ret_per_layer:
        return val, res
    return val


def import_lpips_lins(path: str):
    """Import the reference's shipped calibration heads
    (lpips/weights/v0.1/vgg.pth; keys lin{k}.model.1.weight)."""
    from ..utils.checkpoint import load_torch_checkpoint

    sd = load_torch_checkpoint(path)
    lins = {}
    for k in range(5):
        w = np.asarray(sd[f"lin{k}.model.1.weight"])
        lins[str(k)] = {"weight": jnp.asarray(np.maximum(w, 0))}
        # NB: reference applies the raw weights; published weights are
        # non-negative already — keep them as-is if any are negative.
        if (w < 0).any():
            lins[str(k)]["weight"] = jnp.asarray(w)
    return lins


def import_vgg16_features(path: str):
    """Import torchvision vgg16 weights ('features.N.weight') or a bare
    features state dict ('N.weight')."""
    from ..utils.checkpoint import load_torch_checkpoint

    sd = load_torch_checkpoint(path)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    params = {}
    for idx, _, _ in VGG16_CONVS:
        for name in ("weight", "bias"):
            key = f"features.{idx}.{name}"
            if key not in sd:
                key = f"{idx}.{name}"
            params.setdefault(str(idx), {})[name] = jnp.asarray(np.asarray(sd[key]))
    return params


def lpips_init(key, lins_path: str | None = None, width_scale: float = 1.0):
    """Random-backbone LPIPS params (tests / smoke). If `lins_path` is given
    the real calibration heads are used on top of the random backbone.
    width_scale < 1 shrinks every VGG channel count (floor 4, topology
    unchanged — lpips_apply reads widths from the arrays); for sharding
    dryruns where a full-width compile is too slow on a 1-core host."""
    def w(c):
        return c if c == 3 else max(4, int(c * width_scale))

    vgg = {}
    for idx, cin, cout in VGG16_CONVS:
        key, sub = random.split(key)
        fan = w(cin) * 9
        vgg[str(idx)] = {
            "weight": random.normal(sub, (w(cout), w(cin), 3, 3))
            * math.sqrt(2.0 / fan),
            "bias": jnp.zeros((w(cout),)),
        }
    if lins_path:
        lins = import_lpips_lins(lins_path)
    else:
        lins = {str(k): {"weight": jnp.full((1, w(c), 1, 1), 1.0 / w(c))}
                for k, c in enumerate(LPIPS_CHANNELS)}
    return {"vgg": vgg, "lins": lins}


def load_lpips(vgg_path: str | None, lins_path: str):
    """Full LPIPS params from checkpoints. vgg_path=None -> error with a
    clear message (no egress in this environment)."""
    if vgg_path is None:
        raise FileNotFoundError(
            "LPIPS needs torchvision vgg16 weights; pass --lpips_vgg_ckpt "
            "(no network egress is available to download them)")
    return {"vgg": import_vgg16_features(vgg_path),
            "lins": import_lpips_lins(lins_path)}
