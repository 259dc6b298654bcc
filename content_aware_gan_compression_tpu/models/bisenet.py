"""BiSeNet face parser (19 classes) — JAX inference port.

Architecture parity with reference Util/face_parsing/BiSeNet.py:230-254
(ResNet-18 context path + ARM16/ARM32 + FFM + three output heads; the
spatial path is replaced by the res8 feature, as in the reference). Used
eval-only, so batch norm folds into a scale/shift — the reference's vestigial
inplace-ABN CUDA extension (SURVEY.md section 2.1) needs no equivalent.

Param pytrees mirror the torch state-dict key paths so the published
79999_iter.pth checkpoint imports directly via
utils.checkpoint.torch_state_dict_to_pytree.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, random

N_CLASSES = 19


# ---------------------------------------------------------------------------
# primitives (NHWC internally)
# ---------------------------------------------------------------------------

def _conv(p_w, x, stride=1, padding=0):
    """No-bias conv, torch OIHW weight."""
    return lax.conv_general_dilated(
        x, jnp.transpose(p_w, (2, 3, 1, 0)).astype(x.dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _bn(p, x, eps=1e-5):
    """Eval-mode batch norm folded to scale/shift."""
    scale = p["weight"] * lax.rsqrt(p["running_var"] + eps)
    shift = p["bias"] - p["running_mean"] * scale
    return x * scale.astype(x.dtype) + shift.astype(x.dtype)


def _conv_bn_relu(p, x, stride=1, padding=1):
    return jax.nn.relu(_bn(p["bn"], _conv(p["conv"]["weight"], x, stride, padding)))


def _maxpool_3x3_s2_p1(x):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))


def _global_avg_pool(x):
    return jnp.mean(x, axis=(1, 2), keepdims=True)


def _nearest_resize(x, h, w):
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, h, w, c), method="nearest")


def _bilinear_align_corners(x, h, w):
    """torch F.interpolate(mode='bilinear', align_corners=True)."""
    b, ih, iw, c = x.shape

    def axis_weights(out_n, in_n):
        if out_n == 1 or in_n == 1:
            idx0 = np.zeros(out_n, np.int32)
            return idx0, idx0, np.zeros(out_n, np.float32)
        pos = np.arange(out_n) * (in_n - 1) / (out_n - 1)
        lo = np.floor(pos).astype(np.int32)
        hi = np.minimum(lo + 1, in_n - 1)
        frac = (pos - lo).astype(np.float32)
        return lo, hi, frac

    ylo, yhi, yf = axis_weights(h, ih)
    xlo, xhi, xf = axis_weights(w, iw)
    yf = jnp.asarray(yf)[None, :, None, None].astype(x.dtype)
    xf = jnp.asarray(xf)[None, None, :, None].astype(x.dtype)
    top = x[:, ylo][:, :, xlo] * (1 - xf) + x[:, ylo][:, :, xhi] * xf
    bot = x[:, yhi][:, :, xlo] * (1 - xf) + x[:, yhi][:, :, xhi] * xf
    return top * (1 - yf) + bot * yf


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------

def _basic_block(p, x, stride=1):
    r = jax.nn.relu(_bn(p["bn1"], _conv(p["conv1"]["weight"], x, stride, 1)))
    r = _bn(p["bn2"], _conv(p["conv2"]["weight"], r, 1, 1))
    if "downsample" in p:
        x = _bn(p["downsample"]["1"], _conv(p["downsample"]["0"]["weight"], x, stride, 0))
    return jax.nn.relu(x + r)


def _resnet18(p, x):
    x = jax.nn.relu(_bn(p["bn1"], _conv(p["conv1"]["weight"], x, 2, 3)))
    x = _maxpool_3x3_s2_p1(x)
    for blk in ("0", "1"):
        x = _basic_block(p["layer1"][blk], x)
    x = _basic_block(p["layer2"]["0"], x, stride=2)
    x = _basic_block(p["layer2"]["1"], x)
    feat8 = x
    x = _basic_block(p["layer3"]["0"], x, stride=2)
    x = _basic_block(p["layer3"]["1"], x)
    feat16 = x
    x = _basic_block(p["layer4"]["0"], x, stride=2)
    x = _basic_block(p["layer4"]["1"], x)
    return feat8, feat16, x


def _arm(p, x):
    feat = _conv_bn_relu(p["conv"], x)
    atten = _global_avg_pool(feat)
    atten = _conv(p["conv_atten"]["weight"], atten)
    atten = jax.nn.sigmoid(_bn(p["bn_atten"], atten))
    return feat * atten


def _context_path(p, x):
    feat8, feat16, feat32 = _resnet18(p["resnet"], x)
    h16, w16 = feat16.shape[1:3]
    h8, w8 = feat8.shape[1:3]
    h32, w32 = feat32.shape[1:3]

    avg = _conv_bn_relu(p["conv_avg"], _global_avg_pool(feat32), padding=0)
    avg_up = _nearest_resize(avg, h32, w32)

    feat32_sum = _arm(p["arm32"], feat32) + avg_up
    feat32_up = _nearest_resize(feat32_sum, h16, w16)
    feat32_up = _conv_bn_relu(p["conv_head32"], feat32_up)

    feat16_sum = _arm(p["arm16"], feat16) + feat32_up
    feat16_up = _nearest_resize(feat16_sum, h8, w8)
    feat16_up = _conv_bn_relu(p["conv_head16"], feat16_up)
    return feat8, feat16_up, feat32_up


def _ffm(p, fsp, fcp):
    feat = _conv_bn_relu(p["convblk"], jnp.concatenate([fsp, fcp], axis=-1),
                         padding=0)
    atten = _global_avg_pool(feat)
    atten = jax.nn.relu(_conv(p["conv1"]["weight"], atten))
    atten = jax.nn.sigmoid(_conv(p["conv2"]["weight"], atten))
    return feat * atten + feat


def _output_head(p, x):
    x = _conv_bn_relu(p["conv"], x)
    return _conv(p["conv_out"]["weight"], x)


def bisenet_apply_nhwc(params, img_nhwc):
    """NHWC-native BiSeNet forward — the layout the net already computes in.
    Input: ImageNet-normalized [N,H,W,3]. Returns 3 logits heads, each
    [N,H,W,19]. The TPU-native KD path (train/losses.py, data_format NHWC)
    calls this directly so the big C=3 images never pay a layout copy."""
    h, w = img_nhwc.shape[1:3]
    feat_res8, feat_cp8, feat_cp16 = _context_path(params["cp"], img_nhwc)
    feat_fuse = _ffm(params["ffm"], feat_res8, feat_cp8)

    out = _output_head(params["conv_out"], feat_fuse)
    out16 = _output_head(params["conv_out16"], feat_cp8)
    out32 = _output_head(params["conv_out32"], feat_cp16)

    return tuple(_bilinear_align_corners(o, h, w)
                 for o in (out, out16, out32))


def bisenet_apply(params, img_nchw):
    """BiSeNet forward (reference BiSeNet.py:241-254). Input: ImageNet-
    normalized [N,3,H,W]. Returns 3 logits heads, each [N,19,H,W]."""
    x = jnp.transpose(img_nchw, (0, 2, 3, 1))
    outs = bisenet_apply_nhwc(params, x)
    return tuple(jnp.transpose(o, (0, 3, 1, 2)) for o in outs)


def make_parse_fn(params):
    """Head-0 logits fn for pruning.content_aware.batch_img_parsing."""
    def parse_fn(normalized_nchw):
        return bisenet_apply(params, normalized_nchw)[0]
    return parse_fn


def load_bisenet(path: str):
    """Import the reference's pretrained BiSeNet checkpoint
    (Util/face_parsing/pretrained_model/79999_iter.pth)."""
    from ..utils.checkpoint import load_torch_checkpoint, torch_state_dict_to_pytree

    sd = load_torch_checkpoint(path)
    sd = {k: v for k, v in sd.items() if not k.endswith("num_batches_tracked")}
    return torch_state_dict_to_pytree(sd)


# ---------------------------------------------------------------------------
# random init (structure-complete; used for tests — real use imports weights)
# ---------------------------------------------------------------------------

def _init_conv(key, o, i, k):
    fan = i * k * k
    return {"weight": random.normal(key, (o, i, k, k)) * math.sqrt(2.0 / fan)}


def _init_bn(c):
    return {"weight": jnp.ones((c,)), "bias": jnp.zeros((c,)),
            "running_mean": jnp.zeros((c,)), "running_var": jnp.ones((c,))}


def _init_cbr(key, i, o, k=3):
    return {"conv": _init_conv(key, o, i, k), "bn": _init_bn(o)}


def _init_block(key, i, o, stride):
    k1, k2, k3 = random.split(key, 3)
    p = {"conv1": _init_conv(k1, o, i, 3), "bn1": _init_bn(o),
         "conv2": _init_conv(k2, o, o, 3), "bn2": _init_bn(o)}
    if i != o or stride != 1:
        p["downsample"] = {"0": _init_conv(k3, o, i, 1), "1": _init_bn(o)}
    return p


def bisenet_init(key, n_classes: int = N_CLASSES, width_scale: float = 1.0):
    """Random BiSeNet params. width_scale < 1 shrinks every internal channel
    count (floor 4) while keeping the exact module topology — the apply fn
    reads all widths from the arrays, so a scaled tree runs unchanged. Used
    by sharding dryruns where a full-width compile would blow the 1-core
    host's budget; real use imports the trained 79999_iter.pth."""
    def w(c):
        return max(4, int(c * width_scale))

    ks = iter(random.split(key, 32))
    resnet = {
        "conv1": _init_conv(next(ks), w(64), 3, 7), "bn1": _init_bn(w(64)),
        "layer1": {"0": _init_block(next(ks), w(64), w(64), 1),
                   "1": _init_block(next(ks), w(64), w(64), 1)},
        "layer2": {"0": _init_block(next(ks), w(64), w(128), 2),
                   "1": _init_block(next(ks), w(128), w(128), 1)},
        "layer3": {"0": _init_block(next(ks), w(128), w(256), 2),
                   "1": _init_block(next(ks), w(256), w(256), 1)},
        "layer4": {"0": _init_block(next(ks), w(256), w(512), 2),
                   "1": _init_block(next(ks), w(512), w(512), 1)},
    }
    cp = {
        "resnet": resnet,
        "arm16": {"conv": _init_cbr(next(ks), w(256), w(128)),
                  "conv_atten": _init_conv(next(ks), w(128), w(128), 1),
                  "bn_atten": _init_bn(w(128))},
        "arm32": {"conv": _init_cbr(next(ks), w(512), w(128)),
                  "conv_atten": _init_conv(next(ks), w(128), w(128), 1),
                  "bn_atten": _init_bn(w(128))},
        "conv_head32": _init_cbr(next(ks), w(128), w(128)),
        "conv_head16": _init_cbr(next(ks), w(128), w(128)),
        "conv_avg": _init_cbr(next(ks), w(512), w(128), k=1),
    }
    return {
        "cp": cp,
        "ffm": {"convblk": _init_cbr(next(ks), w(256), w(256), k=1),
                "conv1": _init_conv(next(ks), w(64), w(256), 1),
                "conv2": _init_conv(next(ks), w(256), w(64), 1)},
        "conv_out": {"conv": _init_cbr(next(ks), w(256), w(256)),
                     "conv_out": _init_conv(next(ks), n_classes, w(256), 1)},
        "conv_out16": {"conv": _init_cbr(next(ks), w(128), w(64)),
                       "conv_out": _init_conv(next(ks), n_classes, w(64), 1)},
        "conv_out32": {"conv": _init_cbr(next(ks), w(128), w(64)),
                       "conv_out": _init_conv(next(ks), n_classes, w(64), 1)},
    }
