"""FID InceptionV3 (pool3 features) — JAX port of the TF-ported FID network
(reference Evaluation/inception.py:16-310).

Structure parity with `fid_inception_v3` (inception.py:166-190): torchvision
InceptionV3 stem + Mixed blocks with the FID patches — count_include_pad=False
average pools in InceptionA/C/E_1 and a MAX pool in the Mixed_7c branch_pool
(inception.py:302-307). Input pipeline matches InceptionV3.forward
(inception.py:129-163): bilinear resize to 299 (align_corners=False) and an
optional 2x-1 rescale (`normalize_input`, the wrapper's [0,1]->[-1,1] mode).
NOTE the reference FID pipeline constructs the net via
load_patched_inception_v3 with normalize_input=False (calc_inception.py:54)
and feeds [-1,1] StyleGAN images straight in (Evaluation/fid.py:32-33) — so
every FID caller here (evaluation/fid.py) passes normalize_input=False; the
prestored real statistics were computed under the same raw-[-1,1] regime.

Weights import from the pytorch-fid release checkpoint
(pt_inception-2015-12-05-6726825d.pth) via `load_fid_inception`; the file
must be provided locally (no egress).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, random

POOL3_DIM = 2048


# ---------------------------------------------------------------------------
# primitives (NHWC)
# ---------------------------------------------------------------------------

def _basic_conv(p, x, stride=1, padding=(0, 0)):
    """BasicConv2d: bias-free conv + BN(eps=0.001) + relu."""
    if isinstance(padding, int):
        padding = (padding, padding)
    out = lax.conv_general_dilated(
        x, jnp.transpose(p["conv"]["weight"], (2, 3, 1, 0)).astype(x.dtype),
        window_strides=(stride, stride),
        padding=(
            (padding[0], padding[0]), (padding[1], padding[1])),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    bn = p["bn"]
    scale = bn["weight"] * lax.rsqrt(bn["running_var"] + 1e-3)
    shift = bn["bias"] - bn["running_mean"] * scale
    return jax.nn.relu(out * scale.astype(out.dtype) + shift.astype(out.dtype))


def _maxpool(x, k=3, s=2, p=0):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, k, k, 1), (1, s, s, 1),
                             ((0, 0), (p, p), (p, p), (0, 0)))


def _avgpool_excl_pad(x, k=3, s=1, p=1):
    """avg_pool(count_include_pad=False): sum pool / valid-element count."""
    sums = lax.reduce_window(x, 0.0, lax.add, (1, k, k, 1), (1, s, s, 1),
                             ((0, 0), (p, p), (p, p), (0, 0)))
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    counts = lax.reduce_window(ones, 0.0, lax.add, (1, k, k, 1), (1, s, s, 1),
                               ((0, 0), (p, p), (p, p), (0, 0)))
    return sums / counts


def _cat(xs):
    return jnp.concatenate(xs, axis=-1)


# ---------------------------------------------------------------------------
# blocks (param schemas mirror torchvision inception_v3 state-dict names)
# ---------------------------------------------------------------------------

def _inception_a(p, x):
    b1 = _basic_conv(p["branch1x1"], x)
    b5 = _basic_conv(p["branch5x5_2"], _basic_conv(p["branch5x5_1"], x), padding=2)
    b3 = _basic_conv(p["branch3x3dbl_1"], x)
    b3 = _basic_conv(p["branch3x3dbl_2"], b3, padding=1)
    b3 = _basic_conv(p["branch3x3dbl_3"], b3, padding=1)
    bp = _basic_conv(p["branch_pool"], _avgpool_excl_pad(x))
    return _cat([b1, b5, b3, bp])


def _inception_b(p, x):  # Mixed_6a
    b3 = _basic_conv(p["branch3x3"], x, stride=2)
    d = _basic_conv(p["branch3x3dbl_1"], x)
    d = _basic_conv(p["branch3x3dbl_2"], d, padding=1)
    d = _basic_conv(p["branch3x3dbl_3"], d, stride=2)
    return _cat([b3, d, _maxpool(x)])


def _inception_c(p, x):
    b1 = _basic_conv(p["branch1x1"], x)
    b7 = _basic_conv(p["branch7x7_1"], x)
    b7 = _basic_conv(p["branch7x7_2"], b7, padding=(0, 3))
    b7 = _basic_conv(p["branch7x7_3"], b7, padding=(3, 0))
    d = _basic_conv(p["branch7x7dbl_1"], x)
    d = _basic_conv(p["branch7x7dbl_2"], d, padding=(3, 0))
    d = _basic_conv(p["branch7x7dbl_3"], d, padding=(0, 3))
    d = _basic_conv(p["branch7x7dbl_4"], d, padding=(3, 0))
    d = _basic_conv(p["branch7x7dbl_5"], d, padding=(0, 3))
    bp = _basic_conv(p["branch_pool"], _avgpool_excl_pad(x))
    return _cat([b1, b7, d, bp])


def _inception_d(p, x):  # Mixed_7a
    b3 = _basic_conv(p["branch3x3_2"], _basic_conv(p["branch3x3_1"], x), stride=2)
    b7 = _basic_conv(p["branch7x7x3_1"], x)
    b7 = _basic_conv(p["branch7x7x3_2"], b7, padding=(0, 3))
    b7 = _basic_conv(p["branch7x7x3_3"], b7, padding=(3, 0))
    b7 = _basic_conv(p["branch7x7x3_4"], b7, stride=2)
    return _cat([b3, b7, _maxpool(x)])


def _inception_e(p, x, *, pool: str):
    b1 = _basic_conv(p["branch1x1"], x)
    b3 = _basic_conv(p["branch3x3_1"], x)
    b3 = _cat([
        _basic_conv(p["branch3x3_2a"], b3, padding=(0, 1)),
        _basic_conv(p["branch3x3_2b"], b3, padding=(1, 0)),
    ])
    d = _basic_conv(p["branch3x3dbl_1"], x)
    d = _basic_conv(p["branch3x3dbl_2"], d, padding=1)
    d = _cat([
        _basic_conv(p["branch3x3dbl_3a"], d, padding=(0, 1)),
        _basic_conv(p["branch3x3dbl_3b"], d, padding=(1, 0)),
    ])
    if pool == "avg":       # FIDInceptionE_1
        bp = _avgpool_excl_pad(x)
    else:                   # FIDInceptionE_2: max pool (inception.py:302-307)
        bp = _maxpool(x, 3, 1, 1)
    bp = _basic_conv(p["branch_pool"], bp)
    return _cat([b1, b3, d, bp])


def inception_pool3(params, img_nchw, *, resize_input=True,
                    normalize_input=True):
    """[N,3,H,W] -> pool3 features [N,2048] (blocks 0-3 of reference
    InceptionV3, inception.py:84-124)."""
    x = img_nchw
    if resize_input:
        n, c = x.shape[0], x.shape[1]
        # antialias=False == torch F.interpolate(bilinear,
        # align_corners=False) (reference inception.py:110-116); identical
        # for the 256->299 upscale, parity-critical for 512/1024px inputs.
        x = jax.image.resize(x, (n, c, 299, 299), method="bilinear",
                             antialias=False)
    if normalize_input:
        x = 2 * x - 1
    x = jnp.transpose(x, (0, 2, 3, 1))

    x = _basic_conv(params["Conv2d_1a_3x3"], x, stride=2)
    x = _basic_conv(params["Conv2d_2a_3x3"], x)
    x = _basic_conv(params["Conv2d_2b_3x3"], x, padding=1)
    x = _maxpool(x)
    x = _basic_conv(params["Conv2d_3b_1x1"], x)
    x = _basic_conv(params["Conv2d_4a_3x3"], x)
    x = _maxpool(x)
    x = _inception_a(params["Mixed_5b"], x)
    x = _inception_a(params["Mixed_5c"], x)
    x = _inception_a(params["Mixed_5d"], x)
    x = _inception_b(params["Mixed_6a"], x)
    x = _inception_c(params["Mixed_6b"], x)
    x = _inception_c(params["Mixed_6c"], x)
    x = _inception_c(params["Mixed_6d"], x)
    x = _inception_c(params["Mixed_6e"], x)
    x = _inception_d(params["Mixed_7a"], x)
    x = _inception_e(params["Mixed_7b"], x, pool="avg")
    x = _inception_e(params["Mixed_7c"], x, pool="max")
    return jnp.mean(x, axis=(1, 2))  # adaptive avg pool to 1x1


def load_fid_inception(path: str):
    """Import the pytorch-fid checkpoint (or torchvision inception_v3 sd)."""
    from ..utils.checkpoint import load_torch_checkpoint, torch_state_dict_to_pytree

    sd = load_torch_checkpoint(path)
    sd = {k: v for k, v in sd.items()
          if not k.endswith("num_batches_tracked")
          and not k.startswith(("fc.", "AuxLogits."))}
    return torch_state_dict_to_pytree(sd)


# ---------------------------------------------------------------------------
# structure-complete random init (tests; real FID requires imported weights)
# ---------------------------------------------------------------------------

def _init_bc(key, cin, cout, kh, kw=None):
    kw = kh if kw is None else kw
    fan = cin * kh * kw
    return {
        "conv": {"weight": random.normal(key, (cout, cin, kh, kw))
                 * math.sqrt(2.0 / fan)},
        "bn": {"weight": jnp.ones((cout,)), "bias": jnp.zeros((cout,)),
               "running_mean": jnp.zeros((cout,)),
               "running_var": jnp.ones((cout,))},
    }


def inception_init(key, width_scale: float = 1.0):
    """Random InceptionV3 params (tests / dryruns; real FID imports weights).
    width_scale < 1 shrinks every internal channel count (floor 4, topology
    unchanged — inception_pool3 reads all widths from the arrays; the
    feature dim then comes from pool3_dim(params), not POOL3_DIM). Pick a
    scale that divides every width exactly (1/2, 1/4, 1/8) or concat-fed
    input widths stop matching their producers' floored sums."""
    def w(c):
        return c if c == 3 else max(4, int(c * width_scale))

    def bc(key, cin, cout, kh, kw=None):
        return _init_bc(key, w(cin), w(cout), kh, kw)

    ks = iter(random.split(key, 128))

    def a_block(cin, pool):
        return {
            "branch1x1": bc(next(ks), cin, 64, 1),
            "branch5x5_1": bc(next(ks), cin, 48, 1),
            "branch5x5_2": bc(next(ks), 48, 64, 5),
            "branch3x3dbl_1": bc(next(ks), cin, 64, 1),
            "branch3x3dbl_2": bc(next(ks), 64, 96, 3),
            "branch3x3dbl_3": bc(next(ks), 96, 96, 3),
            "branch_pool": bc(next(ks), cin, pool, 1),
        }

    def c_block(c7):
        return {
            "branch1x1": bc(next(ks), 768, 192, 1),
            "branch7x7_1": bc(next(ks), 768, c7, 1),
            "branch7x7_2": bc(next(ks), c7, c7, 1, 7),
            "branch7x7_3": bc(next(ks), c7, 192, 7, 1),
            "branch7x7dbl_1": bc(next(ks), 768, c7, 1),
            "branch7x7dbl_2": bc(next(ks), c7, c7, 7, 1),
            "branch7x7dbl_3": bc(next(ks), c7, c7, 1, 7),
            "branch7x7dbl_4": bc(next(ks), c7, c7, 7, 1),
            "branch7x7dbl_5": bc(next(ks), c7, 192, 1, 7),
            "branch_pool": bc(next(ks), 768, 192, 1),
        }

    def e_block(cin):
        return {
            "branch1x1": bc(next(ks), cin, 320, 1),
            "branch3x3_1": bc(next(ks), cin, 384, 1),
            "branch3x3_2a": bc(next(ks), 384, 384, 1, 3),
            "branch3x3_2b": bc(next(ks), 384, 384, 3, 1),
            "branch3x3dbl_1": bc(next(ks), cin, 448, 1),
            "branch3x3dbl_2": bc(next(ks), 448, 384, 3),
            "branch3x3dbl_3a": bc(next(ks), 384, 384, 1, 3),
            "branch3x3dbl_3b": bc(next(ks), 384, 384, 3, 1),
            "branch_pool": bc(next(ks), cin, 192, 1),
        }

    return {
        "Conv2d_1a_3x3": bc(next(ks), 3, 32, 3),
        "Conv2d_2a_3x3": bc(next(ks), 32, 32, 3),
        "Conv2d_2b_3x3": bc(next(ks), 32, 64, 3),
        "Conv2d_3b_1x1": bc(next(ks), 64, 80, 1),
        "Conv2d_4a_3x3": bc(next(ks), 80, 192, 3),
        "Mixed_5b": a_block(192, 32),
        "Mixed_5c": a_block(256, 64),
        "Mixed_5d": a_block(288, 64),
        "Mixed_6a": {
            "branch3x3": bc(next(ks), 288, 384, 3),
            "branch3x3dbl_1": bc(next(ks), 288, 64, 1),
            "branch3x3dbl_2": bc(next(ks), 64, 96, 3),
            "branch3x3dbl_3": bc(next(ks), 96, 96, 3),
        },
        "Mixed_6b": c_block(128),
        "Mixed_6c": c_block(160),
        "Mixed_6d": c_block(160),
        "Mixed_6e": c_block(192),
        "Mixed_7a": {
            "branch3x3_1": bc(next(ks), 768, 192, 1),
            "branch3x3_2": bc(next(ks), 192, 320, 3),
            "branch7x7x3_1": bc(next(ks), 768, 192, 1),
            "branch7x7x3_2": bc(next(ks), 192, 192, 1, 7),
            "branch7x7x3_3": bc(next(ks), 192, 192, 7, 1),
            "branch7x7x3_4": bc(next(ks), 192, 192, 3),
        },
        "Mixed_7b": e_block(1280),
        "Mixed_7c": e_block(2048),
    }


def pool3_dim(params) -> int:
    """Feature dim of inception_pool3 for THESE params (2048 at full width;
    smaller for width-scaled dryrun trees): the Mixed_7c concat width."""
    b = params["Mixed_7c"]
    return int(sum(b[k]["conv"]["weight"].shape[0] for k in (
        "branch1x1", "branch3x3_2a", "branch3x3_2b",
        "branch3x3dbl_3a", "branch3x3dbl_3b", "branch_pool")))
