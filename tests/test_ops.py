"""Golden tests for the ops layer against independently-written oracles.

The oracle below implements the upfirdn2d spec from first principles with
plain numpy (zero-insert -> pad/crop -> correlate flipped kernel ->
stride-downsample) and torch.nn.functional for cross-checking; it is NOT
derived from the reference code, only from the documented semantics.
"""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from content_aware_gan_compression_tpu.ops import (
    upfirdn2d,
    make_kernel,
    upsample_2d,
    downsample_2d,
    blur,
    fused_leaky_relu,
    scaled_leaky_relu,
)


def upfirdn2d_numpy(x_nchw, kernel, up, down, pad):
    """Reference-free numpy oracle. x: [B,C,H,W], kernel: [kh,kw],
    pad: (px0, px1, py0, py1)."""
    b, c, h, w = x_nchw.shape
    kh, kw = kernel.shape
    px0, px1, py0, py1 = pad
    # 1. zero-insert upsample: zeros AFTER each sample
    up_h, up_w = h * up, w * up
    z = np.zeros((b, c, up_h, up_w), dtype=x_nchw.dtype)
    z[:, :, ::up, ::up] = x_nchw
    # 2. pad (negative crops)
    out = np.zeros(
        (b, c, up_h + py0 + py1, up_w + px0 + px1), dtype=x_nchw.dtype
    )
    ys, xs = max(py0, 0), max(px0, 0)
    src = z[
        :, :,
        max(-py0, 0): up_h - max(-py1, 0),
        max(-px0, 0): up_w - max(-px1, 0),
    ]
    out[:, :, ys: ys + src.shape[2], xs: xs + src.shape[3]] = src
    # 3. correlate with flipped kernel
    kf = kernel[::-1, ::-1]
    oh = out.shape[2] - kh + 1
    ow = out.shape[3] - kw + 1
    res = np.zeros((b, c, oh, ow), dtype=np.float64)
    for i in range(kh):
        for j in range(kw):
            res += kf[i, j] * out[:, :, i: i + oh, j: j + ow]
    # 4. downsample
    return res[:, :, ::down, ::down].astype(x_nchw.dtype)


def to_nhwc(x_nchw):
    return jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))


def from_nhwc(y):
    return np.transpose(np.asarray(y), (0, 3, 1, 2))


@pytest.mark.parametrize(
    "up,down,pad,k1d",
    [
        (1, 1, (2, 1), [1, 3, 3, 1]),      # blur (ModulatedConv upsample blur pads)
        (2, 1, (2, 1), [1, 3, 3, 1]),      # Upsample module
        (1, 2, (2, 2), [1, 3, 3, 1]),      # Downsample-path blur+stride
        (1, 2, (1, 1), [1, 3, 3, 1]),      # ConvLayer downsample blur
        (2, 1, (1, 1), [1, 3, 3, 1]),
        (1, 1, (1, 1), [1, 2, 1]),
        (4, 2, (3, 2), [1, 3, 3, 1]),      # exotic factors
        (1, 1, (-1, 2), [1, 3, 3, 1]),     # negative pad path
        (2, 1, (-1, -1), [1, 3, 3, 1]),    # negative pads with upsample
    ],
)
def test_upfirdn2d_matches_numpy_oracle(up, down, pad, k1d):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 12, 10).astype(np.float32)
    k = np.asarray(make_kernel(k1d))
    want = upfirdn2d_numpy(x, k, up, down, (pad[0], pad[1], pad[0], pad[1]))
    got = from_nhwc(upfirdn2d(to_nhwc(x), jnp.asarray(k), up=up, down=down, pad=pad))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_upfirdn2d_nchw_format():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 4, 8, 8).astype(np.float32)
    k = np.asarray(make_kernel([1, 3, 3, 1]))
    a = upfirdn2d(jnp.asarray(x), jnp.asarray(k), up=2, pad=(2, 1), data_format="NCHW")
    b = from_nhwc(upfirdn2d(to_nhwc(x), jnp.asarray(k), up=2, pad=(2, 1)))
    np.testing.assert_allclose(np.asarray(a), b, rtol=1e-6, atol=1e-6)


def test_upsample_downsample_shapes_and_values():
    rng = np.random.RandomState(2)
    x = rng.randn(1, 2, 8, 8).astype(np.float32)
    k = np.asarray(make_kernel([1, 3, 3, 1]))
    up = from_nhwc(upsample_2d(to_nhwc(x), jnp.asarray(k)))
    assert up.shape == (1, 2, 16, 16)
    # oracle: kernel*4, up=2, pad (2,1)
    want = upfirdn2d_numpy(x, k * 4, 2, 1, (2, 1, 2, 1))
    np.testing.assert_allclose(up, want, rtol=1e-5, atol=1e-5)

    down = from_nhwc(downsample_2d(to_nhwc(x), jnp.asarray(k)))
    assert down.shape == (1, 2, 4, 4)
    want = upfirdn2d_numpy(x, k, 1, 2, (1, 1, 1, 1))
    np.testing.assert_allclose(down, want, rtol=1e-5, atol=1e-5)


def test_upsample_of_constant_is_constant_in_interior():
    # factor^2-scaled normalized kernel reproduces a constant signal exactly
    # away from the boundary taps.
    x = np.ones((1, 1, 16, 16), dtype=np.float32)
    k = np.asarray(make_kernel([1, 3, 3, 1]))
    up = from_nhwc(upsample_2d(to_nhwc(x), jnp.asarray(k)))
    assert up.shape == (1, 1, 32, 32)
    np.testing.assert_allclose(up[:, :, 2:-2, 2:-2], 1.0, rtol=1e-5)


def test_upfirdn2d_gradients_match_torch():
    """First AND second order gradients vs a torch autograd oracle built on
    the same spec (zero-insert + pad + conv2d with flipped kernel)."""
    rng = np.random.RandomState(4)
    x_np = rng.randn(1, 2, 6, 6).astype(np.float32)
    k_np = np.asarray(make_kernel([1, 3, 3, 1]))
    up, down, pad = 2, 1, (2, 1)

    def torch_upfirdn(x):
        b, c, h, w = x.shape
        z = torch.zeros(b, c, h * up, w * up, dtype=x.dtype)
        z[:, :, ::up, ::up] = x
        z = F.pad(z, (pad[0], pad[1], pad[0], pad[1]))
        kf = torch.tensor(k_np[::-1, ::-1].copy()).view(1, 1, *k_np.shape)
        kf = kf.expand(c, 1, *k_np.shape)
        out = F.conv2d(z, kf, groups=c)
        return out[:, :, ::down, ::down]

    xt = torch.tensor(x_np, requires_grad=True)
    yt = torch_upfirdn(xt)
    loss_t = (yt ** 3).sum()
    (gt,) = torch.autograd.grad(loss_t, xt, create_graph=True)
    ggt = torch.autograd.grad(gt.sum(), xt)[0]

    def loss_j(x_nchw):
        y = upfirdn2d(
            jnp.transpose(x_nchw, (0, 2, 3, 1)), jnp.asarray(k_np),
            up=up, down=down, pad=pad)
        return (y ** 3).sum()

    gj = jax.grad(loss_j)(jnp.asarray(x_np))
    ggj = jax.grad(lambda x: jax.grad(loss_j)(x).sum())(jnp.asarray(x_np))

    np.testing.assert_allclose(np.asarray(gj), gt.detach().numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ggj), ggt.numpy(), rtol=1e-4, atol=1e-4)


def test_fused_leaky_relu_matches_torch():
    rng = np.random.RandomState(5)
    x = rng.randn(2, 7, 4, 4).astype(np.float32)  # NCHW for torch
    b = rng.randn(7).astype(np.float32)
    want = (
        F.leaky_relu(torch.tensor(x) + torch.tensor(b).view(1, 7, 1, 1), 0.2)
        * math.sqrt(2)
    ).numpy()
    got = fused_leaky_relu(
        jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)), jnp.asarray(b)
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want, rtol=1e-6, atol=1e-6
    )


def test_fused_leaky_relu_vector_and_no_bias():
    x = jnp.asarray([[1.0, -1.0], [0.5, -2.0]])
    b = jnp.asarray([0.0, 1.0])
    got = fused_leaky_relu(x, b)
    want = np.array([[1.0, 0.0], [0.5, -0.2]]) * math.sqrt(2)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)
    got2 = scaled_leaky_relu(x)
    want2 = np.array([[1.0, -0.2], [0.5, -0.4]]) * math.sqrt(2)
    np.testing.assert_allclose(np.asarray(got2), want2, rtol=1e-6)


def test_fused_leaky_relu_double_grad():
    x = jnp.asarray(np.random.RandomState(6).randn(3, 5).astype(np.float32))
    b = jnp.zeros((5,))

    def loss(x):
        return (fused_leaky_relu(x, b) ** 2).sum()

    g = jax.grad(loss)(x)
    gg = jax.grad(lambda x: jax.grad(loss)(x).sum())(x)
    # d/dx of (s*m*x)^2 = 2*s^2*m^2*x ; second grad = 2*s^2*m^2
    m = np.where(np.asarray(x) >= 0, 1.0, 0.2)
    np.testing.assert_allclose(np.asarray(g), 2 * 2 * m * m * np.asarray(x), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gg), 2 * 2 * m * m, rtol=1e-5)


def test_blur_shifted_add_matches_depthwise_conv():
    """Small-C blur dispatches to the shifted-add separable form
    (ops/upfirdn2d.py:_separable_shift_fir) — exact same math as the
    grouped-conv lowering, to any differentiation order."""
    import jax
    import jax.numpy as jnp
    from content_aware_gan_compression_tpu.ops import blur, make_kernel
    from content_aware_gan_compression_tpu.ops.upfirdn2d import (
        upfirdn2d, _rank1_taps)

    k = make_kernel((1, 3, 3, 1))
    assert _rank1_taps(k) is not None
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 17, 13, 8), jnp.float32)

    for pad, up_f in [((2, 1), 1), ((2, 2), 1), ((1, 1), 2)]:
        got = blur(x, k, pad=pad, upsample_factor=up_f)
        kern = k * float(up_f ** 2) if up_f > 1 else k
        want = upfirdn2d(x, kern, up=1, down=1, pad=pad)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def loss(x, fn):
        return jnp.sum(jnp.square(fn(x)))

    g1 = jax.grad(loss)(x, lambda t: blur(t, k, pad=(2, 1)))
    g2 = jax.grad(loss)(x, lambda t: upfirdn2d(t, k, pad=(2, 1)))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-6)
    # grad-of-grad (the R1/path-length regime)
    gg1 = jax.grad(lambda t: jnp.sum(jax.grad(loss)(t, lambda u: blur(
        u, k, pad=(2, 1))) ** 2))(x)
    gg2 = jax.grad(lambda t: jnp.sum(jax.grad(loss)(t, lambda u: upfirdn2d(
        u, k, pad=(2, 1))) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gg1), np.asarray(gg2),
                               rtol=1e-5, atol=1e-5)

    # large C stays on the depthwise-conv path (bitwise same function)
    xl = jnp.asarray(rng.randn(1, 9, 9, 128), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(blur(xl, k, pad=(2, 1))),
        np.asarray(upfirdn2d(xl, k, pad=(2, 1))))


def test_rank1_taps_rejects_asymmetric_separable():
    """blur's shifted-add fast path applies ONE tap vector on both axes; an
    asymmetric separable kernel (rank-1 but col != row) must fall back to
    the depthwise-conv path instead of silently blurring with wrong taps."""
    from content_aware_gan_compression_tpu.ops import blur
    from content_aware_gan_compression_tpu.ops.upfirdn2d import (
        upfirdn2d, _rank1_taps)

    k = np.outer([1.0, 2.0], [2.0, 1.0])
    k = jnp.asarray(k / k.sum(), jnp.float32)
    assert _rank1_taps(k) is None
    x = jnp.asarray(np.random.RandomState(0).randn(2, 9, 9, 8), jnp.float32)
    got = blur(x, k, pad=(1, 0))
    want = upfirdn2d(x, k, up=1, down=1, pad=(1, 0))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
