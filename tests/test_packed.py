"""Parity tests for packed (space-to-depth trunk) execution.

Covers ops/packed.py against the production unpacked forms it replaces
(stylegan2.py conv/blur compositions; reference model.py:106-142, 190-283,
670-716): values, gradients, and grad-of-grad (the R1 regime), plus the
packed discriminator end to end.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax, random

from content_aware_gan_compression_tpu.ops import (
    blur, make_kernel, upsample_2d)
from content_aware_gan_compression_tpu.ops.packed import (
    space_to_depth, depth_to_space, packed_conv, packed_conv_up,
    packed_upfirdn_up2, tile_channel_vector, pack_noise)

DN = ("NHWC", "HWIO", "NHWC")
K1D = np.array([1.0, 3.0, 3.0, 1.0])
K1D = K1D / K1D.sum()
K2D = make_kernel((1, 3, 3, 1))


def _conv(x, w, stride, pad):
    return lax.conv_general_dilated(x, w, (stride, stride), pad,
                                    dimension_numbers=DN)


def test_space_to_depth_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 3), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(depth_to_space(space_to_depth(x))), np.asarray(x))


def test_packed_conv_matches_unpacked():
    """s1 k3/k1 convs and the blur+s2 downsample pair (D's three conv
    forms, stylegan2.py:_conv_layer) in packed layout: same values."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 16, 5), jnp.float32)
    xp = space_to_depth(x)
    w3 = jnp.asarray(rng.randn(3, 3, 5, 7), jnp.float32) * 0.3
    w1 = jnp.asarray(rng.randn(1, 1, 5, 7), jnp.float32) * 0.3

    want = _conv(x, w3, 1, ((1, 1), (1, 1)))
    got = depth_to_space(packed_conv(xp, w3, stride=1, pad=1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=1e-6)

    want = _conv(x, w1, 1, ((0, 0), (0, 0)))
    got = depth_to_space(packed_conv(xp, w1, stride=1, pad=0))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=1e-6)

    # D downsample: blur pad(2,2) then k3 s2 pad0; skip: blur(1,1) + k1 s2
    want = _conv(blur(x, K2D, pad=(2, 2)), w3, 2, ((0, 0), (0, 0)))
    got = depth_to_space(packed_conv(xp, w3, stride=2, pad=0,
                                     fir=K1D, fir_pad=(2, 2)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=1e-6)

    want = _conv(blur(x, K2D, pad=(1, 1)), w1, 2, ((0, 0), (0, 0)))
    got = depth_to_space(packed_conv(xp, w1, stride=2, pad=0,
                                     fir=K1D, fir_pad=(1, 1)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=1e-6)


def test_packed_conv_up_matches_unpacked():
    """The G upsample pair — lhs-dilated conv with flipped taps + blur
    (stylegan2.py:_modulated_conv2d up=True) — and the to_rgb skip
    upsample, from both packed and unpacked inputs."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 16, 5), jnp.float32)
    xp = space_to_depth(x)
    w = jnp.asarray(rng.randn(3, 3, 5, 7), jnp.float32) * 0.3

    def unpacked_up(xs):
        out = lax.conv_general_dilated(
            xs, jnp.flip(w, (0, 1)), (1, 1), ((2, 2), (2, 2)),
            lhs_dilation=(2, 2), dimension_numbers=DN)
        return blur(out, K2D, pad=(1, 1), upsample_factor=2)

    want = unpacked_up(x)
    got = depth_to_space(packed_conv_up(xp, w, fir=K1D, fir_pad=(1, 1),
                                        fir_gain=4.0))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=1e-6)
    got = depth_to_space(packed_conv_up(x, w, fir=K1D, fir_pad=(1, 1),
                                        fir_gain=4.0, packed_in=False))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=1e-6)

    want = upsample_2d(x, K2D)
    got = depth_to_space(packed_upfirdn_up2(xp, K1D, pad=(2, 1), gain=4.0))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=1e-6)


def test_packed_conv_grads_exact():
    """Input gradients and grad-of-grad (the R1 regularizer regime,
    reference train.py:260-288) through packed ops match the unpacked
    forms to fp tolerance per op."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 16, 16, 5), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 5, 7), jnp.float32) * 0.3

    f_un = lambda t: _conv(blur(t, K2D, pad=(2, 2)), w, 2, ((0, 0), (0, 0)))
    f_pk = lambda t: depth_to_space(packed_conv(
        space_to_depth(t), w, stride=2, pad=0, fir=K1D, fir_pad=(2, 2)))

    def loss(fn, t):
        return jnp.sum(jnp.sin(fn(t)))

    g1 = jax.grad(lambda t: loss(f_un, t))(x)
    g2 = jax.grad(lambda t: loss(f_pk, t))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=2e-5, atol=1e-6)

    def r1(fn, t):
        g = jax.grad(lambda u: jnp.sum(fn(u)))(t)
        return jnp.sum(jnp.square(g))

    gg1 = jax.grad(lambda t: r1(f_un, t))(x)
    gg2 = jax.grad(lambda t: r1(f_pk, t))(x)
    np.testing.assert_allclose(np.asarray(gg1), np.asarray(gg2),
                               rtol=2e-5, atol=1e-6)


def test_pack_noise_and_channel_tiling():
    rng = np.random.RandomState(3)
    n = jnp.asarray(rng.randn(1, 8, 8, 1), jnp.float32)
    x = jnp.asarray(rng.randn(2, 8, 8, 6), jnp.float32)
    want = x + n          # broadcast add, unpacked
    got = depth_to_space(space_to_depth(x) + pack_noise(n, 6))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    b = jnp.asarray(rng.randn(6), jnp.float32)
    want = x + b
    got = depth_to_space(space_to_depth(x) + tile_channel_vector(b))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pack_noise_bf16_batched_and_grad():
    """pack_noise on bf16 batched noise: exact values and a flowing gradient
    (the projector optimizes noise buffers). Conv-form rewrites of this
    repeat were measured slower end-to-end and rejected (packed.py docstring)
    — whatever the formulation, these invariants must hold."""
    rng = np.random.RandomState(4)
    for batch in (1, 3):
        n = jnp.asarray(rng.randn(batch, 8, 8, 1), jnp.bfloat16)
        got = pack_noise(n, 5)
        want = jnp.repeat(space_to_depth(n), 5, axis=-1)
        assert got.dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(got, np.float32), np.asarray(want, np.float32))
    n = jnp.asarray(rng.randn(1, 8, 8, 1), jnp.bfloat16)
    g = jax.grad(lambda t: jnp.sum(pack_noise(t, 5).astype(jnp.float32)))(n)
    np.testing.assert_array_equal(np.asarray(g, np.float32),
                                  np.full((1, 8, 8, 1), 5.0, np.float32))


def test_packed_generator_parity():
    """generator_apply(packed=True) — synthesis tail in packed layout
    (styled up/s1 convs, noise, to_rgb, skip chain) — matches the
    production forward, including the PPL_regularize path length."""
    from content_aware_gan_compression_tpu.models.stylegan2 import (
        GeneratorConfig, generator_init, generator_apply)

    # small widths at high res so the last pairs pack (net_shape is data)
    cfg = GeneratorConfig(size=64, net_shape=(64,) * 10, n_mlp=2,
                          style_dim=32)
    params = generator_init(random.PRNGKey(0), cfg)
    z = jnp.asarray(np.random.RandomState(1).randn(2, 32), jnp.float32)
    k = random.PRNGKey(7)
    a = generator_apply(params, cfg, [z], rng=k, output_format="NHWC")
    b = generator_apply(params, cfg, [z], rng=k, output_format="NHWC",
                        packed=True, packed_max_ch=64)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-5)
    # remat composes; rgb_list entries unpack to the standard layout
    c = generator_apply(params, cfg, [z], rng=k, output_format="NHWC",
                        packed=True, packed_max_ch=64, remat=True)
    np.testing.assert_allclose(np.asarray(b), np.asarray(c),
                               rtol=1e-4, atol=1e-5)
    la = generator_apply(params, cfg, [z], rng=k, return_rgb_list=True)
    lb = generator_apply(params, cfg, [z], rng=k, return_rgb_list=True,
                         packed=True, packed_max_ch=64)
    assert len(la) == len(lb)
    for ra, rb in zip(la, lb):
        np.testing.assert_allclose(np.asarray(ra), np.asarray(rb),
                                   rtol=1e-4, atol=1e-5)
    # PPL path lengths (vjp through the packed tail)
    kp = random.PRNGKey(9)
    _, pl_a = generator_apply(params, cfg, [z], rng=k, PPL_regularize=True,
                              ppl_rng=kp)
    _, pl_b = generator_apply(params, cfg, [z], rng=k, PPL_regularize=True,
                              ppl_rng=kp, packed=True, packed_max_ch=64)
    np.testing.assert_allclose(np.asarray(pl_a), np.asarray(pl_b),
                               rtol=1e-3, atol=1e-5)
    # packed_min_res above the model's max res gates every pair off:
    # bitwise-identical to the unpacked forward (the generate.py fwd-only
    # default is 512 — nothing packs below that size)
    d = generator_apply(params, cfg, [z], rng=k, output_format="NHWC",
                        packed=True, packed_max_ch=64, packed_min_res=512)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(d))


def test_packed_discriminator_parity():
    """discriminator_apply(packed=True) — packed trunk over the blocks
    whose input width is lane-sparse — matches the production forward
    tightly; gradients match within the model's own fp-noise sensitivity
    (deep lrelu kinks amplify 1-ulp differences; verified equal to a
    1e-7-perturbed unpacked baseline's deviation)."""
    from content_aware_gan_compression_tpu.models.stylegan2 import (
        DiscriminatorConfig, discriminator_init, discriminator_apply)

    cfg = DiscriminatorConfig(size=64, channel_multiplier=2, channel_max=64)
    params = discriminator_init(random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(4, 64, 64, 3),
                    jnp.float32)
    a = discriminator_apply(params, cfg, x, data_format="NHWC")
    b = discriminator_apply(params, cfg, x, data_format="NHWC", packed=True,
                            packed_max_ch=64)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-5)
    # packed + remat compose
    c = discriminator_apply(params, cfg, x, data_format="NHWC", packed=True,
                            packed_max_ch=64, remat=True)
    np.testing.assert_allclose(np.asarray(b), np.asarray(c),
                               rtol=1e-4, atol=1e-5)

    # gradient deviation bounded by the intrinsic chaos scale: compare
    # against the unpacked model's own deviation under a 1e-7 perturbation
    g = lambda im, **kw: jax.grad(lambda t: discriminator_apply(
        params, cfg, t, data_format="NHWC", **kw).sum())(im)
    g0 = np.asarray(g(x))
    g_pk = np.asarray(g(x, packed=True, packed_max_ch=64))
    g_ch = np.asarray(g(x * (1 + 1e-7)))
    scale = np.abs(g0).max()
    chaos = np.abs(g0 - g_ch).max() / scale
    dev = np.abs(g0 - g_pk).max() / scale
    assert dev <= max(4 * chaos, 1e-5), (dev, chaos)


def test_packed_non_monotone_net_shape_falls_back():
    """net widths are data (CLAUDE.md): a pruned net_shape whose high-res
    pair is WIDER than packed_max_ch after a qualifying narrower pair must
    not hand a packed tensor to an unpacked pair — packing is restricted to
    a contiguous tail, falling back to unpacked for the odd shapes."""
    from content_aware_gan_compression_tpu.models.stylegan2 import (
        GeneratorConfig, generator_init, generator_apply)

    # size 128: pair 3 (res 64) is narrow (qualifies), pair 4 (res 128) is
    # wide (does not) — the old gating packed pair 3 and crashed pair 4
    ns = (32, 32, 32, 32, 32, 32, 32, 32, 16, 16, 96, 96)
    cfg = GeneratorConfig(size=128, net_shape=ns, n_mlp=1, style_dim=16)
    params = generator_init(random.PRNGKey(0), cfg)
    z = jnp.asarray(np.random.RandomState(1).randn(2, 16), jnp.float32)
    k = random.PRNGKey(7)
    a = generator_apply(params, cfg, [z], rng=k, output_format="NHWC")
    b = generator_apply(params, cfg, [z], rng=k, output_format="NHWC",
                        packed=True, packed_max_ch=64)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-5)
