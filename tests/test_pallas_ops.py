"""Pallas fast-path kernels vs the lax reference implementations, in
interpret mode on CPU (the driver's real-TPU bench exercises the compiled
path)."""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from content_aware_gan_compression_tpu.ops import (
    upfirdn2d, make_kernel, fused_leaky_relu,
)


def test_fused_noise_bias_lrelu_matches_lax():
    from content_aware_gan_compression_tpu.ops.pallas.fused_act_pallas import (
        _run_fwd)  # interpret via pure math comparison below
    from content_aware_gan_compression_tpu.ops.pallas import (
        fused_noise_bias_lrelu)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 16), jnp.float32)
    noise = jnp.asarray(rng.randn(2, 8, 8, 1), jnp.float32)
    bias = jnp.asarray(rng.randn(16), jnp.float32)
    nw = jnp.asarray(0.3)

    # CPU has no Mosaic; run the kernels in interpret mode
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        got = fused_noise_bias_lrelu(x, noise, bias, nw)
        want = fused_leaky_relu(x + nw * noise, bias)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

        # gradients vs autodiff of the lax expression
        def loss_p(x, noise, bias, nw):
            return jnp.sum(fused_noise_bias_lrelu(x, noise, bias, nw) ** 2)

        def loss_l(x, noise, bias, nw):
            return jnp.sum(fused_leaky_relu(x + nw * noise, bias) ** 2)

        gp = jax.grad(loss_p, argnums=(0, 1, 2, 3))(x, noise, bias, nw)
        gl = jax.grad(loss_l, argnums=(0, 1, 2, 3))(x, noise, bias, nw)
        for a, b in zip(gp, gl):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("pad,gain", [((2, 1), 1.0), ((1, 1), 4.0),
                                      ((2, 2), 1.0)])
def test_blur4_pallas_matches_lax(pad, gain):
    from jax.experimental.pallas import tpu as pltpu

    from content_aware_gan_compression_tpu.ops.pallas import blur4_pallas

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 12, 12, 8), jnp.float32)
    k = make_kernel([1, 3, 3, 1])

    want = upfirdn2d(x, k * gain, up=1, down=1, pad=pad)
    with pltpu.force_tpu_interpret_mode():
        got = blur4_pallas(x, np.asarray(k), pad, gain, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_blur4_pallas_gradient_matches_lax():
    from jax.experimental.pallas import tpu as pltpu

    from content_aware_gan_compression_tpu.ops.pallas import blur4_pallas

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 8, 4), jnp.float32)
    k = make_kernel([1, 3, 3, 1])
    pad = (2, 1)

    def loss_l(x):
        return jnp.sum(upfirdn2d(x, k, pad=pad) ** 3)

    with pltpu.force_tpu_interpret_mode():
        def loss_p(x):
            return jnp.sum(blur4_pallas(x, np.asarray(k), pad, 1.0, True) ** 3)

        gp = jax.grad(loss_p)(x)
    gl = jax.grad(loss_l)(x)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gl),
                               rtol=1e-4, atol=1e-5)


def test_blur4_pallas_grad_of_grad_matches_lax():
    """Second-order autodiff through the Pallas blur (R1/path-length need
    it): the custom VJP's backward is itself a blur4 custom-VJP call."""
    from jax.experimental.pallas import tpu as pltpu

    from content_aware_gan_compression_tpu.ops.pallas import blur4_pallas

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 8, 8, 4), jnp.float32)
    k = make_kernel([1, 3, 3, 1])
    pad = (2, 1)

    def outer_l(x):
        g = jax.grad(lambda x: jnp.sum(upfirdn2d(x, k, pad=pad) ** 3))(x)
        return jnp.sum(g ** 2)

    with pltpu.force_tpu_interpret_mode():
        def outer_p(x):
            g = jax.grad(lambda x: jnp.sum(
                blur4_pallas(x, np.asarray(k), pad, 1.0, True) ** 3))(x)
            return jnp.sum(g ** 2)

        gg_p = jax.grad(outer_p)(x)
    gg_l = jax.grad(outer_l)(x)
    np.testing.assert_allclose(np.asarray(gg_p), np.asarray(gg_l),
                               rtol=1e-4, atol=1e-5)


def test_fused_act_grad_of_grad_matches_lax():
    from jax.experimental.pallas import tpu as pltpu

    from content_aware_gan_compression_tpu.ops.pallas import (
        fused_noise_bias_lrelu)

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 8, 8, 16), jnp.float32)
    noise = jnp.asarray(rng.randn(2, 8, 8, 1), jnp.float32)
    bias = jnp.asarray(rng.randn(16), jnp.float32)
    nw = jnp.asarray(0.3)

    def outer_l(x):
        g = jax.grad(lambda x: jnp.sum(
            fused_leaky_relu(x + nw * noise, bias) ** 2))(x)
        return jnp.sum(g ** 2)

    with pltpu.force_tpu_interpret_mode():
        def outer_p(x):
            g = jax.grad(lambda x: jnp.sum(
                fused_noise_bias_lrelu(x, noise, bias, nw) ** 2))(x)
            return jnp.sum(g ** 2)

        gg_p = jax.grad(outer_p)(x)
    gg_l = jax.grad(outer_l)(x)
    np.testing.assert_allclose(np.asarray(gg_p), np.asarray(gg_l),
                               rtol=1e-4, atol=1e-5)
