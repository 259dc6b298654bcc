"""Training-loss numerical parity vs torch autograd on the reference
discriminator: logistic losses and the R1 grad-of-grad penalty."""

import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from content_aware_gan_compression_tpu.models import (
    DiscriminatorConfig, discriminator_apply,
)
from content_aware_gan_compression_tpu.train.losses import (
    d_logistic_loss, g_nonsaturating_loss, r1_penalty,
)
from content_aware_gan_compression_tpu.utils import torch_state_dict_to_pytree
from torch_oracle import load_reference_model

SIZE = 16


def test_logistic_losses_match_torch():
    rng = np.random.RandomState(0)
    real = rng.randn(8, 1).astype(np.float32)
    fake = rng.randn(8, 1).astype(np.float32)
    want_d = (F.softplus(-torch.tensor(real)).mean()
              + F.softplus(torch.tensor(fake)).mean()).item()
    want_g = F.softplus(-torch.tensor(fake)).mean().item()
    np.testing.assert_allclose(
        float(d_logistic_loss(jnp.asarray(real), jnp.asarray(fake))),
        want_d, rtol=1e-6)
    np.testing.assert_allclose(
        float(g_nonsaturating_loss(jnp.asarray(fake))), want_g, rtol=1e-6)


def test_r1_penalty_matches_torch_autograd():
    ref = load_reference_model()
    torch.manual_seed(5)
    d = ref.Discriminator(SIZE)
    d.eval()
    params = torch_state_dict_to_pytree(
        {k: v.detach().numpy() for k, v in d.state_dict().items()})
    config = DiscriminatorConfig(size=SIZE)

    img = np.random.RandomState(6).randn(4, 3, SIZE, SIZE).astype(np.float32)

    # torch: reference d_r1_loss (train.py:194-200)
    x = torch.tensor(img, requires_grad=True)
    pred = d(x)
    (grad_real,) = torch.autograd.grad(pred.sum(), x, create_graph=True)
    want = grad_real.pow(2).reshape(4, -1).sum(1).mean().item()

    got = float(r1_penalty(
        lambda p, im: discriminator_apply(p, config, im), params,
        jnp.asarray(img)))
    np.testing.assert_allclose(got, want, rtol=1e-3)

    # and the grad-of-grad wrt D params must be finite and nonzero
    def loss_fn(p):
        return r1_penalty(
            lambda pp, im: discriminator_apply(pp, config, im), p,
            jnp.asarray(img))

    grads = jax.grad(loss_fn)(params)
    leaves = [np.asarray(l) for l in jax.tree_util.tree_leaves(grads)]
    assert all(np.isfinite(l).all() for l in leaves)
    assert any(np.abs(l).max() > 0 for l in leaves)


def test_kd_loss_bf16_aux_path_tracks_f32():
    """The TPU fast path (aux_dtype=bfloat16 for the LPIPS-VGG trunk +
    BiSeNet parse) must stay close to the exact-f32 objective: same masks
    (argmax is bf16-stable here), LPIPS value within bf16 tolerance."""
    from content_aware_gan_compression_tpu.models.lpips import lpips_init
    from content_aware_gan_compression_tpu.models.bisenet import (
        bisenet_init, bisenet_apply)
    from content_aware_gan_compression_tpu.train.losses import kd_loss

    k = jax.random.PRNGKey(3)
    k1, k2, k3, k4 = jax.random.split(k, 4)
    lp = lpips_init(k1)
    pp = bisenet_init(k2)
    fake = jax.random.uniform(k3, (2, 3, 64, 64), minval=-1, maxval=1)
    teach = jax.random.uniform(k4, (2, 3, 64, 64), minval=-1, maxval=1)

    def run(aux_dtype):
        def parse_fn(x):
            if aux_dtype is not None:
                x = x.astype(aux_dtype)
            return bisenet_apply(pp, x)[0].astype(jnp.float32)

        return kd_loss(
            fake, [fake], [teach], kd_l1_lambda=3.0, kd_lpips_lambda=3.0,
            kd_mode="Output_Only", size=64, lpips_params=lp,
            parse_fn=parse_fn, aux_dtype=aux_dtype)

    l1_f32, lpips_f32 = map(float, run(None))
    l1_bf16, lpips_bf16 = map(float, run(jnp.bfloat16))
    # identical masks -> identical L1 term up to mask-boundary flips
    np.testing.assert_allclose(l1_bf16, l1_f32, rtol=0.05)
    np.testing.assert_allclose(lpips_bf16, lpips_f32, rtol=0.1)
    assert lpips_f32 > 0


def test_kd_loss_nhwc_path_matches_nchw():
    """data_format='NHWC' — the zero-copy TPU path (NHWC parse, NHWC
    masking, NHWC LPIPS; no layout round trip on the big C=3 images) — must
    compute the same kd_l1/kd_lpips as the NCHW reference-exact path.
    Covers the masked Output_Only mode, the >lpips_image_size downsample,
    Intermediate mode, and the unmasked (parse_fn=None) mode."""
    from content_aware_gan_compression_tpu.models.lpips import lpips_init
    from content_aware_gan_compression_tpu.models.bisenet import (
        bisenet_init, bisenet_apply, bisenet_apply_nhwc)
    from content_aware_gan_compression_tpu.train.losses import kd_loss

    k = jax.random.PRNGKey(9)
    k1, k2, k3, k4 = jax.random.split(k, 4)
    lp = lpips_init(k1)
    pp = bisenet_init(k2, width_scale=0.25)
    fake = jax.random.uniform(k3, (2, 3, 64, 64), minval=-1, maxval=1)
    teach = jax.random.uniform(k4, (2, 3, 64, 64), minval=-1, maxval=1)
    fake_h = jnp.transpose(fake, (0, 2, 3, 1))
    teach_h = jnp.transpose(teach, (0, 2, 3, 1))

    def parse_nchw(x):
        return bisenet_apply(pp, x)[0]

    def parse_nhwc(x):
        return bisenet_apply_nhwc(pp, x)[0]

    for kd_mode, use_parse, lpips_size in (
            ("Output_Only", True, 256),   # masked, no downsample
            ("Output_Only", True, 32),    # masked + downsample-to-32
            ("Output_Only", False, 256),  # unmasked
            ("Intermediate", True, 256)):
        kw = dict(kd_l1_lambda=3.0, kd_lpips_lambda=3.0, kd_mode=kd_mode,
                  size=64, lpips_params=lp, lpips_image_size=lpips_size)
        l1_c, lp_c = kd_loss(
            fake, [fake], [teach], data_format="NCHW",
            parse_fn=parse_nchw if use_parse else None, **kw)
        l1_h, lp_h = kd_loss(
            fake_h, [fake_h], [teach_h], data_format="NHWC",
            parse_fn=parse_nhwc if use_parse else None, **kw)
        np.testing.assert_allclose(float(l1_h), float(l1_c), rtol=1e-5,
                                   err_msg=f"{kd_mode} parse={use_parse}")
        np.testing.assert_allclose(float(lp_h), float(lp_c), rtol=1e-4,
                                   err_msg=f"{kd_mode} parse={use_parse}")
        assert float(lp_c) > 0
