"""End-to-end numerical parity: our JAX StyleGAN2 vs the reference PyTorch
model (imported read-only as an oracle with a CPU op shim).

Strategy: randomly init the torch model, export its state_dict, import into
our pytree via the checkpoint importer, run both on identical latents/noise,
compare pixels. This exercises every layer, the upsample/blur arithmetic,
equalized-lr scaling, demodulation eps placement, and the importer itself.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from content_aware_gan_compression_tpu.models import (
    GeneratorConfig,
    DiscriminatorConfig,
    generator_apply,
    generator_init,
    discriminator_init,
    discriminator_apply,
    net_shape_from_params,
    default_net_shape,
)
from content_aware_gan_compression_tpu.utils import (
    torch_state_dict_to_pytree,
    pytree_to_torch_state_dict,
)

from torch_oracle import load_reference_model

SIZE = 16
STYLE_DIM = 32
N_MLP = 3
NET_SHAPE = (16, 16, 12, 12, 8, 8)  # pruned-style non-uniform widths


@pytest.fixture(scope="module")
def ref_generator():
    ref = load_reference_model()
    torch.manual_seed(0)
    g = ref.Generator(SIZE, STYLE_DIM, N_MLP, channel_multiplier=2,
                      generator_net_shape=list(NET_SHAPE))
    g.eval()
    return g


@pytest.fixture(scope="module")
def jax_generator(ref_generator):
    params = torch_state_dict_to_pytree(
        {k: v.detach().numpy() for k, v in ref_generator.state_dict().items()})
    config = GeneratorConfig(size=SIZE, style_dim=STYLE_DIM, n_mlp=N_MLP,
                             net_shape=net_shape_from_params(params))
    return params, config


def fixed_noise(config, batch):
    """Deterministic per-layer noise as (torch NCHW list, jax NHWC list)."""
    rng = np.random.RandomState(42)
    t_list, j_list = [], []
    for layer_idx in range(config.num_layers):
        res = 2 ** ((layer_idx + 5) // 2)
        n = rng.randn(batch, 1, res, res).astype(np.float32)
        t_list.append(torch.tensor(n))
        j_list.append(jnp.asarray(np.transpose(n, (0, 2, 3, 1))))
    return t_list, j_list


def test_net_shape_roundtrip(jax_generator):
    params, config = jax_generator
    assert net_shape_from_params(params) == NET_SHAPE
    assert config.net_shape == NET_SHAPE


def test_generator_forward_parity(ref_generator, jax_generator):
    params, config = jax_generator
    rng = np.random.RandomState(1)
    z = rng.randn(4, STYLE_DIM).astype(np.float32)
    t_noise, j_noise = fixed_noise(config, 4)

    with torch.no_grad():
        want = ref_generator([torch.tensor(z)], noise=t_noise).numpy()
    got = np.asarray(generator_apply(params, config, [jnp.asarray(z)],
                                     noise=j_noise))
    assert got.shape == want.shape == (4, 3, SIZE, SIZE)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_generator_buffer_noise_parity(ref_generator, jax_generator):
    params, config = jax_generator
    z = np.random.RandomState(2).randn(2, STYLE_DIM).astype(np.float32)
    with torch.no_grad():
        want = ref_generator([torch.tensor(z)], randomize_noise=False).numpy()
    got = np.asarray(generator_apply(params, config, [jnp.asarray(z)],
                                     randomize_noise=False))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_style_mixing_parity(ref_generator, jax_generator):
    params, config = jax_generator
    rng = np.random.RandomState(3)
    z1 = rng.randn(2, STYLE_DIM).astype(np.float32)
    z2 = rng.randn(2, STYLE_DIM).astype(np.float32)
    t_noise, j_noise = fixed_noise(config, 2)
    inject = 2
    with torch.no_grad():
        want = ref_generator([torch.tensor(z1), torch.tensor(z2)],
                             inject_index=inject, noise=t_noise).numpy()
    got = np.asarray(generator_apply(
        params, config, [jnp.asarray(z1), jnp.asarray(z2)],
        inject_index=inject, noise=j_noise))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    # dynamic (traced) inject_index must agree with the static one
    got_dyn = np.asarray(generator_apply(
        params, config, [jnp.asarray(z1), jnp.asarray(z2)],
        inject_index=jnp.asarray(inject), noise=j_noise))
    np.testing.assert_allclose(got_dyn, got, rtol=1e-6, atol=1e-6)


def test_truncation_parity(ref_generator, jax_generator):
    params, config = jax_generator
    rng = np.random.RandomState(4)
    z = rng.randn(2, STYLE_DIM).astype(np.float32)
    trunc_latent = rng.randn(1, STYLE_DIM).astype(np.float32)
    t_noise, j_noise = fixed_noise(config, 2)
    with torch.no_grad():
        want = ref_generator([torch.tensor(z)], truncation=0.7,
                             truncation_latent=torch.tensor(trunc_latent),
                             noise=t_noise).numpy()
    got = np.asarray(generator_apply(
        params, config, [jnp.asarray(z)], truncation=0.7,
        truncation_latent=jnp.asarray(trunc_latent), noise=j_noise))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_input_is_latent_and_rgb_list_parity(ref_generator, jax_generator):
    params, config = jax_generator
    rng = np.random.RandomState(5)
    w = rng.randn(2, STYLE_DIM).astype(np.float32)
    t_noise, j_noise = fixed_noise(config, 2)
    with torch.no_grad():
        want_list = ref_generator(None, input_is_latent=True,
                                  latent_styles=[torch.tensor(w)],
                                  noise=t_noise, return_rgb_list=True)
    got_list = generator_apply(params, config, latent_styles=[jnp.asarray(w)],
                               input_is_latent=True, noise=j_noise,
                               return_rgb_list=True)
    assert len(got_list) == len(want_list) == config.log_size - 1
    for got, want in zip(got_list, want_list):
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   rtol=2e-4, atol=2e-4)


def test_style_scalars_parity(ref_generator, jax_generator):
    params, config = jax_generator
    rng = np.random.RandomState(6)
    z = rng.randn(2, STYLE_DIM).astype(np.float32)
    t_noise, j_noise = fixed_noise(config, 2)
    with torch.no_grad():
        want_img, want_styles = ref_generator(
            [torch.tensor(z)], noise=t_noise, return_style_scalars=True)
    got_img, got_styles = generator_apply(
        params, config, [jnp.asarray(z)], noise=j_noise,
        return_style_scalars=True)
    assert len(got_styles) == len(want_styles)
    for got, want in zip(got_styles, want_styles):
        # reference shape [B,1,in,1,1]; ours [B,in]
        np.testing.assert_allclose(
            np.asarray(got), want.numpy().reshape(got.shape),
            rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_img), want_img.numpy(),
                               rtol=2e-4, atol=2e-4)


def test_ppl_path_lengths_match_torch_autograd(ref_generator, jax_generator):
    """Path-length branch: compare our vjp-based path lengths against torch
    autograd on the oracle, using identical injected y (we seed both sides
    with the same noise by reaching into the math: y is drawn inside, so
    instead compare statistically via identical fixed 'ppl noise' images)."""
    params, config = jax_generator
    rng = np.random.RandomState(7)
    z = rng.randn(2, STYLE_DIM).astype(np.float32)
    t_noise, j_noise = fixed_noise(config, 2)

    # torch side: replicate reference model.py:661-666 with fixed y
    zt = torch.tensor(z)
    styles = [ref_generator.style(zt)]
    latent = styles[0].unsqueeze(1).repeat(1, ref_generator.n_latent, 1)
    latent.requires_grad_(True)
    img = None
    # drive the oracle's forward with input_is_latent via latent_styles W+ path
    out = ref_generator(None, input_is_latent=True, latent_styles=[latent],
                        noise=t_noise)
    y = torch.tensor(
        rng.randn(*out.shape).astype(np.float32)) / np.sqrt(out.shape[2] * out.shape[3])
    (grad,) = torch.autograd.grad((out * y).sum(), latent, create_graph=False)
    want = torch.sqrt(grad.pow(2).sum(2).mean(1)).detach().numpy()

    # jax side: same W+ latent and same y via explicit vjp
    from content_aware_gan_compression_tpu.models.stylegan2 import _synthesis

    lat = jnp.asarray(latent.detach().numpy())

    def synth(l):
        img, _, _ = _synthesis(params, config, l, j_noise)
        return img

    image, vjp_fn = jax.vjp(synth, lat)
    y_j = jnp.asarray(np.transpose(y.numpy(), (0, 2, 3, 1)))
    (g,) = vjp_fn(y_j)
    got = np.sqrt(np.mean(np.sum(np.square(np.asarray(g)), axis=2), axis=1))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_discriminator_parity():
    ref = load_reference_model()
    torch.manual_seed(1)
    d = ref.Discriminator(SIZE)
    d.eval()
    params = torch_state_dict_to_pytree(
        {k: v.detach().numpy() for k, v in d.state_dict().items()})
    config = DiscriminatorConfig(size=SIZE)
    rng = np.random.RandomState(8)
    img = rng.randn(4, 3, SIZE, SIZE).astype(np.float32)
    with torch.no_grad():
        want = d(torch.tensor(img)).numpy()
    got = np.asarray(discriminator_apply(params, config, jnp.asarray(img)))
    assert got.shape == want.shape == (4, 1)
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_discriminator_odd_batch_grouping():
    """Batch not divisible by stddev_group exercises the stride-m grouping."""
    ref = load_reference_model()
    torch.manual_seed(2)
    d = ref.Discriminator(SIZE)
    d.eval()
    params = torch_state_dict_to_pytree(
        {k: v.detach().numpy() for k, v in d.state_dict().items()})
    config = DiscriminatorConfig(size=SIZE)
    img = np.random.RandomState(9).randn(2, 3, SIZE, SIZE).astype(np.float32)
    with torch.no_grad():
        want = d(torch.tensor(img)).numpy()
    got = np.asarray(discriminator_apply(params, config, jnp.asarray(img)))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_export_roundtrip_into_torch(ref_generator, jax_generator):
    """pytree -> torch state dict -> load_state_dict on the oracle: exact."""
    params, config = jax_generator
    from content_aware_gan_compression_tpu.utils.checkpoint import (
        generator_fir_buffers,
    )

    sd = pytree_to_torch_state_dict(params)
    sd.update(generator_fir_buffers(config))
    sd_t = {k: torch.tensor(np.asarray(v)) for k, v in sd.items()}
    missing, unexpected = ref_generator.load_state_dict(sd_t, strict=True), None
    z = np.random.RandomState(10).randn(2, STYLE_DIM).astype(np.float32)
    t_noise, j_noise = fixed_noise(config, 2)
    with torch.no_grad():
        want = ref_generator([torch.tensor(z)], noise=t_noise).numpy()
    got = np.asarray(generator_apply(params, config, [jnp.asarray(z)],
                                     noise=j_noise))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_full_size_default_net_shape_matches_channels_dict():
    # 256px: conv1 in/out + 2 convs per res 8..256 => 14 widths
    assert default_net_shape(256) == (512,) * 10 + (256, 256, 128, 128)
    # init with default shape must produce the same tree structure the torch
    # model would (spot-check widths)
    cfg = GeneratorConfig(size=32, style_dim=8, n_mlp=1)
    p = generator_init(jax.random.PRNGKey(0), cfg)
    assert net_shape_from_params(p) == default_net_shape(32)


def test_discriminator_remat_parity():
    """remat=True is a pure memory knob: identical scores, identical R1-style
    grad-of-grad (the 1024px path that needs it, train/steps.py:d_reg_step)."""
    import jax.numpy as jnp
    from content_aware_gan_compression_tpu.models import (
        DiscriminatorConfig, discriminator_init, discriminator_apply)

    cfg = DiscriminatorConfig(size=32, channel_max=64)
    params = discriminator_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 32, 32))

    out = discriminator_apply(params, cfg, x)
    out_r = discriminator_apply(params, cfg, x, remat=True)
    # not bit-identical: the shifted-add blur's adds fuse differently
    # inside/outside jax.checkpoint
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r),
                               rtol=1e-5, atol=1e-6)

    def r1(p, img, remat):
        def score_sum(im):
            return discriminator_apply(p, cfg, im, remat=remat).sum()
        g = jax.grad(score_sum)(img)
        return jnp.mean(jnp.sum(jnp.square(g.reshape(g.shape[0], -1)), axis=1))

    g_plain = jax.grad(r1)(params, x, False)
    g_remat = jax.grad(r1)(params, x, True)
    for a, b in zip(jax.tree_util.tree_leaves(g_plain),
                    jax.tree_util.tree_leaves(g_remat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
