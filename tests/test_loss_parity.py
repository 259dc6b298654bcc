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
