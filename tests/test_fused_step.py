"""The fused D+G step must be bit-identical to the sequential two-step path
(same rng split, same update order: D first, then G against updated D)."""

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from content_aware_gan_compression_tpu.models import (
    GeneratorConfig, DiscriminatorConfig, generator_init, discriminator_init,
)
from content_aware_gan_compression_tpu.train import (
    TrainConfig, make_train_steps, make_optimizers,
)

SIZE = 8


def test_dg_step_matches_sequential():
    g_cfg = GeneratorConfig(size=SIZE, style_dim=16, n_mlp=1,
                            net_shape=(6, 6, 4, 4))
    d_cfg = DiscriminatorConfig(size=SIZE)
    cfg = TrainConfig(generated_img_size=SIZE, latent=16, n_mlp=1,
                      batch_size=4, content_aware_KD=False,
                      kd_lpips_lambda=0.0, teacher=None)
    gp = generator_init(jax.random.PRNGKey(0), g_cfg)
    dp = discriminator_init(jax.random.PRNGKey(1), d_cfg)
    g_opt, d_opt = make_optimizers(cfg)
    gos, dos = g_opt.init(gp), d_opt.init(dp)
    d_step, _, g_step, _, dg_step = make_train_steps(g_cfg, d_cfg, cfg)

    real = jax.random.normal(jax.random.PRNGKey(2), (4, 3, SIZE, SIZE))
    rng = jax.random.PRNGKey(3)

    # fused
    gp_f, gos_f, dp_f, dos_f, m_f = jax.jit(
        partial(dg_step, d_opt=d_opt, g_opt=g_opt))(
        gp, gos, dp, dos, real, rng, None, None, None)

    # sequential with the same key split
    k_d, k_g = jax.random.split(rng)
    dp_s, dos_s, m1 = jax.jit(partial(d_step, d_opt=d_opt))(
        gp, dp, dos, real, k_d)
    gp_s, gos_s, m2 = jax.jit(partial(g_step, g_opt=g_opt))(
        gp, gos, dp_s, k_g, None, None, None)

    for a, b in zip(jax.tree_util.tree_leaves(gp_f),
                    jax.tree_util.tree_leaves(gp_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(dp_f),
                    jax.tree_util.tree_leaves(dp_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(float(m_f["d"]), float(m1["d"]), rtol=1e-6)
    np.testing.assert_allclose(float(m_f["g"]), float(m2["g"]), rtol=1e-6)
