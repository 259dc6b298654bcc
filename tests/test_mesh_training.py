"""Multi-chip data-parallel training over a real jax.sharding.Mesh.

The reference's only parallelism is nn.DataParallel over the batch
(reference train.py:521-525, SURVEY.md section 2.2); our TPU-native mapping
is batch arrays in NamedSharding(mesh, P('data')) with replicated params
(parallel/mesh.py). These tests run the PRODUCTION step functions — the
K-iteration lax.scan multi-step used by the Trainer and bench — over the
conftest's virtual 8-device mesh and assert:

  * numerical parity with the unsharded single-device run (GSPMD's psum
    gradient reductions must reproduce the unsharded sums), and
  * outputs keep their shardings (params stay replicated, no silent
    gather-to-host), so chaining steps never re-lays-out.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from content_aware_gan_compression_tpu.models import (
    GeneratorConfig, DiscriminatorConfig, generator_init, discriminator_init,
)
from content_aware_gan_compression_tpu.parallel import (
    make_mesh, replicate, shard_stacked_batches,
)
from content_aware_gan_compression_tpu.train import (
    TrainConfig, make_multi_step, make_optimizers,
)

SIZE = 8
BATCH = 8  # divisible by the 8-device mesh
K = 2


def _setup():
    g_cfg = GeneratorConfig(size=SIZE, style_dim=16, n_mlp=1,
                            net_shape=(6, 6, 4, 4))
    t_cfg = GeneratorConfig(size=SIZE, style_dim=16, n_mlp=1,
                            net_shape=(8, 8, 6, 6))
    d_cfg = DiscriminatorConfig(size=SIZE)
    cfg = TrainConfig(generated_img_size=SIZE, latent=16, n_mlp=1,
                      batch_size=BATCH, content_aware_KD=False,
                      kd_lpips_lambda=0.0, teacher=None,
                      d_reg_freq=2, g_reg_freq=3)
    gp = generator_init(jax.random.PRNGKey(0), g_cfg)
    dp = discriminator_init(jax.random.PRNGKey(1), d_cfg)
    tp = generator_init(jax.random.PRNGKey(4), t_cfg)
    return g_cfg, d_cfg, t_cfg, cfg, gp, dp, tp


def _run(g_cfg, d_cfg, t_cfg, cfg, gp, dp, tp, reals, rng, mesh=None):
    g_opt, d_opt = make_optimizers(cfg)
    gos, dos = g_opt.init(gp), d_opt.init(dp)
    ema_p = jax.tree_util.tree_map(jnp.copy, gp)
    carry = (gp, gos, dp, dos, ema_p)
    if mesh is not None:
        carry = replicate(mesh, carry)
        tp = replicate(mesh, tp)
        reals = shard_stacked_batches(mesh, reals)
    multi = jax.jit(partial(make_multi_step(g_cfg, d_cfg, cfg,
                                            teacher_config=t_cfg),
                            d_opt=d_opt, g_opt=g_opt))
    gp, gos, dp, dos, ema_p = carry
    return multi(gp, gos, dp, dos, ema_p, jnp.asarray(0.0), rng, reals,
                 0, (0.0, 0.0, 0.0), tp, None, None)


def test_multi_step_on_mesh_matches_single_device():
    g_cfg, d_cfg, t_cfg, cfg, gp, dp, tp = _setup()
    reals = jax.random.normal(jax.random.PRNGKey(2), (K, BATCH, 3, SIZE, SIZE))
    rng = jax.random.PRNGKey(3)
    mesh = make_mesh(8)
    assert mesh.size == 8

    out_mesh = _run(g_cfg, d_cfg, t_cfg, cfg, gp, dp, tp, reals, rng,
                    mesh=mesh)
    out_one = _run(g_cfg, d_cfg, t_cfg, cfg, gp, dp, tp, reals, rng,
                   mesh=None)

    # params / d_params / ema trees (indices 0, 2, 4) and mean path (5)
    for idx in (0, 2, 4):
        for a, b in zip(jax.tree_util.tree_leaves(out_mesh[idx]),
                        jax.tree_util.tree_leaves(out_one[idx])):
            # psum over 8 shards reassociates the batch reductions
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(float(out_mesh[5]), float(out_one[5]),
                               rtol=1e-4)
    metrics_m, metrics_s = out_mesh[-1], out_one[-1]
    for key in ("d", "g", "r1", "path"):
        np.testing.assert_allclose(np.asarray(metrics_m[key]),
                                   np.asarray(metrics_s[key]),
                                   rtol=5e-4, atol=3e-5,
                                   err_msg=f"metric {key} differs on mesh")


def test_multi_step_on_mesh_preserves_shardings():
    """Replicated-in params must come back replicated (GSPMD must not decide
    to leave them gathered or sharded), so the next scan window consumes them
    with zero relayout — the invariant the Trainer's steady state relies on."""
    g_cfg, d_cfg, t_cfg, cfg, gp, dp, tp = _setup()
    reals = jax.random.normal(jax.random.PRNGKey(2), (K, BATCH, 3, SIZE, SIZE))
    mesh = make_mesh(8)

    out = _run(g_cfg, d_cfg, t_cfg, cfg, gp, dp, tp, reals,
               jax.random.PRNGKey(3), mesh=mesh)
    for idx in (0, 2, 4):  # g_params, d_params, ema
        for leaf in jax.tree_util.tree_leaves(out[idx]):
            assert leaf.sharding.is_fully_replicated, (
                f"leaf came back non-replicated: {leaf.sharding}")
