"""make_multi_step (K iterations in one lax.scan dispatch) must reproduce the
sequential per-iteration path exactly: same RNG discipline, same regularizer
cadence for any iter0 offset, same metrics persistence, same uint8 wire
normalization."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from content_aware_gan_compression_tpu.models import (
    GeneratorConfig, DiscriminatorConfig, generator_init, discriminator_init,
)
from content_aware_gan_compression_tpu.train import (
    TrainConfig, make_train_steps, make_multi_step, make_optimizers,
    ema_accumulate,
)
from content_aware_gan_compression_tpu.train.steps import EMA_ACCUM

SIZE = 8
BATCH = 8
K = 5


def _setup(with_teacher=False):
    g_cfg = GeneratorConfig(size=SIZE, style_dim=16, n_mlp=1,
                            net_shape=(6, 6, 4, 4))
    t_cfg = GeneratorConfig(size=SIZE, style_dim=16, n_mlp=1,
                            net_shape=(8, 8, 6, 6)) if with_teacher else None
    d_cfg = DiscriminatorConfig(size=SIZE)
    cfg = TrainConfig(generated_img_size=SIZE, latent=16, n_mlp=1,
                      batch_size=BATCH, content_aware_KD=False,
                      kd_lpips_lambda=0.0, teacher=None,
                      d_reg_freq=2, g_reg_freq=3)
    gp = generator_init(jax.random.PRNGKey(0), g_cfg)
    dp = discriminator_init(jax.random.PRNGKey(1), d_cfg)
    tp = (generator_init(jax.random.PRNGKey(4), t_cfg)
          if with_teacher else None)
    return g_cfg, d_cfg, t_cfg, cfg, gp, dp, tp


def _sequential(g_cfg, d_cfg, t_cfg, cfg, gp, dp, tp, reals_f32, rng, iter0,
                mpl):
    """Reference loop: one dispatch per step fn, multi_step's RNG split."""
    d_step, d_reg_step, g_step, g_reg_step, _ = make_train_steps(
        g_cfg, d_cfg, cfg, teacher_config=t_cfg)
    g_opt, d_opt = make_optimizers(cfg)
    gos, dos = g_opt.init(gp), d_opt.init(dp)
    ema_p = jax.tree_util.tree_map(jnp.copy, gp)
    d_step = jax.jit(partial(d_step, d_opt=d_opt))
    d_reg_step = jax.jit(partial(d_reg_step, d_opt=d_opt))
    g_step = jax.jit(partial(g_step, g_opt=g_opt))
    g_reg_step = jax.jit(partial(g_reg_step, g_opt=g_opt))
    ema = jax.jit(ema_accumulate)

    out_metrics = []
    lr1 = lpath = lplen = 0.0
    for k in range(reals_f32.shape[0]):
        it = iter0 + k
        rng, k_dg, k_r = jax.random.split(rng, 3)
        k_d, k_g = jax.random.split(k_dg)
        dp, dos, m_d = d_step(gp, dp, dos, reals_f32[k], k_d)
        if it % cfg.d_reg_freq == 0:
            dp, dos, mr = d_reg_step(dp, dos, reals_f32[k])
            lr1 = mr["r1"]
        gp, gos, m_g = g_step(gp, gos, dp, k_g, tp, None, None)
        if it % cfg.g_reg_freq == 0:
            gp, gos, mpl, mg = g_reg_step(gp, gos, k_r, mpl)
            lpath, lplen = mg["path"], mg["path_length"]
        ema_p = ema(ema_p, gp, EMA_ACCUM)
        m = dict(m_d)
        m.update(m_g)
        m.update({"r1": lr1, "path": lpath, "path_length": lplen,
                  "mean_path": mpl})
        out_metrics.append(m)
    return gp, dp, ema_p, mpl, out_metrics


def _run_multi(g_cfg, d_cfg, t_cfg, cfg, gp, dp, tp, reals, rng, iter0):
    g_opt, d_opt = make_optimizers(cfg)
    gos, dos = g_opt.init(gp), d_opt.init(dp)
    ema_p = jax.tree_util.tree_map(jnp.copy, gp)
    multi = jax.jit(partial(make_multi_step(g_cfg, d_cfg, cfg,
                                            teacher_config=t_cfg),
                            d_opt=d_opt, g_opt=g_opt))
    return multi(gp, gos, dp, dos, ema_p, jnp.asarray(0.0), rng, reals,
                 iter0, (0.0, 0.0, 0.0), tp, None, None)


def test_multi_step_matches_sequential():
    g_cfg, d_cfg, t_cfg, cfg, gp, dp, tp = _setup(with_teacher=True)
    reals = jax.random.normal(jax.random.PRNGKey(2), (K, BATCH, 3, SIZE, SIZE))
    rng = jax.random.PRNGKey(3)
    iter0 = 7  # offset: d_reg fires at k=1,3; g_reg at k=2 — off-boundary

    (gp_m, _, dp_m, _, ema_m, mpl_m, _, last_reg, metrics) = _run_multi(
        g_cfg, d_cfg, t_cfg, cfg, gp, dp, tp, reals, rng, iter0)
    gp_s, dp_s, ema_s, mpl_s, metrics_s = _sequential(
        g_cfg, d_cfg, t_cfg, cfg, gp, dp, tp, reals, rng, iter0,
        jnp.asarray(0.0))

    for a, b in zip(jax.tree_util.tree_leaves(gp_m),
                    jax.tree_util.tree_leaves(gp_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(dp_m),
                    jax.tree_util.tree_leaves(dp_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(ema_m),
                    jax.tree_util.tree_leaves(ema_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(float(mpl_m), float(mpl_s), rtol=1e-5)

    # per-iteration metrics, including last-value persistence of r1/path
    for k in range(K):
        for key in ("d", "g", "r1", "path", "path_length", "mean_path"):
            np.testing.assert_allclose(
                float(metrics[key][k]), float(metrics_s[k][key]),
                rtol=5e-4, atol=2e-5,
                err_msg=f"metric {key} differs at step {k}")
    np.testing.assert_allclose(float(last_reg[0]), float(metrics_s[-1]["r1"]),
                               rtol=5e-4, atol=2e-5)


def test_multi_step_uint8_wire_path():
    """uint8 [K,B,H,W,3] batches must normalize on device exactly like the
    Trainer's _prep (transpose + /127.5 - 1)."""
    g_cfg, d_cfg, t_cfg, cfg, gp, dp, tp = _setup()
    u8 = jax.random.randint(jax.random.PRNGKey(2), (2, BATCH, SIZE, SIZE, 3),
                            0, 256, dtype=jnp.uint8)
    f32 = (jnp.transpose(u8, (0, 1, 4, 2, 3)).astype(jnp.float32)
           / 127.5 - 1.0)
    rng = jax.random.PRNGKey(3)
    out_u8 = _run_multi(g_cfg, d_cfg, t_cfg, cfg, gp, dp, tp, u8, rng, 0)
    out_f32 = _run_multi(g_cfg, d_cfg, t_cfg, cfg, gp, dp, tp, f32, rng, 0)
    for a, b in zip(jax.tree_util.tree_leaves(out_u8[0]),
                    jax.tree_util.tree_leaves(out_f32[0])):
        # rtol headroom: the in-body uint8 normalize fuses into a different
        # layout than the host-precomputed NCHW float input, reassociating
        # the conv reductions
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
