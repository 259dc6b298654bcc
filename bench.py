#!/usr/bin/env python
"""Benchmark: distillation-retraining throughput on the real TPU chip.

Measures the full per-iteration work of the reference's core loop (SURVEY.md
section 3.2) on the 11x-compressed 256px student with the full-size teacher:
D GAN step + G GAN+KD step every iteration, R1 every 16, path-length every 4,
EMA every iteration — the same cadence as train_hyperparams.py.

Prints ONE JSON line:
  {"metric": "retrain_iters_per_sec", "value": N, "unit": "iter/s",
   "vs_baseline": ...}

Baseline: the reference retrains 450k iters in 131 h on 2x V100
(README.md:110-115) = 0.954 iter/s. vs_baseline = ours / 0.954.
"""

import argparse
import json
import math
import sys
import time
from functools import partial

import numpy as np

REFERENCE_ITERS_PER_SEC = 450000 / (131 * 3600)  # 2x V100, README.md:110-115


def main():
    parser = argparse.ArgumentParser()
    # warmup must cover one full regularizer cadence (d_reg every 16) TWICE:
    # the reg steps recompile when they first consume step-produced buffer
    # layouts rather than freshly-initialized params.
    parser.add_argument("--iters", type=int, default=48)
    parser.add_argument("--warmup", type=int, default=33)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--dtype", type=str, default="bfloat16")
    parser.add_argument("--remove_ratio", type=float, default=0.7)
    parser.add_argument("--remat", action="store_true", default=False,
                        help="checkpoint synthesis blocks (1024px memory)")
    parser.add_argument("--fused", action="store_true", default=False,
                        help="use the single-jit fused D+G step")
    parser.add_argument("--metric", type=str, default="retrain",
                        choices=["retrain", "generate"],
                        help="retrain iters/s (default) or generation "
                             "images/s/chip for the pruned student")
    args = parser.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from content_aware_gan_compression_tpu.models import (
        GeneratorConfig, DiscriminatorConfig, generator_init,
        discriminator_init, default_net_shape)
    from content_aware_gan_compression_tpu.parallel import (
        make_mesh, shard_batch, replicate)
    from content_aware_gan_compression_tpu.train import (
        TrainConfig, make_train_steps, make_optimizers, ema_accumulate)

    cfg = TrainConfig(generated_img_size=args.size,
                      batch_size=args.batch_size,
                      compute_dtype=args.dtype, remat=args.remat)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else None

    # 11x-compressed student: keep ceil(width * (1 - ratio)) per layer
    full = default_net_shape(args.size)
    student_shape = tuple(c - int(c * args.remove_ratio) for c in full)
    g_config = GeneratorConfig(size=args.size, net_shape=student_shape)
    t_config = GeneratorConfig(size=args.size)
    d_config = DiscriminatorConfig(size=args.size)

    if args.metric == "generate":
        # images/s/chip on the pruned student (BASELINE.md tracked metric);
        # reference full-size @256px is ~45.1 GFLOPs/img, pruned ~11x less.
        import time as _t

        from content_aware_gan_compression_tpu.models import generator_apply

        rd = jax.jit(lambda y: jnp.sum(y.astype(jnp.float32)))
        p = generator_init(jax.random.PRNGKey(0), g_config)
        f = jax.jit(lambda p, z, k: generator_apply(
            p, g_config, [z], rng=k, dtype=dtype))
        z = jax.random.normal(jax.random.PRNGKey(1), (args.batch_size, 512))
        float(rd(f(p, z, jax.random.PRNGKey(2))))
        t0 = _t.perf_counter()
        outs = [f(p, z, jax.random.PRNGKey(i)) for i in range(args.iters)]
        float(rd(outs[-1]))
        ips = args.batch_size * args.iters / (_t.perf_counter() - t0)
        print(json.dumps({
            "metric": f"generate_{args.size}px_images_per_sec_per_chip",
            "value": round(ips, 1), "unit": "img/s", "vs_baseline": None}))
        return

    mesh = make_mesh()
    rng = jax.random.PRNGKey(0)
    k1, k2, k3, rng = jax.random.split(rng, 4)
    g_params = replicate(mesh, generator_init(k1, g_config))
    t_params = replicate(mesh, generator_init(k2, t_config))
    d_params = replicate(mesh, discriminator_init(k3, d_config))
    g_ema = jax.tree_util.tree_map(jnp.copy, g_params)  # true copy: g_params buffers are donated

    g_opt, d_opt = make_optimizers(cfg)
    g_opt_state = g_opt.init(g_params)
    d_opt_state = d_opt.init(d_params)

    d_step, d_reg_step, g_step, g_reg_step, dg_step = make_train_steps(
        g_config, d_config, cfg, teacher_config=t_config, dtype=dtype)
    d_step = jax.jit(partial(d_step, d_opt=d_opt), donate_argnums=(1, 2))
    d_reg_step = jax.jit(partial(d_reg_step, d_opt=d_opt),
                         donate_argnums=(0, 1))
    g_step = jax.jit(partial(g_step, g_opt=g_opt), donate_argnums=(0, 1))
    g_reg_step = jax.jit(partial(g_reg_step, g_opt=g_opt),
                         donate_argnums=(0, 1))
    dg_step = jax.jit(partial(dg_step, d_opt=d_opt, g_opt=g_opt),
                      donate_argnums=(0, 1, 2, 3))
    ema = jax.jit(ema_accumulate, donate_argnums=(0,))

    real = shard_batch(mesh, jax.random.normal(
        jax.random.PRNGKey(9), (args.batch_size, 3, args.size, args.size)))
    mpl = jnp.asarray(0.0)

    def one_iter(i, g_params, d_params, g_opt_state, d_opt_state, g_ema, mpl,
                 rng):
        rng, k_dg, k_r = jax.random.split(rng, 3)
        if args.fused:
            g_params, g_opt_state, d_params, d_opt_state, m = dg_step(
                g_params, g_opt_state, d_params, d_opt_state, real, k_dg,
                t_params, None, None)
            if i % cfg.d_reg_freq == 0:
                d_params, d_opt_state, _ = d_reg_step(d_params, d_opt_state,
                                                      real)
        else:
            k_d, k_g = jax.random.split(k_dg)
            d_params, d_opt_state, _ = d_step(g_params, d_params, d_opt_state,
                                              real, k_d)
            if i % cfg.d_reg_freq == 0:
                d_params, d_opt_state, _ = d_reg_step(d_params, d_opt_state,
                                                      real)
            g_params, g_opt_state, m = g_step(g_params, g_opt_state, d_params,
                                              k_g, t_params, None, None)
        if i % cfg.g_reg_freq == 0:
            g_params, g_opt_state, mpl, _ = g_reg_step(g_params, g_opt_state,
                                                       k_r, mpl)
        g_ema = ema(g_ema, g_params, 0.5 ** (32 / 10000))
        return g_params, d_params, g_opt_state, d_opt_state, g_ema, mpl, rng, m

    state = (g_params, d_params, g_opt_state, d_opt_state, g_ema, mpl, rng)
    for i in range(args.warmup):
        *state, m = one_iter(i, *state)
        float(m["g"])  # fetch-block: the relay's block_until_ready is lax

    per_iter = []
    t0 = time.perf_counter()
    for i in range(args.iters):
        t1 = time.perf_counter()
        *state, m = one_iter(i + args.warmup, *state)
        float(m["g"])  # one scalar fetch per iter; device stream is ordered
        per_iter.append(time.perf_counter() - t1)
    dt = time.perf_counter() - t0
    print("per-iter ms:", [round(t * 1000) for t in per_iter],
          file=sys.stderr)

    iters_per_sec = args.iters / dt
    print(json.dumps({
        "metric": "retrain_iters_per_sec",
        "value": round(iters_per_sec, 4),
        "unit": "iter/s",
        "vs_baseline": round(iters_per_sec / REFERENCE_ITERS_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
