#!/usr/bin/env python
"""Per-phase training-time profiler (reference
Miscellaneous/train_time_profiler.py): times each phase of the distillation
loop — D step, R1 step, G GAN+KD step, path-length step, EMA — with honest
`block_until_ready` fences, plus an optional jax.profiler trace for xprof.

Runs on synthetic data so it needs no dataset; pass --ckpt/--teacher_ckpt to
profile real shapes, or omit them to profile a randomly-initialized
compressed-student + full-teacher pair.
"""

import argparse
import json
import time
from functools import partial


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--remove_ratio", type=float, default=0.7)
    parser.add_argument("--dtype", type=str, default="bfloat16")
    parser.add_argument("--trace_dir", type=str, default=None,
                        help="write a jax.profiler trace here")
    parser.add_argument("--remat", action="store_true", default=False,
                        help="checkpoint synthesis blocks (1024px memory)")
    args = parser.parse_args()
    from content_aware_gan_compression_tpu.utils import (
        enable_compilation_cache)

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from content_aware_gan_compression_tpu.models import (
        GeneratorConfig, DiscriminatorConfig, generator_init,
        discriminator_init, default_net_shape)
    from content_aware_gan_compression_tpu.parallel import (
        make_mesh, shard_batch, replicate)
    from content_aware_gan_compression_tpu.train import (
        TrainConfig, make_train_steps, make_optimizers, ema_accumulate)

    cfg = TrainConfig(generated_img_size=args.size,
                      batch_size=args.batch_size, compute_dtype=args.dtype,
                      remat=args.remat)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else None

    full = default_net_shape(args.size)
    student = tuple(c - int(c * args.remove_ratio) for c in full)
    g_config = GeneratorConfig(size=args.size, net_shape=student)
    t_config = GeneratorConfig(size=args.size)
    d_config = DiscriminatorConfig(size=args.size)

    mesh = make_mesh()
    k = jax.random.PRNGKey(0)
    k1, k2, k3, k = jax.random.split(k, 4)
    g_params = replicate(mesh, generator_init(k1, g_config))
    t_params = replicate(mesh, generator_init(k2, t_config))
    d_params = replicate(mesh, discriminator_init(k3, d_config))
    g_ema = jax.tree_util.tree_map(jnp.copy, g_params)

    g_opt, d_opt = make_optimizers(cfg)
    g_opt_state = g_opt.init(g_params)
    d_opt_state = d_opt.init(d_params)
    d_step, d_reg_step, g_step, g_reg_step, _dg = make_train_steps(
        g_config, d_config, cfg, teacher_config=t_config, dtype=dtype)
    d_step = jax.jit(partial(d_step, d_opt=d_opt))
    d_reg_step = jax.jit(partial(d_reg_step, d_opt=d_opt))
    g_step = jax.jit(partial(g_step, g_opt=g_opt))
    g_reg_step = jax.jit(partial(g_reg_step, g_opt=g_opt))
    ema = jax.jit(ema_accumulate)

    real = shard_batch(mesh, jax.random.normal(
        jax.random.PRNGKey(7), (args.batch_size, 3, args.size, args.size)))
    mpl = jnp.asarray(0.0)

    def _first_leaf(tree):
        return jax.tree_util.tree_leaves(tree)[0]

    def timed(name, fn, *a, **kw):
        """Times one call with a fence on a SINGLE output leaf: the device
        stream executes in order, and blocking on whole param pytrees would
        pay one host round-trip per leaf (hundreds per step)."""
        t0 = time.perf_counter()
        out = fn(*a, **kw)
        jax.block_until_ready(_first_leaf(out))
        return out, time.perf_counter() - t0

    # warmup / compile
    k, kd, kg, kr = jax.random.split(k, 4)
    compile_times = {}
    (_, _, m), compile_times["d_step"] = timed(
        "d_step", d_step, g_params, d_params, d_opt_state, real, kd)
    _, compile_times["d_reg_step"] = timed(
        "d_reg", d_reg_step, d_params, d_opt_state, real)
    _, compile_times["g_step"] = timed(
        "g_step", g_step, g_params, g_opt_state, d_params, kg, t_params,
        None, None)
    _, compile_times["g_reg_step"] = timed(
        "g_reg", g_reg_step, g_params, g_opt_state, kr, mpl)
    _, compile_times["ema"] = timed("ema", ema, g_ema, g_params, 0.999)

    phases = {n: [] for n in
              ("data", "d_step", "d_reg_step", "g_step", "g_reg_step", "ema")}

    ctx = None
    if args.trace_dir:
        ctx = jax.profiler.trace(args.trace_dir)
        ctx.__enter__()

    for i in range(args.iters):
        k, kd, kg, kr = jax.random.split(k, 4)
        t0 = time.perf_counter()
        jax.block_until_ready(real)
        phases["data"].append(time.perf_counter() - t0)
        (d_params, d_opt_state, _), dt = timed(
            "d", d_step, g_params, d_params, d_opt_state, real, kd)
        phases["d_step"].append(dt)
        if i % cfg.d_reg_freq == 0:
            (d_params, d_opt_state, _), dt = timed(
                "dr", d_reg_step, d_params, d_opt_state, real)
            phases["d_reg_step"].append(dt)
        (g_params, g_opt_state, _), dt = timed(
            "g", g_step, g_params, g_opt_state, d_params, kg, t_params,
            None, None)
        phases["g_step"].append(dt)
        if i % cfg.g_reg_freq == 0:
            (g_params, g_opt_state, mpl, _), dt = timed(
                "gr", g_reg_step, g_params, g_opt_state, kr, mpl)
            phases["g_reg_step"].append(dt)
        (g_ema), dt = timed("ema", ema, g_ema, g_params, 0.999)
        phases["ema"].append(dt)

    if ctx is not None:
        ctx.__exit__(None, None, None)

    report = {"compile_s": {k: round(v, 2) for k, v in compile_times.items()}}
    for name, ts in phases.items():
        if ts:
            report[name] = {"mean_ms": round(1000 * sum(ts) / len(ts), 2),
                            "calls": len(ts)}
    amortized = (sum(sum(ts) for ts in phases.values())) / args.iters
    report["amortized_iter_ms"] = round(1000 * amortized, 2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
