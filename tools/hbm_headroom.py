#!/usr/bin/env python
"""HBM headroom with an overlapped in-loop FID resident (VERDICT r2 weak #5).

During an overlapped FID eval the device simultaneously holds: student +
teacher + D params, both optimizer states, the live g_ema, the aux nets
(LPIPS-VGG16 + BiSeNet), the K-step input window, the g_ema SNAPSHOT the
eval scores, inception params, and one in-flight feature batch. This tool
builds exactly that worst case at a given size/batch (default: the 1024px
batch-16 operating point from README.md), interleaves one multi-step
dispatch with eval advances — the production schedule (train/loop.py
fid_tick) — and reports the device's peak/current HBM from
`Device.memory_stats()`, or a buffer-accounting fallback when the backend
does not expose allocator stats.

Prints one JSON line:
  {"peak_gib": ..., "limit_gib": ..., "headroom_gib": ..., ...}
"""

import argparse
import json
import os
import sys
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--fid_batch", type=int, default=16)
    ap.add_argument("--steps_per_dispatch", type=int, default=8)
    ap.add_argument("--remove_ratio", type=float, default=0.7)
    ap.add_argument("--remat", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="default: off (the production train/config.py "
                         "default; measured 11%% faster at 1024 B16 and "
                         "fits — docs/ROUND4_NOTES.md)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from content_aware_gan_compression_tpu.evaluation import OverlappedFIDEval
    from content_aware_gan_compression_tpu.models import (
        GeneratorConfig, DiscriminatorConfig, generator_init,
        discriminator_init, default_net_shape)
    from content_aware_gan_compression_tpu.models.bisenet import bisenet_init
    from content_aware_gan_compression_tpu.models.inception import (
        inception_init)
    from content_aware_gan_compression_tpu.models.lpips import lpips_init
    from content_aware_gan_compression_tpu.parallel import (
        make_mesh, replicate, shard_stacked_batches)
    from content_aware_gan_compression_tpu.pruning import (
        get_uniform_remove_list)
    from content_aware_gan_compression_tpu.train import (
        TrainConfig, make_multi_step, make_optimizers)

    remat = args.remat if args.remat is not None else False
    cfg = TrainConfig(generated_img_size=args.size,
                      batch_size=args.batch_size, compute_dtype="bfloat16",
                      remat=remat)
    dtype = jnp.bfloat16

    full = default_net_shape(args.size)
    rmv = get_uniform_remove_list(full, args.remove_ratio)
    g_config = GeneratorConfig(size=args.size,
                               net_shape=tuple(c - r for c, r
                                               in zip(full, rmv)))
    t_config = GeneratorConfig(size=args.size)
    d_config = DiscriminatorConfig(size=args.size)

    mesh = make_mesh()
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    g_params = replicate(mesh, generator_init(ks[0], g_config))
    t_params = replicate(mesh, generator_init(ks[1], t_config))
    d_params = replicate(mesh, discriminator_init(ks[2], d_config))
    lpips_params = replicate(mesh, lpips_init(ks[3]))
    parse_params = replicate(mesh, bisenet_init(ks[4]))
    inc_params = replicate(mesh, inception_init(ks[5]))
    g_ema = jax.tree_util.tree_map(jnp.copy, g_params)

    g_opt, d_opt = make_optimizers(cfg)
    g_opt_state, d_opt_state = g_opt.init(g_params), d_opt.init(d_params)

    K = args.steps_per_dispatch
    multi = jax.jit(
        partial(make_multi_step(g_config, d_config, cfg,
                                teacher_config=t_config, dtype=dtype),
                d_opt=d_opt, g_opt=g_opt),
        donate_argnums=(0, 1, 2, 3, 4, 5, 6))
    real_u8 = jax.random.randint(
        ks[6], (args.batch_size, args.size, args.size, 3), 0, 256,
        dtype=jnp.uint8)
    reals = shard_stacked_batches(
        mesh, jnp.broadcast_to(real_u8, (K,) + real_u8.shape))
    state = (g_params, g_opt_state, d_params, d_opt_state, g_ema,
             jnp.asarray(0.0), ks[7])
    last_reg = tuple(jnp.asarray(0.0, jnp.float32) for _ in range(3))

    # warm the training dispatch (compile + layout specialization)
    it = 0
    for _ in range(2):
        *state, last_reg, m = multi(*state, reals, it, last_reg,
                                    t_params, lpips_params, parse_params)
        it += K
    float(m["g"][-1])

    # tiny real stats: FID math is irrelevant here, only residency matters
    rng = np.random.default_rng(0)
    f = rng.standard_normal((64, 2048))
    stats = {"mean": f.mean(0), "cov": np.cov(f, rowvar=False)}

    # production schedule: snapshot g_ema, then interleave eval batches with
    # training dispatches (train/loop.py:485-523 fid_tick cadence)
    ev = OverlappedFIDEval(state[4], g_config, inc_params, stats,
                           batch_size=args.fid_batch,
                           n_sample=4 * args.fid_batch, rng=jax.random.
                           PRNGKey(1), mesh=mesh, packed=cfg.packed_trunk)
    for _ in range(2):
        *state, last_reg, m = multi(*state, reals, it, last_reg,
                                    t_params, lpips_params, parse_params)
        it += K
        ev.advance(2)
    float(m["g"][-1])

    dev = jax.local_devices()[0]
    ms = dev.memory_stats() or {}
    peak = ms.get("peak_bytes_in_use")
    limit = ms.get("bytes_limit")
    out = {
        "metric": "hbm_peak_with_overlapped_fid",
        "size": args.size, "batch_size": args.batch_size,
        "fid_batch": args.fid_batch, "steps_per_dispatch": K,
        "remat": remat, "platform": dev.platform,
    }
    if peak:
        out["peak_gib"] = round(peak / 2**30, 2)
        out["in_use_gib"] = round(ms.get("bytes_in_use", 0) / 2**30, 2)
        if limit:
            out["limit_gib"] = round(limit / 2**30, 2)
            out["headroom_gib"] = round((limit - peak) / 2**30, 2)
    else:
        # allocator stats unavailable (e.g. relay backends): account live
        # buffers by hand — a lower bound that misses XLA temp scratch
        live = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                   for a in jax.live_arrays())
        out["live_buffers_gib"] = round(live / 2**30, 2)
        out["note"] = "allocator stats unavailable; live-buffer lower bound"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
