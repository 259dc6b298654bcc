#!/usr/bin/env python
"""Benchmark: distillation-retraining throughput on the real TPU chip.

Measures the full per-iteration work of the reference's core loop (SURVEY.md
section 3.2) on the 11x-compressed 256px student with the full-size teacher:
D GAN step + G GAN+KD step every iteration, R1 every 16, path-length every 4,
EMA every iteration — the same cadence as train_hyperparams.py.

The DEFAULT objective is the reference's default config
(train_hyperparams.py:33-37): content-aware KD with a BiSeNet parse of the
teacher batch (content masking) AND the LPIPS-VGG16 KD term every G step
(reference train.py:509-518) — the job the 131 V100-hour baseline paid for.
Aux-net params are synthetically initialized (identical FLOPs to trained
weights). `--no-full_objective` benches the lighter GAN + unmasked-L1 job.

Prints ONE JSON line:
  {"metric": "retrain_iters_per_sec", "value": N, "unit": "iter/s",
   "vs_baseline": ...}

Baseline: the reference retrains 450k iters in 131 h on 2x V100
(README.md:110-115) = 0.954 iter/s. vs_baseline = ours / 0.954.
"""

import argparse
import json
import math
import os
import sys
import time
from functools import partial

import numpy as np

REFERENCE_ITERS_PER_SEC = 450000 / (131 * 3600)  # 2x V100, README.md:110-115
# 1024px retrain: 450k iters in 251 h on 4x V100 (reference README.md:110-115)
REFERENCE_ITERS_PER_SEC_1024 = 450000 / (251 * 3600)


def _trace_flops_per_iter(trace_dir, iters):
    """EXECUTED hardware flops per iteration, summed from the device
    trace's per-op model_flops (the field tools/trace_op_time.py
    attributes) — includes the remat replays and the packed trunk's
    deliberate dense-flop inflation that the model-MAC `mfu` numerator
    excludes by design (docs/ROUND4_NOTES.md: useful-MAC MFU vs hardware
    flop utilization). XLA's compiled cost_analysis() is NOT usable here:
    it reported 8.71 TFLOP/iter for the 1024px scanned multi-step whose
    trace-measured executed volume is 86.2 TFLOP/iter — the while-body
    accounting does not multiply by trip count (measured round 5)."""
    try:
        import contextlib

        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "tools"))
        from trace_op_time import load_json_events
        with contextlib.redirect_stdout(sys.stderr):  # keep the ONE-json-
            ev = load_json_events(trace_dir)          # line stdout contract
        fl = sum(float(e.get("args", {}).get("model_flops", 0) or 0)
                 for e in ev)
        return fl / iters
    except Exception as e:  # noqa: BLE001 - trace formats vary
        print(f"# trace flops unavailable: {type(e).__name__}: {e}",
              file=sys.stderr)
        return None


def main():
    parser = argparse.ArgumentParser()
    # warmup must cover one full regularizer cadence (d_reg every 16) TWICE:
    # the reg steps recompile when they first consume step-produced buffer
    # layouts rather than freshly-initialized params.
    parser.add_argument("--iters", type=int, default=64)
    parser.add_argument("--warmup", type=int, default=33)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--dtype", type=str, default="bfloat16")
    parser.add_argument("--opt_state_dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"],
                        help="Adam second-moment storage dtype (bf16 halves "
                             "its HBM traffic; off-reference numerics)")
    parser.add_argument("--remove_ratio", type=float, default=0.7)
    parser.add_argument("--keep_multiple", type=int, default=1,
                        help="round kept student widths UP to this multiple "
                             "(lane-friendly pruning, prune.py extension); "
                             "64 pads low-C layers onto full 64-lane bf16 "
                             "tiles at 1024px")
    parser.add_argument("--remat", action="store_true", default=False,
                        help="checkpoint synthesis blocks (1024px memory)")
    parser.add_argument("--packed", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="space-to-depth packed trunk for the "
                             "lane-sparse high-res layers (--no-packed "
                             "for the unpacked baseline)")
    parser.add_argument("--trace_dir", type=str, default=None,
                        help="write a jax.profiler trace of the timed window "
                             "(fused-dispatch path only)")
    parser.add_argument("--per_iter_fetch", action="store_true", default=False,
                        help="fetch a scalar every iteration (adds one relay "
                             "round-trip ~27ms/iter on tunneled dev boxes; "
                             "default measures pipelined steady state, which "
                             "is how the production loop runs)")
    parser.add_argument("--packed_max_ch", type=int, default=64,
                        help="pack trunk pairs with width <= this "
                             "(threshold sweep: 32/64/128)")
    parser.add_argument("--packed_min_res", type=int, default=64,
                        help="pack trunk pairs at res >= this in TRAINING "
                             "(threshold sweep: 64/512)")
    parser.add_argument("--full_objective", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="bench the reference's default objective: "
                             "content-aware KD (BiSeNet parse of the teacher "
                             "batch) + LPIPS-KD every G step "
                             "(train_hyperparams.py:33-37). "
                             "--no-full_objective = GAN + unmasked L1 only")
    parser.add_argument("--metric", type=str, default="retrain",
                        choices=["retrain", "generate"],
                        help="retrain iters/s (default) or generation "
                             "images/s/chip for the pruned student")
    parser.add_argument("--steps_per_dispatch", type=int, default=16,
                        help="iterations fused into one lax.scan dispatch "
                             "(train.steps.make_multi_step); 1 = the "
                             "separate-step path. The device does the same "
                             "work either way; K>1 amortizes the ~35 ms/iter "
                             "host dispatch cost of >800-leaf pytrees on a "
                             "1-core host")
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
                      compute_dtype=args.dtype, remat=args.remat,
                      opt_state_dtype=args.opt_state_dtype,
                      packed_trunk=args.packed,
                      packed_max_ch=args.packed_max_ch,
                      packed_min_res=args.packed_min_res)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else None

    # 11x-compressed student: keep ceil(width * (1 - ratio)) per layer
    from content_aware_gan_compression_tpu.pruning import (
        get_uniform_remove_list)

    full = default_net_shape(args.size)
    rmv = get_uniform_remove_list(full, args.remove_ratio,
                                  keep_multiple=args.keep_multiple)
    student_shape = tuple(c - r for c, r in zip(full, rmv))
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
        # forward-only: pack only res>=512 pairs (generate.py default; the
        # res-256 pair packing that wins in training loses here)
        f = jax.jit(lambda p, z, k: generator_apply(
            p, g_config, [z], rng=k, dtype=dtype, packed=args.packed,
            packed_min_res=512))
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
    k1, k2, k3, k4, k5, rng = jax.random.split(rng, 6)
    g_params = replicate(mesh, generator_init(k1, g_config))
    t_params = replicate(mesh, generator_init(k2, t_config))
    d_params = replicate(mesh, discriminator_init(k3, d_config))

    lpips_params = parse_params = None
    if args.full_objective:
        # synthetic aux-net params: identical structure + FLOPs to the
        # trained weights (values don't affect throughput)
        from content_aware_gan_compression_tpu.models.bisenet import (
            bisenet_init)
        from content_aware_gan_compression_tpu.models.lpips import lpips_init
        lpips_params = replicate(mesh, lpips_init(k4))
        parse_params = replicate(mesh, bisenet_init(k5))
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

    # uint8 NHWC reals — the production loop's small-wire format
    # (train/loop.py:193-197): 4x smaller resident on HBM than fp32, and it
    # keeps XLA from hoisting a whole-window fp32 copy of the [K, B, ...]
    # stack out of the scan (measured 1.5 GB of temps at 1024px batch 16).
    real_u8 = shard_batch(mesh, jax.random.randint(
        jax.random.PRNGKey(9), (args.batch_size, args.size, args.size, 3),
        0, 256, dtype=jnp.uint8))
    real = jax.jit(lambda x: x.astype(jnp.float32) / 127.5 - 1.0)(real_u8)
    mpl = jnp.asarray(0.0)

    if args.steps_per_dispatch > 1:
        from content_aware_gan_compression_tpu.parallel import (
            shard_stacked_batches)
        from content_aware_gan_compression_tpu.train import make_multi_step

        K = args.steps_per_dispatch
        multi = jax.jit(
            partial(make_multi_step(g_config, d_config, cfg,
                                    teacher_config=t_config, dtype=dtype),
                    d_opt=d_opt, g_opt=g_opt),
            donate_argnums=(0, 1, 2, 3, 4, 5, 6))
        reals = shard_stacked_batches(mesh, jnp.broadcast_to(
            real_u8, (K,) + real_u8.shape))
        state = (g_params, g_opt_state, d_params, d_opt_state, g_ema, mpl,
                 rng)
        # strong-typed: Python floats would cost one extra trace (weak f32[]
        # avals) before the warm dispatches settle on the returned arrays
        last_reg = tuple(jnp.asarray(0.0, jnp.float32) for _ in range(3))
        it = 0
        # warm TWO dispatches: reg steps re-specialize when they first
        # consume step-produced buffer layouts (see --warmup note above)
        for _ in range(max(2, -(-args.warmup // K))):
            *state, last_reg, m = multi(*state, reals, it, last_reg,
                                        t_params, lpips_params,
                                        parse_params)
            it += K
            float(m["g"][-1])
        n_disp = max(1, args.iters // K)
        ctx = None
        if args.trace_dir:
            ctx = jax.profiler.trace(args.trace_dir)
            ctx.__enter__()
        t0 = time.perf_counter()
        for _ in range(n_disp):
            *state, last_reg, m = multi(*state, reals, it, last_reg,
                                        t_params, lpips_params,
                                        parse_params)
            it += K
        float(m["g"][-1])
        dt = time.perf_counter() - t0
        if ctx is not None:
            ctx.__exit__(None, None, None)
        iters_per_sec = n_disp * K / dt
        # executed flops for hw_flop_util: from the timed window's trace if
        # one was requested, else from one extra self-traced dispatch
        # (outside the timed window either way)
        tdir, traced_iters = args.trace_dir, n_disp * K
        if tdir is None:
            import tempfile
            tdir, traced_iters = tempfile.mkdtemp(prefix="bench_flops_"), K
            with jax.profiler.trace(tdir):
                *state, last_reg, m = multi(*state, reals, it, last_reg,
                                            t_params, lpips_params,
                                            parse_params)
                it += K
                float(m["g"][-1])
        exec_flops = _trace_flops_per_iter(tdir, traced_iters)
        _report(args, cfg, iters_per_sec, g_config, t_config,
                exec_flops_per_iter=exec_flops)
        return

    def one_iter(i, g_params, d_params, g_opt_state, d_opt_state, g_ema, mpl,
                 rng):
        """Mirror Trainer.step exactly: fused D+G single jit on iterations
        with no R1; separate steps in the reference order (D gan -> R1 ->
        G gan) when the R1 regularizer fires (every 16)."""
        rng, k_dg, k_r = jax.random.split(rng, 3)
        if i % cfg.d_reg_freq == 0:
            k_d, k_g = jax.random.split(k_dg)
            d_params, d_opt_state, _ = d_step(g_params, d_params, d_opt_state,
                                              real, k_d)
            d_params, d_opt_state, _ = d_reg_step(d_params, d_opt_state, real)
            g_params, g_opt_state, m = g_step(g_params, g_opt_state, d_params,
                                              k_g, t_params, lpips_params,
                                              parse_params)
        else:
            g_params, g_opt_state, d_params, d_opt_state, m = dg_step(
                g_params, g_opt_state, d_params, d_opt_state, real, k_dg,
                t_params, lpips_params, parse_params)
        if i % cfg.g_reg_freq == 0:
            g_params, g_opt_state, mpl, _ = g_reg_step(g_params, g_opt_state,
                                                       k_r, mpl)
        g_ema = ema(g_ema, g_params, 0.5 ** (32 / 10000))
        return g_params, d_params, g_opt_state, d_opt_state, g_ema, mpl, rng, m

    state = (g_params, d_params, g_opt_state, d_opt_state, g_ema, mpl, rng)
    for i in range(args.warmup):
        *state, m = one_iter(i, *state)
        float(m["g"])  # fetch-block: the relay's block_until_ready is lax

    # Steady-state timing: dispatch every iteration, fence ONCE on a scalar
    # at the end. The device stream is ordered, so total wall time == device
    # time for the whole window; a per-iteration fetch would add one relay
    # round-trip (~27 ms measured on the tunneled dev box) per iteration
    # that the production loop does not pay (it overlaps its metric fetch
    # with the next step's execution — train/loop.py).
    per_iter = []
    t0 = time.perf_counter()
    for i in range(args.iters):
        t1 = time.perf_counter()
        *state, m = one_iter(i + args.warmup, *state)
        if args.per_iter_fetch:
            float(m["g"])
            per_iter.append(time.perf_counter() - t1)
    float(m["g"])
    dt = time.perf_counter() - t0
    if per_iter:
        print("per-iter ms:", [round(t * 1000) for t in per_iter],
              file=sys.stderr)

    iters_per_sec = args.iters / dt
    _report(args, cfg, iters_per_sec, g_config, t_config)


def _report(args, cfg, iters_per_sec, g_config, t_config,
            exec_flops_per_iter=None):
    import jax
    from content_aware_gan_compression_tpu.models import generator_init

    # MFU: per-iteration MACs from the reference-formula calculators
    # (utils/calculators.py), standard 1x/3x fwd/bwd multipliers, over the
    # measured-achievable chip peak.
    from content_aware_gan_compression_tpu.utils.calculators import (
        stylegan2_flops, discriminator_flops, vgg16_lpips_flops,
        bisenet_flops)

    g_macs = stylegan2_flops(generator_init(jax.random.PRNGKey(0), g_config))
    t_macs = stylegan2_flops(generator_init(jax.random.PRNGKey(0), t_config))
    d_macs = discriminator_flops(args.size)
    B = args.batch_size
    per_iter_macs = (
        # d phase: student fwd + 2x D fwd+bwd(params) (3x fwd each)
        B * (g_macs + 2 * 3 * d_macs)
        # g phase: student fwd+bwd (3x) + D fwd + D input-bwd (2x) + teacher
        + B * (3 * g_macs + 2 * d_macs + t_macs)
        # R1 every d_reg_freq: grad-of-grad ~ 2x a fwd+bwd pass
        + B * (2 * 3 * d_macs) / cfg.d_reg_freq
        # path length every g_reg_freq at B/2: ~2x a fwd+bwd pass
        + (B // cfg.path_reg_batch_shrink) * (2 * 3 * g_macs) / cfg.g_reg_freq
    )
    if args.full_objective:
        # KD-LPIPS every G step: student branch fwd + input-grad bwd (2x),
        # teacher branch fwd only (stop-gradiented) — LPIPS inputs are
        # 256px at every training size (>256 is pooled down first,
        # reference train.py:176-182); BiSeNet content-masking parse of the
        # teacher batch at 512px, fwd only (the mask is data, no gradient)
        per_iter_macs += B * (3 * vgg16_lpips_flops(256) + bisenet_flops(512))
    PEAK_TFLOPS = float(os.environ.get("CAGC_PEAK_TFLOPS", "197"))  # v5e bf16
    mfu = (per_iter_macs * 2 * iters_per_sec) / (PEAK_TFLOPS * 1e12)

    ref_rate = (REFERENCE_ITERS_PER_SEC_1024 if args.size == 1024
                else REFERENCE_ITERS_PER_SEC)
    # vs_baseline compares IMAGES/s of the whole job: the reference rates are
    # at global batch 16 (README.md:110-115), so a run at a different batch
    # size is scaled by B/16 — raw iteration rates at unequal batch sizes
    # are not comparable.
    out = {
        "metric": ("retrain_iters_per_sec" if args.size == 256
                   else f"retrain_iters_per_sec_{args.size}px"),
        "value": round(iters_per_sec, 4),
        "unit": "iter/s",
        "vs_baseline": round(iters_per_sec * B / (ref_rate * 16), 4),
        "mfu": round(mfu, 4),
        # the reference default config (content-aware KD + LPIPS-KD) vs the
        # lighter GAN + unmasked-L1 job — apples-to-apples marker
        "objective": "full_kd" if args.full_objective else "gan_l1",
    }
    if exec_flops_per_iter:
        # mfu counts ALGORITHMIC model MACs (what the job is paid to do);
        # hw_flop_util counts what the hardware EXECUTED (remat replay +
        # the packed trunk's measured-faster dense-flop inflation) — the
        # gap is flops deliberately spent to buy wall-clock (VERDICT r4 #5)
        out["executed_tflop_per_iter"] = round(exec_flops_per_iter / 1e12, 2)
        out["hw_flop_util"] = round(
            exec_flops_per_iter * iters_per_sec / (PEAK_TFLOPS * 1e12), 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
