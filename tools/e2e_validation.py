#!/usr/bin/env python
"""End-to-end production-rate validation (VERDICT round-2 "Missing #2").

Builds everything a real `train.py` run needs — on-disk image data and
checkpoint files — with synthetic values (identical shapes/FLOPs to trained
artifacts), then runs the ACTUAL train.py CLI as a subprocess: disk-backed
loader, full KD objective (LPIPS + BiSeNet masking), logging, checkpointing,
and (optionally) one overlapped in-loop FID cycle. Reports the steady-state
e2e iteration rate from the run's own metrics.jsonl, for comparison against
the device-only bench.py number.

Usage (TPU, ~compile + a few minutes of steady state):
  python tools/e2e_validation.py --workdir /tmp/cagc_e2e --iters 520

Everything is reused from the package; nothing here is a second loop.
"""

import argparse
import json
import os
import pickle
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def synth_data(workdir: str, n_images: int, src_size: int, size: int) -> str:
    """Synthetic JPEG folder (src_size, like raw FFHQ) + uint8 cache at the
    training size — the loader auto-prefers the cache (data/dataset.py)."""
    from content_aware_gan_compression_tpu.data import (
        build_uint8_cache, cache_path_for)
    from tools.bench_loader import make_synthetic_folder

    folder = os.path.join(workdir, "imgs")
    if not os.path.isdir(folder) or len(os.listdir(folder)) < n_images:
        t0 = time.time()
        make_synthetic_folder(folder, n_images, src_size)
        print(f"# data: {n_images} JPEGs @{src_size}px in {time.time()-t0:.0f}s")
    if not os.path.exists(cache_path_for(folder, size)):
        t0 = time.time()
        build_uint8_cache(folder, size)
        print(f"# uint8 cache @{size}px in {time.time()-t0:.0f}s")
    return folder


def synth_ckpts(workdir: str, size: int, remove_ratio: float) -> dict:
    """Teacher/student .npz + torch-format aux-net checkpoint files with the
    exact key schemas the CLI importers expect (synthetic weights)."""
    import jax
    import torch

    from content_aware_gan_compression_tpu.models import (
        GeneratorConfig, DiscriminatorConfig, generator_init,
        discriminator_init, default_net_shape)
    from content_aware_gan_compression_tpu.models.bisenet import bisenet_init
    from content_aware_gan_compression_tpu.models.inception import (
        inception_init)
    from content_aware_gan_compression_tpu.models.lpips import (
        VGG16_CONVS, LPIPS_CHANNELS)
    from content_aware_gan_compression_tpu.pruning import (
        get_uniform_remove_list)
    from content_aware_gan_compression_tpu.utils.checkpoint import (
        save_checkpoint, pytree_to_torch_state_dict)

    paths = {}
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 8)

    t_cfg = GeneratorConfig(size=size)
    full = default_net_shape(size)
    rmv = get_uniform_remove_list(full, remove_ratio)
    s_cfg = GeneratorConfig(size=size,
                            net_shape=tuple(c - r for c, r in zip(full, rmv)))
    d_cfg = DiscriminatorConfig(size=size)

    paths["teacher"] = os.path.join(workdir, "teacher.npz")
    if not os.path.exists(paths["teacher"]):
        t = generator_init(ks[0], t_cfg)
        save_checkpoint(paths["teacher"], {"g": t, "g_ema": t})

    paths["student"] = os.path.join(workdir, "student.npz")
    if not os.path.exists(paths["student"]):
        s = generator_init(ks[1], s_cfg)
        save_checkpoint(paths["student"],
                        {"g": s, "g_ema": s,
                         "d": discriminator_init(ks[2], d_cfg)})

    paths["vgg16"] = os.path.join(workdir, "vgg16_features.pth")
    if not os.path.exists(paths["vgg16"]):
        sd = {}
        g = torch.Generator().manual_seed(0)
        for idx, cin, cout in VGG16_CONVS:
            sd[f"features.{idx}.weight"] = torch.randn(
                (cout, cin, 3, 3), generator=g) * (2.0 / (cin * 9)) ** 0.5
            sd[f"features.{idx}.bias"] = torch.zeros(cout)
        torch.save(sd, paths["vgg16"])

    paths["lins"] = os.path.join(workdir, "lpips_lins.pth")
    if not os.path.exists(paths["lins"]):
        torch.save({f"lin{i}.model.1.weight": torch.full((1, c, 1, 1), 1.0 / c)
                    for i, c in enumerate(LPIPS_CHANNELS)}, paths["lins"])

    paths["bisenet"] = os.path.join(workdir, "bisenet.pth")
    if not os.path.exists(paths["bisenet"]):
        # the param pytree mirrors the torch state-dict key paths exactly
        # (CLAUDE.md invariant), so flattening it back IS the checkpoint
        sd = {k2: torch.tensor(np.asarray(v)) for k2, v in
              pytree_to_torch_state_dict(bisenet_init(ks[3])).items()}
        torch.save(sd, paths["bisenet"])

    paths["inception"] = os.path.join(workdir, "inception.pth")
    if not os.path.exists(paths["inception"]):
        sd = {k2: torch.tensor(np.asarray(v)) for k2, v in
              pytree_to_torch_state_dict(inception_init(ks[4])).items()}
        torch.save(sd, paths["inception"])

    paths["real_stats"] = os.path.join(workdir, "real_stats.pkl")
    if not os.path.exists(paths["real_stats"]):
        rng = np.random.default_rng(0)
        feats = rng.standard_normal((4096, 2048))
        with open(paths["real_stats"], "wb") as f:
            pickle.dump({"mean": feats.mean(0),
                         "cov": np.cov(feats, rowvar=False)}, f)
    return paths


def steady_rate(exp_root: str, skip: int) -> tuple[float, float, int]:
    """(median_rate, mean_rate, n) steady-state iters/s from the newest
    run's metrics.jsonl, skipping the first `skip` iterations. The median is
    the steady-state number: the window still contains one-time costs (the
    first compile of the sequential-dispatch path around the FID/ckpt event,
    the inception jit) that a long production run amortizes to zero but that
    dominate an arithmetic mean over a few hundred iterations. The mean is
    reported alongside as the everything-included rate of THIS short run."""
    import statistics

    exps = sorted(d for d in os.listdir(exp_root) if
                  os.path.isdir(os.path.join(exp_root, d)))
    path = os.path.join(exp_root, exps[-1], "metrics.jsonl")
    times = []
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if "train_time" in rec and rec.get("iter", 0) >= skip:
                times.append(rec["train_time"])
    if not times:
        raise RuntimeError(f"no steady-state iterations in {path}")
    return (1.0 / statistics.median(times),
            1.0 / (sum(times) / len(times)), len(times))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/cagc_e2e")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--iters", type=int, default=520)
    ap.add_argument("--skip", type=int, default=120,
                    help="iterations excluded from the steady-state window")
    ap.add_argument("--n_images", type=int, default=512)
    ap.add_argument("--src_size", type=int, default=1024)
    ap.add_argument("--remove_ratio", type=float, default=0.7)
    ap.add_argument("--fid", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="fire one overlapped in-loop FID cycle mid-run")
    ap.add_argument("--fid_n_sample", type=int, default=4096)
    ap.add_argument("--fid_batch", type=int, default=None,
                    help="override train.py's fid_batch (the 1024px "
                         "operating envelope searched by tools/"
                         "hbm_envelope.py is committed in docs/"
                         "HBM_ENVELOPE.json)")
    ap.add_argument("--data_echo", type=int, default=1,
                    help="train.py --data_echo passthrough (data echoing "
                         "factor; mitigation for the tunneled relay's "
                         "post-fetch put cap — docs/ROUND5_NOTES.md)")
    ap.add_argument("--timeout", type=int, default=5000)
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    folder = synth_data(args.workdir, args.n_images, args.src_size, args.size)
    paths = synth_ckpts(args.workdir, args.size, args.remove_ratio)

    exp_root = os.path.join(args.workdir, "exp")
    os.makedirs(exp_root, exist_ok=True)
    cmd = [
        sys.executable, os.path.join(REPO, "train.py"),
        "--path", folder, "--size", str(args.size),
        "--ckpt", paths["student"], "--teacher_ckpt", paths["teacher"],
        "--iter", str(args.iters), "--batch_size", str(args.batch_size),
        "--dtype", "bfloat16",
        "--lpips_vgg_ckpt", paths["vgg16"],
        "--lpips_lins_ckpt", paths["lins"],
        "--parsing_ckpt", paths["bisenet"],
        "--exp_root", exp_root,
        # sampling off within the window; one FID/ckpt event mid-run
        "--val_sample_freq", str(args.iters + 1),
        "--model_save_freq",
        str(args.iters // 2 if args.fid else args.iters + 1),
        "--fid_n_sample", str(args.fid_n_sample),
    ]
    if args.fid:
        cmd += ["--inception_ckpt", paths["inception"],
                "--real_stats", paths["real_stats"]]
    if args.fid_batch is not None:
        cmd += ["--fid_batch", str(args.fid_batch)]
    if args.data_echo != 1:
        cmd += ["--data_echo", str(args.data_echo)]
    print("#", " ".join(cmd))
    t0 = time.time()
    rc = subprocess.run(cmd, timeout=args.timeout).returncode
    wall = time.time() - t0
    if rc != 0:
        raise SystemExit(f"train.py failed rc={rc}")

    rate, mean_rate, n = steady_rate(exp_root, args.skip)
    print(json.dumps({
        "metric": "e2e_train_iters_per_sec", "value": round(rate, 4),
        "mean_incl_onetime_compiles": round(mean_rate, 4),
        "unit": "iter/s", "steady_iters": n, "wall_s": round(wall, 1),
        "batch_size": args.batch_size, "size": args.size,
        "objective": "full_kd", "fid_cycle": bool(args.fid),
        "data_echo": args.data_echo}))


if __name__ == "__main__":
    main()
