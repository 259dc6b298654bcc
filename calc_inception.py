#!/usr/bin/env python
"""Real-image Inception statistics builder — flag-compatible with reference
Evaluation/calc_inception.py (same surface: --size/--batch/--n_sample/--flip
+ a positional dataset path; same output pickle schema
{'mean','cov','size','path'} written to inception_{name}.pkl).

TPU-native differences from the reference (calc_inception.py:75-116):
  * reads an image folder or a prepared uint8 cache (.npy from
    `prepare_data.py --format uint8`) instead of the LMDB store — the
    fastest available backend is picked automatically (data/dataset.py
    open_dataset);
  * features stream through the jitted JAX InceptionV3 FID port at ONE
    fixed batch shape (a single XLA trace; the residual batch is padded by
    wrapping and the surplus feature rows dropped on host, the same policy
    as evaluation/fid.py);
  * images ride the host->device wire as uint8 NHWC and are normalized to
    [-1,1] on device (the reference's ToTensor+Normalize(0.5,0.5),
    calc_inception.py:92-99), entering the patched inception RAW
    (normalize_input=False, calc_inception.py:54).
"""

import argparse
import os
import pickle


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Calculate Inception v3 features for datasets")
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--batch", default=64, type=int, help="batch size")
    parser.add_argument("--n_sample", type=int, default=50000)
    parser.add_argument("--flip", action="store_true")
    parser.add_argument("path", metavar="PATH",
                        help="image folder or prepared uint8 cache (.npy)")
    # TPU-native extras
    parser.add_argument("--inception_ckpt", type=str,
                        default="./Model/metrics/pt_inception-2015-12-05-6726825d.pth")
    parser.add_argument("--output", type=str, default=None,
                        help="output pickle path (default: the reference's "
                             "inception_{name}.pkl in the working dir)")
    parser.add_argument("--seed", type=int, default=0,
                        help="rng seed for --flip coin tosses")
    parser.add_argument("--info_print", action="store_true", default=False)
    args = parser.parse_args(argv)

    from content_aware_gan_compression_tpu.utils import (
        enable_compilation_cache)

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from content_aware_gan_compression_tpu.data.dataset import open_dataset
    from content_aware_gan_compression_tpu.models import inception as inc_mod

    if not os.path.exists(args.inception_ckpt):
        raise FileNotFoundError(
            f"FID inception weights not found at {args.inception_ckpt}; "
            "provide --inception_ckpt (pt_inception-2015-12-05 checkpoint)")
    inc_params = inc_mod.load_fid_inception(args.inception_ckpt)

    # resample="lanczos": real-stats parity with the reference's dataset
    # prep (Miscellaneous/prepare_data.py:23) — only hit when folder images
    # aren't already at --size; uint8 caches bake the TRAIN-transform
    # bilinear resize instead, so for non-pre-resized sources prefer a raw
    # folder input here.
    ds = open_dataset(args.path, args.size, random_flip=args.flip,
                      resample="lanczos")
    if ds.size != args.size:
        raise SystemExit(
            f"--size {args.size} does not match the prepared cache's baked "
            f"resolution {ds.size} ({args.path}); the pickle would claim a "
            f"resolution the features were not computed at. Pass "
            f"--size {ds.size} or point PATH at the source image folder.")
    n = min(args.n_sample, len(ds))
    n_batch = max(1, -(-n // args.batch))
    rng = np.random.default_rng(args.seed)

    @jax.jit
    def step(p, u8_nhwc):
        img = jnp.transpose(u8_nhwc.astype(jnp.float32), (0, 3, 1, 2))
        img = img / 127.5 - 1.0
        # normalize_input=False: the reference's load_patched_inception_v3
        # configuration (calc_inception.py:50-55) — [-1,1] goes in raw.
        return inc_mod.inception_pool3(p, img, normalize_input=False)

    feats = []
    for b in range(n_batch):
        # fixed batch shape: the tail batch is padded by TILING its own real
        # rows (np.resize) and the surplus feature rows are dropped below —
        # one XLA trace for any n_sample, and the dropped rows are exactly
        # the padding (a modulo wrap would survive a cache's sorted batch
        # read and displace real tail images)
        idxs = list(range(b * args.batch, min((b + 1) * args.batch, n)))
        if hasattr(ds, "load_batch_uint8"):
            # vectorized memmap read — no per-image Python/PIL on this
            # 1-core host (row order within a batch is irrelevant to
            # mean/cov; only full batches or the self-tiled tail reach here)
            batch = ds.load_batch_uint8(idxs, rng)
        else:
            batch = np.stack([ds.load_uint8(i, rng) for i in idxs])
        if len(idxs) < args.batch:
            batch = np.resize(batch, (args.batch,) + batch.shape[1:])
        feats.append(np.asarray(step(inc_params, jnp.asarray(batch))))
        if args.info_print and (b + 1) % 50 == 0:
            print(f"inception features: batch {b + 1}/{n_batch}")
    features = np.concatenate(feats, 0)[:n].astype(np.float64)
    print(f"extracted {features.shape[0]} features")

    mean = np.mean(features, 0)
    cov = np.cov(features, rowvar=False)

    name = os.path.splitext(os.path.basename(os.path.normpath(args.path)))[0]
    out = args.output or f"inception_{name}.pkl"
    with open(out, "wb") as f:
        pickle.dump({"mean": mean, "cov": cov, "size": args.size,
                     "path": args.path}, f)
    print(f"saved statistics to {out}")
    return out


if __name__ == "__main__":
    main()
