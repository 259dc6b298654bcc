#!/usr/bin/env python
"""Input-pipeline throughput benchmark (host-only, no jax).

Answers VERDICT round-2 "Missing #2": can the 1-core host actually feed the
measured device step rate (iters/s x batch images of decoded+resized uint8)?
The reference's loop is DataLoader-fed (reference train.py:463-477); parity
includes not starving.

Generates a synthetic on-disk image folder (JPEG, like raw FFHQ crops),
then measures images/s through every loader path:

  pil_uint8     FFHQDataset decode->flip->resize per read (the default wire
                when no cache exists), PIL in a thread pool
  native_float  FFHQDataset decode + native C++ batch transform (float32 CHW)
  pil_float     same but native transform disabled (the PIL fallback)
  uint8_cache   Uint8CacheDataset memmap reads (prepare_data.py --format
                uint8; zero decode at train time)

Prints one JSON line per path:
  {"path": ..., "img_per_sec": N, "src_size": S, "train_size": T}
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_synthetic_folder(folder: str, n: int, src_size: int,
                          quality: int = 90) -> None:
    """n JPEGs of smooth noise (realistic decode cost; pure noise JPEGs
    decode slower than photos, smooth fields faster — blur to land between)."""
    from PIL import Image, ImageFilter

    os.makedirs(folder, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        arr = rng.integers(0, 256, (src_size, src_size, 3), dtype=np.uint8)
        img = Image.fromarray(arr).filter(ImageFilter.GaussianBlur(4))
        img.save(os.path.join(folder, f"{i:05d}.jpg"), quality=quality)


def measure(loader, batch_size: int, n_batches: int, warmup: int = 3) -> float:
    it = iter(loader)
    for _ in range(warmup):
        next(it)
    t0 = time.perf_counter()
    for _ in range(n_batches):
        next(it)
    dt = time.perf_counter() - t0
    loader.close()
    return batch_size * n_batches / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--folder", default=None,
                    help="existing image folder (default: synthesize one)")
    ap.add_argument("--n_images", type=int, default=256)
    ap.add_argument("--src_size", type=int, default=1024,
                    help="on-disk resolution (raw FFHQ is 1024)")
    ap.add_argument("--size", type=int, default=256,
                    help="training resolution")
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--n_batches", type=int, default=12)
    ap.add_argument("--num_workers", type=int, default=8)
    ap.add_argument("--paths", default="pil_uint8,native_float,pil_float,"
                                       "uint8_cache")
    args = ap.parse_args()

    from content_aware_gan_compression_tpu.data import (
        FFHQDataset, Uint8CacheDataset, build_uint8_cache, data_loader)
    from content_aware_gan_compression_tpu.data import native_loader

    tmp = None
    folder = args.folder
    if folder is None:
        tmp = tempfile.mkdtemp(prefix="cagc_loader_bench_")
        folder = os.path.join(tmp, "imgs")
        t0 = time.perf_counter()
        make_synthetic_folder(folder, args.n_images, args.src_size)
        print(f"# synthesized {args.n_images} JPEGs @{args.src_size}px "
              f"in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    results = {}
    for path in args.paths.split(","):
        if path == "uint8_cache":
            cache = build_uint8_cache(folder, args.size,
                                      num_workers=args.num_workers)
            ds = Uint8CacheDataset(cache)
            loader = data_loader(ds, args.batch_size,
                                 num_workers=args.num_workers,
                                 uint8_hwc=True)
        else:
            ds = FFHQDataset(folder, args.size)
            if path == "pil_float":
                native_loader.get_lib.__defaults__  # noqa: B018
                real_get_lib = native_loader.get_lib
                native_loader.get_lib = lambda: None
            loader = data_loader(ds, args.batch_size,
                                 num_workers=args.num_workers,
                                 uint8_hwc=(path == "pil_uint8"))
        try:
            rate = measure(loader, args.batch_size, args.n_batches)
        finally:
            if path == "pil_float":
                native_loader.get_lib = real_get_lib
        results[path] = rate
        print(json.dumps({"path": path, "img_per_sec": round(rate, 1),
                          "src_size": args.src_size,
                          "train_size": args.size,
                          "batch_size": args.batch_size}))
    return results


if __name__ == "__main__":
    main()
