#!/usr/bin/env python
"""Multi-resolution dataset builder (reference Miscellaneous/prepare_data.py).

The reference writes JPEG-in-LMDB at {128,256,512,1024}; this environment has
no lmdb module, and the TPU data path streams from image folders, so the
default output is per-resolution folders of JPEGs with the same resize
semantics (LANCZOS, quality 100). If lmdb IS importable, --format lmdb writes
the reference's exact key schema ('<size>-<idx:05d>' -> jpeg bytes,
'length' -> count) for drop-in compatibility.
"""

import argparse
import io
import os
from concurrent.futures import ThreadPoolExecutor
from functools import partial


def resize_and_encode(path, sizes, quality=100):
    from PIL import Image

    img = Image.open(path).convert("RGB")
    out = []
    for size in sizes:
        resized = img.resize((size, size), Image.LANCZOS)
        buf = io.BytesIO()
        resized.save(buf, format="jpeg", quality=quality)
        out.append(buf.getvalue())
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=str, required=True)
    parser.add_argument("--size", type=str, default="128,256,512,1024")
    parser.add_argument("--n_worker", type=int, default=8)
    parser.add_argument("--format", type=str, default="folders",
                        choices=["folders", "lmdb", "uint8"],
                        help="'uint8' writes one decoded [N,S,S,3] .npy "
                             "memmap per size — the training loader's "
                             "zero-decode fast path (data/dataset.py:"
                             "Uint8CacheDataset)")
    parser.add_argument("path", metavar="PATH")
    args = parser.parse_args()

    sizes = [int(s.strip()) for s in args.size.split(",")]
    files = sorted(
        os.path.join(args.path, f) for f in os.listdir(args.path)
        if f.lower().endswith((".png", ".jpg", ".jpeg", ".webp", ".bmp")))
    print(f"{len(files)} images -> sizes {sizes}")

    worker = partial(resize_and_encode, sizes=sizes)

    if args.format == "uint8":
        from content_aware_gan_compression_tpu.data import build_uint8_cache

        os.makedirs(args.out, exist_ok=True)
        for size in sizes:
            out = os.path.join(args.out, f"uint8_cache_{size}.npy")
            build_uint8_cache(args.path, size, out, num_workers=args.n_worker,
                              info_print=True)
            print(f"{out}: {len(files)} images @ {size}px")
        print("done")
        return

    if args.format == "lmdb":
        import lmdb  # gated: not in the base image

        with lmdb.open(args.out, map_size=1024 ** 4, readahead=False) as env:
            with ThreadPoolExecutor(args.n_worker) as pool:
                for i, encoded in enumerate(pool.map(worker, files)):
                    with env.begin(write=True) as txn:
                        for size, data in zip(sizes, encoded):
                            txn.put(f"{size}-{str(i).zfill(5)}".encode(), data)
                    if i % 500 == 0:
                        print(f"{i}/{len(files)}")
            with env.begin(write=True) as txn:
                txn.put(b"length", str(len(files)).encode())
    else:
        for size in sizes:
            os.makedirs(os.path.join(args.out, str(size)), exist_ok=True)
        with ThreadPoolExecutor(args.n_worker) as pool:
            for i, encoded in enumerate(pool.map(worker, files)):
                for size, data in zip(sizes, encoded):
                    with open(os.path.join(
                            args.out, str(size), f"{str(i).zfill(5)}.jpg"),
                            "wb") as f:
                        f.write(data)
                if i % 500 == 0:
                    print(f"{i}/{len(files)}")
    print("done")


if __name__ == "__main__":
    main()
