"""FFHQ image-folder dataset + prefetching loader.

Capability parity with reference dataset.py:8-28 (sorted folder listing,
RGB decode) and the training transform (reference train.py:463-470: random
horizontal flip, resize to `size`, normalize to [-1, 1]).

TPU-native shape: instead of torch DataLoader worker processes feeding a
DataParallel scatter, a thread pool decodes ahead into a bounded queue and
the training loop device_puts each batch with the data-axis sharding — the
host never blocks device steps as long as decode keeps up.
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

_EXTS = (".png", ".jpg", ".jpeg", ".webp", ".bmp")


class FFHQDataset:
    """Sorted image-folder dataset (reference dataset.py:8-28)."""

    def __init__(self, image_folder: str, size: int, random_flip: bool = True):
        self.images_list = sorted(
            os.path.join(image_folder, f) for f in os.listdir(image_folder)
            if f.lower().endswith(_EXTS))
        if not self.images_list:
            raise ValueError(f"no images in {image_folder}")
        self.size = size
        self.random_flip = random_flip

    def __len__(self):
        return len(self.images_list)

    def decode(self, index: int) -> np.ndarray:
        """Decode one image to uint8 HWC (no transform)."""
        from PIL import Image

        img = Image.open(self.images_list[index]).convert("RGB")
        return np.asarray(img, np.uint8)

    def load_uint8(self, index: int, rng: np.random.Generator) -> np.ndarray:
        """Decode + flip + resize, kept as uint8 HWC — for the small-wire
        path where normalization/layout happen on device (a 4x smaller
        host->device transfer than float32 CHW)."""
        from PIL import Image

        img = Image.open(self.images_list[index]).convert("RGB")
        if self.random_flip and rng.random() < 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        if img.size != (self.size, self.size):
            img = img.resize((self.size, self.size), Image.BILINEAR)
        return np.asarray(img, np.uint8)

    def load(self, index: int, rng: np.random.Generator) -> np.ndarray:
        """Decode one image -> float32 NCHW in [-1, 1] with the reference's
        train transform (flip -> resize -> normalize)."""
        from PIL import Image

        img = Image.open(self.images_list[index]).convert("RGB")
        if self.random_flip and rng.random() < 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        if img.size != (self.size, self.size):
            img = img.resize((self.size, self.size), Image.BILINEAR)
        arr = np.asarray(img, np.float32).transpose(2, 0, 1)
        return arr / 127.5 - 1.0


def data_loader(dataset: FFHQDataset, batch_size: int, *, seed: int = 0,
                num_workers: int = 8, prefetch: int = 4, drop_last=True,
                uint8_hwc: bool = False):
    """Generator of [B, 3, H, W] float32 batches (default), shuffled each
    epoch, decoded by a thread pool and buffered `prefetch` batches ahead.
    With uint8_hwc=True, yields [B, H, W, 3] uint8 instead — normalization
    and layout happen on device (4x less host->device traffic)."""
    q: queue.Queue = queue.Queue(maxsize=prefetch)
    stop = threading.Event()

    from . import native_loader

    def _make_batch(pool, rng, idxs):
        """Decode with PIL threads; transform (flip+resize+normalize+CHW)
        through the native C++ library when available, else per-image."""
        if uint8_hwc:
            seeds = rng.integers(0, 2 ** 31, size=len(idxs))
            futs = [pool.submit(dataset.load_uint8, int(i),
                                np.random.default_rng(int(s)))
                    for i, s in zip(idxs, seeds)]
            return np.stack([f.result() for f in futs])
        use_native = native_loader.get_lib() is not None
        if use_native:
            futs = [pool.submit(dataset.decode, int(i)) for i in idxs]
            raws = [f.result() for f in futs]
            if len({r.shape for r in raws}) == 1:
                flips = (rng.random(len(raws)) < 0.5) if dataset.random_flip \
                    else np.zeros(len(raws))
                out = native_loader.transform_batch(
                    np.stack(raws), dataset.size,
                    flips.astype(np.uint8), num_threads=num_workers)
                if out is not None:
                    return out
        seeds = rng.integers(0, 2 ** 31, size=len(idxs))
        futs = [pool.submit(dataset.load, int(i), np.random.default_rng(int(s)))
                for i, s in zip(idxs, seeds)]
        return np.stack([f.result() for f in futs])

    def producer():
        rng = np.random.default_rng(seed)
        pool = ThreadPoolExecutor(max_workers=num_workers)
        try:
            while not stop.is_set():
                order = rng.permutation(len(dataset))
                n_full = len(order) // batch_size
                for b in range(n_full if drop_last else n_full + 1):
                    idxs = order[b * batch_size:(b + 1) * batch_size]
                    if len(idxs) == 0:
                        continue
                    batch = _make_batch(pool, rng, idxs)
                    while not stop.is_set():
                        try:
                            q.put(batch, timeout=1.0)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
        finally:
            pool.shutdown(wait=False)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()

    class _Loader:
        def __iter__(self):
            return self

        def __next__(self):
            return q.get()

        def close(self):
            stop.set()

    return _Loader()


def infinite_loader(dataset: FFHQDataset, batch_size: int, **kw):
    """Endless batch stream (the reference's sample_data wrapper,
    train.py:136-139)."""
    return data_loader(dataset, batch_size, **kw)
