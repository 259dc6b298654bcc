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

    def __init__(self, image_folder: str, size: int, random_flip: bool = True,
                 resample: str = "bilinear"):
        self.images_list = sorted(
            os.path.join(image_folder, f) for f in os.listdir(image_folder)
            if f.lower().endswith(_EXTS))
        if not self.images_list:
            raise ValueError(f"no images in {image_folder}")
        self.size = size
        self.random_flip = random_flip
        # "bilinear" = the reference's TRAIN transform (transforms.Resize,
        # train.py:466); "lanczos" = its dataset-prep filter
        # (Miscellaneous/prepare_data.py:23) — real-stats builders use the
        # latter so stats from a folder match stats from a prepared store.
        from PIL import Image

        self._resample = {"bilinear": Image.BILINEAR,
                          "lanczos": Image.LANCZOS}[resample]

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
            img = img.resize((self.size, self.size), self._resample)
        return np.asarray(img, np.uint8)

    def load(self, index: int, rng: np.random.Generator) -> np.ndarray:
        """Decode one image -> float32 NCHW in [-1, 1] with the reference's
        train transform (flip -> resize -> normalize)."""
        from PIL import Image

        img = Image.open(self.images_list[index]).convert("RGB")
        if self.random_flip and rng.random() < 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        if img.size != (self.size, self.size):
            img = img.resize((self.size, self.size), self._resample)
        arr = np.asarray(img, np.float32).transpose(2, 0, 1)
        return arr / 127.5 - 1.0


class Uint8CacheDataset:
    """Pre-resized uint8 memmap cache — the TPU-native analog of the
    reference's pre-resized JPEG-in-LMDB store (Miscellaneous/
    prepare_data.py): decode+resize are paid ONCE at build time; training
    reads are pure page-cache memcpy, which is what lets a 1-core host feed
    >100 img/s to the device (PIL decode of full-res FFHQ tops out far
    below the step rate — measured in tools/bench_loader.py)."""

    def __init__(self, cache_path: str, random_flip: bool = True):
        self._arr = np.load(cache_path, mmap_mode="r")
        if self._arr.ndim != 4 or self._arr.shape[-1] != 3 \
                or self._arr.dtype != np.uint8:
            raise ValueError(
                f"{cache_path}: expected uint8 [N, H, W, 3], "
                f"got {self._arr.dtype} {self._arr.shape}")
        self.size = self._arr.shape[1]
        self.random_flip = random_flip
        self.cache_path = cache_path

    def __len__(self):
        return self._arr.shape[0]

    def load_uint8(self, index: int, rng: np.random.Generator) -> np.ndarray:
        img = np.asarray(self._arr[index])
        if self.random_flip and rng.random() < 0.5:
            img = img[:, ::-1]
        return img

    def load(self, index: int, rng: np.random.Generator) -> np.ndarray:
        arr = self.load_uint8(index, rng).astype(np.float32)
        return arr.transpose(2, 0, 1) / 127.5 - 1.0

    def load_batch_uint8(self, idxs, rng: np.random.Generator) -> np.ndarray:
        """Whole batch in one fancy-index read + vectorized flips — no
        thread pool, no per-image Python."""
        batch = self._arr[np.sort(np.asarray(idxs))]  # sorted = sequential IO
        batch = np.ascontiguousarray(batch)
        if self.random_flip:
            flips = rng.random(len(idxs)) < 0.5
            if flips.any():
                batch[flips] = batch[flips, :, ::-1]
        return batch


def cache_path_for(image_folder: str, size: int) -> str:
    """Canonical cache location for a source folder."""
    return os.path.join(image_folder, f"uint8_cache_{size}.npy")


def build_uint8_cache(image_folder: str, size: int,
                      cache_path: str | None = None, *, num_workers: int = 8,
                      info_print: bool = False) -> str:
    """Decode+resize every image in `image_folder` once into a uint8
    [N, size, size, 3] .npy memmap (written atomically via a temp file).

    The resize is BILINEAR: the cache replaces the TRAIN-TIME transform
    (reference train.py:463-470 transforms.Resize), not prepare_data's
    LANCZOS dataset prep — cached reads must be byte-identical to what the
    decode-per-read path would have produced (minus the flip, applied at
    read time)."""
    from concurrent.futures import ThreadPoolExecutor

    ds = FFHQDataset(image_folder, size, random_flip=False)
    cache_path = cache_path or cache_path_for(image_folder, size)
    tmp = cache_path + ".tmp"
    out = np.lib.format.open_memmap(
        tmp, mode="w+", dtype=np.uint8, shape=(len(ds), size, size, 3))
    rng = np.random.default_rng(0)  # unused (no flip)
    with ThreadPoolExecutor(max_workers=num_workers) as pool:
        for i, img in enumerate(pool.map(
                lambda j: ds.load_uint8(j, rng), range(len(ds)))):
            out[i] = img
            if info_print and (i + 1) % 1000 == 0:
                print(f"uint8 cache: {i + 1}/{len(ds)}")
    out.flush()
    del out
    os.replace(tmp, cache_path)
    return cache_path


def open_dataset(path: str, size: int, random_flip: bool = True,
                 resample: str = "bilinear"):
    """Open `path` as the fastest available dataset: a .npy cache file
    directly, a folder with a matching prebuilt cache, or the plain
    decode-per-read image folder. `resample` only applies to the
    decode-per-read folder path (caches bake their resize at build time)."""
    if path.endswith(".npy"):
        return Uint8CacheDataset(path, random_flip=random_flip)
    cache = cache_path_for(path, size)
    if os.path.exists(cache):
        return Uint8CacheDataset(cache, random_flip=random_flip)
    return FFHQDataset(path, size, random_flip=random_flip,
                       resample=resample)


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
            if hasattr(dataset, "load_batch_uint8"):
                return dataset.load_batch_uint8(idxs, rng)
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
