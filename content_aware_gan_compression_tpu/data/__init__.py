"""Data pipeline: FFHQ image-folder dataset (reference dataset.py) with a
host-side prefetching loader feeding sharded device batches."""

from .dataset import (FFHQDataset, Uint8CacheDataset, build_uint8_cache,
                      cache_path_for, open_dataset, data_loader,
                      infinite_loader)

__all__ = ["FFHQDataset", "Uint8CacheDataset", "build_uint8_cache",
           "cache_path_for", "open_dataset", "data_loader",
           "infinite_loader"]
