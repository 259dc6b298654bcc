"""Data pipeline: FFHQ image-folder dataset (reference dataset.py) with a
host-side prefetching loader feeding sharded device batches."""

from .dataset import FFHQDataset, data_loader, infinite_loader

__all__ = ["FFHQDataset", "data_loader", "infinite_loader"]
