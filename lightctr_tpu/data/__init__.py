from .libffm import SparseDataset, load_libffm
from .dense import load_dense_csv
from .batching import pad_to_bucket, sparse_batches, dense_batches

__all__ = [
    "SparseDataset",
    "load_libffm",
    "load_dense_csv",
    "pad_to_bucket",
    "sparse_batches",
    "dense_batches",
]
