"""ctypes bindings for the native (C++) libffm parser.

`load_libffm_native` is a drop-in for `load_libffm` backed by
csrc/libffm_parser.cpp (mmap + multithreaded byte-range parsing — the
TPU build's equivalent of the reference's C++ loaders, ~50x the pure
Python parser). Builds on first use if the shared library is missing;
falls back to the Python parser if no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from .libffm import SparseDataset, load_libffm

_CSRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "csrc",
)
_LIB_PATH = os.path.join(_CSRC, "liblightctr_native.so")
_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["sh", os.path.join(_CSRC, "build.sh")],
                check=True,
                capture_output=True,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.ffm_parse.restype = ctypes.c_void_p
    lib.ffm_parse.argtypes = [ctypes.c_char_p, ctypes.c_int]
    for fn in ("ffm_n_rows", "ffm_max_id", "ffm_max_field", "ffm_max_nnz"):
        getattr(lib, fn).restype = ctypes.c_int64
        getattr(lib, fn).argtypes = [ctypes.c_void_p]
    lib.ffm_fill.restype = None
    lib.ffm_fill.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
    ]
    lib.ffm_free.restype = None
    lib.ffm_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_lib() is not None


def load_libffm_native(
    path: str,
    pad_multiple: int = 128,
    n_features: int | None = None,
    n_fields: int | None = None,
    n_threads: int = 0,
    oov: str = "mod",
) -> SparseDataset:
    """Native-parser version of load_libffm (same padded output contract)."""
    lib = _load_lib()
    if lib is None:
        return load_libffm(
            path, pad_multiple=pad_multiple, n_features=n_features,
            n_fields=n_fields, oov=oov,
        )

    handle = lib.ffm_parse(path.encode(), n_threads)
    if not handle:
        raise IOError(f"native parser failed to open {path}")
    try:
        n_rows = lib.ffm_n_rows(handle)
        max_id = lib.ffm_max_id(handle)
        max_field = lib.ffm_max_field(handle)
        max_nnz = lib.ffm_max_nnz(handle)
        pad_len = max(
            ((int(max_nnz) + pad_multiple - 1) // pad_multiple) * pad_multiple,
            pad_multiple,
        )
        ids = np.zeros((n_rows, pad_len), np.int32)
        vals = np.zeros((n_rows, pad_len), np.float32)
        fields = np.zeros((n_rows, pad_len), np.int32)
        mask = np.zeros((n_rows, pad_len), np.float32)
        labels = np.zeros((n_rows,), np.float32)
        nnz = np.zeros((n_rows,), np.int32)
        lib.ffm_fill(handle, pad_len, ids, vals, fields, mask, labels, nnz)
    finally:
        lib.ffm_free(handle)

    nf = int(n_features if n_features is not None else max_id + 1)
    nfld = int(n_fields if n_fields is not None else max_field + 1)
    if n_features is not None and max_id >= n_features:
        over = ids >= n_features
        if oov == "drop":
            mask[over] = 0.0
            vals[over] = 0.0
            ids[over] = 0
        else:
            ids = np.where(over, ids % n_features, ids)
    if n_fields is not None and max_field >= n_fields:
        fields = np.where(fields >= n_fields, fields % n_fields, fields)

    return SparseDataset(
        ids=ids, vals=vals, fields=fields, mask=mask,
        labels=labels, nnz=nnz, n_features=nf, n_fields=nfld,
    )
