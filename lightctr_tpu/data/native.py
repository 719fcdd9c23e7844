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


def _run_build() -> bool:
    try:
        subprocess.run(
            ["sh", os.path.join(_CSRC, "build.sh")],
            check=True,
            capture_output=True,
        )
        return True
    except Exception:
        return False


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _run_build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    # A stale pre-plan-server .so loads fine but lacks the newer symbols
    # (lc_plan_sorted & co) — binding them raises AttributeError. Detect
    # that, rebuild ONCE, and reload; if the rebuild can't produce the
    # symbols either, fall back to the pure-Python paths (return None)
    # rather than letting the AttributeError escape into callers.
    if (not hasattr(lib, "lc_plan_sorted")
            or not hasattr(lib, "lc_gbm_hist")
            or not hasattr(lib, "lc_count_unique_ranges")):
        # dlclose for real: glibc dedupes dlopen by pathname, so without
        # this the reload below would hand back the stale handle
        import _ctypes

        handle = lib._handle
        del lib
        try:
            _ctypes.dlclose(handle)
        except OSError:
            pass
        try:
            os.remove(_LIB_PATH)
        except OSError:
            return None
        if not _run_build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        if (not hasattr(lib, "lc_plan_sorted")
                or not hasattr(lib, "lc_count_unique_ranges")):
            return None
    try:
        _bind(lib)
    except AttributeError:
        return None
    _lib = lib
    return lib


def _bind(lib) -> None:
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
    _i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    _i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    _f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.lc_plan_sorted.restype = ctypes.c_int64
    lib.lc_plan_sorted.argtypes = [
        _i64p, _f32p, ctypes.c_int64, _i32p, _i32p, _i64p,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int,
    ]
    lib.lc_count_unique.restype = ctypes.c_int64
    lib.lc_count_unique.argtypes = [_i64p, _f32p, ctypes.c_int64]
    lib.lc_count_unique_ranges.restype = ctypes.c_int64
    lib.lc_count_unique_ranges.argtypes = [
        _i64p, _f32p, ctypes.c_int64, _i64p, ctypes.c_int64, _i64p]
    lib.lc_plan_server_create.restype = ctypes.c_void_p
    lib.lc_plan_server_create.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.lc_plan_server_submit.restype = ctypes.c_int
    lib.lc_plan_server_submit.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, _i64p, _f32p, ctypes.c_int64,
    ]
    lib.lc_plan_server_wait.restype = ctypes.c_int64
    lib.lc_plan_server_wait.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, _i32p, _i32p, _i64p,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.lc_plan_server_destroy.restype = None
    lib.lc_plan_server_destroy.argtypes = [ctypes.c_void_p]
    lib.lc_gbm_hist.restype = ctypes.c_int64
    lib.lc_gbm_hist.argtypes = [
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        _f32p, _f32p, _i32p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        _f32p, ctypes.c_int,
    ]


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


# ---------------------------------------------------------------------------
# Native batch planning (csrc/plan_server.cpp) — the host half of the
# kernel engines' data path in C++ threads. plan_sorted_core_native is
# byte-identical to the numpy core of plan_sorted_layout (the composite
# (id << 20 | position) sort key reproduces numpy's stable order); the
# PlanServer plans batches AHEAD on a C++ thread pool (ctypes releases
# the GIL, so planning genuinely overlaps Python/device work).

_PLAN_MAX_N = 1 << 20          # composite-key position budget
_PLAN_MAX_ID = 1 << 40         # the numpy planner's own sentinel bound


def plan_sorted_core_native(flat_ids: np.ndarray, valid: np.ndarray,
                            n_threads: int = 0):
    """(perm int32[n], ranks int32[n] with -1 at masked slots,
    uids int64[n_unique], n_valid) or None when the native library is
    missing or (n, ids) exceed the composite-key domain."""
    lib = _load_lib()
    n = int(flat_ids.size)
    if lib is None or n == 0 or n > _PLAN_MAX_N:
        return None
    ids = np.ascontiguousarray(flat_ids, np.int64)
    v = np.ascontiguousarray(valid, np.float32).reshape(-1)
    perm = np.empty(n, np.int32)
    ranks = np.empty(n, np.int32)
    uids = np.empty(n, np.int64)
    n_unique = ctypes.c_int64()
    n_valid = ctypes.c_int64()
    status = lib.lc_plan_sorted(
        ids, v, n, perm, ranks, uids,
        ctypes.byref(n_unique), ctypes.byref(n_valid), n_threads,
    )
    if status != 0:  # ids outside the sentinel domain -> numpy fallback
        return None
    return perm, ranks, uids[: n_unique.value], int(n_valid.value)


def count_unique_native(flat_ids: np.ndarray, valid: np.ndarray):
    """Unique masked-in ids via the native hash set; None -> fall back."""
    lib = _load_lib()
    n = int(flat_ids.size)
    if lib is None or n == 0:
        return None
    if flat_ids.min() < 0 or flat_ids.max() >= _PLAN_MAX_ID:
        return None
    ids = np.ascontiguousarray(flat_ids, np.int64)
    v = np.ascontiguousarray(valid, np.float32).reshape(-1)
    return int(lib.lc_count_unique(ids, v, n))


def count_unique_ranges_native(flat_ids: np.ndarray, valid: np.ndarray,
                               bounds: tuple):
    """Per-id-range unique counts (the partitioned master's cap sizing)
    in ONE native hash-set pass — replaces numpy sort-unique +
    searchsorted on the Prefetcher thread (the host-planning cost the
    r5 e2e production row is bound by). Returns int64 counts[len(bounds)]
    where counts[p] = #unique ids in [bounds[p-1], bounds[p]), or None
    to fall back (tests/test_plan_native.py pins equality vs numpy)."""
    lib = _load_lib()
    n = int(flat_ids.size)
    if lib is None or n == 0:
        return None
    m = np.asarray(valid).reshape(-1) > 0
    if not m.any():
        return np.zeros((len(bounds),), np.int64)
    # guards over VALID ids only: masked-out positions may carry
    # sentinel ids, and both paths ignore them identically
    vmin = int(flat_ids[m].min())
    vmax = int(flat_ids[m].max())
    if vmin < 0 or vmax >= _PLAN_MAX_ID:
        return None
    if vmax >= int(bounds[-1]):
        # ids past the last bound would fall in NO bin (the numpy
        # fallback counts them in n_unique) — refuse rather than let the
        # native/numpy paths silently disagree on machines with/without
        # a compiler
        return None
    ids = np.ascontiguousarray(flat_ids, np.int64)
    v = np.ascontiguousarray(valid, np.float32).reshape(-1)
    b = np.ascontiguousarray(np.asarray(bounds), np.int64)
    counts = np.zeros((len(bounds),), np.int64)
    total = int(lib.lc_count_unique_ranges(ids, v, n, b, len(bounds),
                                           counts))
    if total < 0:
        return None
    return counts


class PlanServer:
    """Plan-ahead service on C++ worker threads (bounded queue).

    submit(ticket, ids, valid) copies the batch into native memory and
    returns immediately; wait(ticket) blocks until that plan is ready
    and returns the same tuple as plan_sorted_core_native. The reference
    plans batches on its ThreadPool inside the trainer
    (distributed_algo_abst.h:181-190); this is that capability as a
    service the Prefetcher can pipeline through.

    Backpressure contract: at most `slots` tickets may be outstanding
    (submitted and not yet wait()ed — DONE plans hold their slot until
    collected, bounding result memory). submit blocks while the table
    is full, so interleave: submit ahead by <= slots, then
    wait-one/submit-one. Submitting slots+1 tickets before the first
    wait from a single thread deadlocks by construction.
    """

    def __init__(self, n_threads: int = 0, slots: int = 4):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._handle = lib.lc_plan_server_create(n_threads, slots)
        self._sizes: dict[int, int] = {}

    def submit(self, ticket: int, flat_ids: np.ndarray, valid: np.ndarray):
        n = int(flat_ids.size)
        if n == 0 or n > _PLAN_MAX_N:
            raise ValueError(f"batch size {n} outside the native plan domain")
        ids = np.ascontiguousarray(flat_ids, np.int64)
        v = np.ascontiguousarray(valid, np.float32).reshape(-1)
        rc = self._lib.lc_plan_server_submit(self._handle, ticket, ids, v, n)
        if rc != 0:
            raise RuntimeError(f"submit failed (rc={rc}, ticket={ticket})")
        self._sizes[ticket] = n

    def wait(self, ticket: int):
        n = self._sizes.pop(ticket)
        perm = np.empty(n, np.int32)
        ranks = np.empty(n, np.int32)
        uids = np.empty(n, np.int64)
        n_unique = ctypes.c_int64()
        n_valid = ctypes.c_int64()
        status = self._lib.lc_plan_server_wait(
            self._handle, ticket, perm, ranks, uids,
            ctypes.byref(n_unique), ctypes.byref(n_valid),
        )
        if status != 0:
            raise RuntimeError(f"plan failed (status={status}, ticket={ticket})")
        return perm, ranks, uids[: n_unique.value], int(n_valid.value)

    def close(self):
        if self._handle is not None:
            self._lib.lc_plan_server_destroy(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def gbm_hist_native(bins_u8: np.ndarray, g: np.ndarray, h: np.ndarray,
                    comp: np.ndarray, n_slots: int, n_bins: int,
                    n_threads: int = 0):
    """GBM G/H histogram on C++ threads (csrc/plan_server.cpp
    lc_gbm_hist): hist[comp[r], f, bins[r, f]] += (g[r], h[r]) for rows
    with comp[r] >= 0 (negative = not in a direct slot). Returns
    [n_slots, F, n_bins, 2] float32, or None to fall back to the XLA
    scatter-add (models/gbm._histogram, the reference implementation)."""
    lib = _load_lib()
    if lib is None or bins_u8.dtype != np.uint8:
        return None
    n_rows, n_feats = bins_u8.shape
    bins_c = np.ascontiguousarray(bins_u8)
    out = np.empty((n_slots, n_feats, n_bins, 2), np.float32)
    status = lib.lc_gbm_hist(
        bins_c, np.ascontiguousarray(g, np.float32),
        np.ascontiguousarray(h, np.float32),
        np.ascontiguousarray(comp, np.int32),
        n_rows, n_feats, n_bins, n_slots, out, n_threads,
    )
    if status != 0:
        return None
    return out
