"""Host-side batch-planning cost: native C++ (csrc/plan_server.cpp) vs
the numpy planner core it byte-for-byte replaces.

Why host planning still matters (PARITY.md context): the fused
streaming step plans ON DEVICE, but (a) full-batch CLI startup calls
plan_sorted_layout on B*L ~ 384k positions, (b) the auto-capacity
octave picker counts per-batch unique ids on the Prefetcher thread
every minibatch, and (c) host-planned streaming (plan_batch per batch)
is the fallback regime for shapes the device planner doesn't cover.

CPU-only (no TPU/tunnel): PYTHONPATH=. JAX_PLATFORMS=cpu python
benchmarks/bench_plan_native.py
"""

import time

import numpy as np

from lightctr_tpu.data import native as N


def best_of(f, n=7):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def numpy_core(flat, v):
    # the FULL fallback branch of plan_sorted_layout (embedding_pallas.py)
    # — the native side is timed producing perm, ranks, uids AND n_valid,
    # so the numpy baseline must compute all four too (advisor r3: an
    # earlier version dropped ranks/uids/n_valid and flattered the ratio)
    sentinel = np.int64(1 << 40)
    keyed = np.where(v, flat, sentinel)
    perm = np.argsort(keyed, kind="stable")
    sorted_ids = keyed[perm]
    is_new = np.concatenate([[True], sorted_ids[1:] != sorted_ids[:-1]])
    is_new &= sorted_ids != sentinel
    ranks_m1 = np.where(sorted_ids == sentinel, -1, np.cumsum(is_new) - 1)
    n_unique = int(is_new.sum())
    uids_compact = sorted_ids[is_new]
    n_valid = int(v.sum())
    return perm, ranks_m1, uids_compact, n_unique, n_valid


def main():
    assert N.native_available(), "native library missing"
    rng = np.random.default_rng(0)
    print(f"{'shape':<38} {'numpy ms':>9} {'native ms':>10} {'x':>6}")
    for name, ids in (
        ("B=4096 L=64 uniform 10M vocab", rng.integers(0, 10_000_000, (4096, 64))),
        ("B=4096 L=64 zipf-1.2", np.minimum(rng.zipf(1.2, (4096, 64)) - 1,
                                            10_000_000 - 1)),
        ("B=1000 L=384 bundled-shape 234k", rng.integers(0, 233_789, (1000, 384))),
        ("B=256 L=68 streaming minibatch", rng.integers(0, 233_789, (256, 68))),
    ):
        flat = ids.reshape(-1).astype(np.int64)
        v = np.ones(flat.size, bool)
        t_np = best_of(lambda: numpy_core(flat, v))
        t_nat = best_of(lambda: N.plan_sorted_core_native(flat, v))
        print(f"{name:<38} {t_np:>9.2f} {t_nat:>10.2f} {t_np / t_nat:>5.1f}x")

        m = np.ones(flat.size, np.float32)
        t_np_u = best_of(lambda: len(np.unique(flat)))
        t_nat_u = best_of(lambda: N.count_unique_native(flat, m))
        print(f"{'  count_unique':<38} {t_np_u:>9.2f} {t_nat_u:>10.2f} "
              f"{t_np_u / t_nat_u:>5.1f}x")


if __name__ == "__main__":
    main()
