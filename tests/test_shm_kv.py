"""Native shared-memory KV (csrc/shm_kv.cpp via utils/shm_kv.py) — the
reference shm_hashtable.h capability: parameters shared BETWEEN
PROCESSES on one host. The cross-process test is the point: a child
process attaches to the same POSIX shm segment and reads rows the
parent wrote (and vice versa) with no files exchanged."""

import os
import subprocess
import sys

import numpy as np
import pytest

from lightctr_tpu.utils.shm_kv import ShmKV


def _name():
    return f"/lctr_test_{os.getpid()}"


def test_put_get_roundtrip():
    kv = ShmKV(_name(), capacity=1024, dim=8, create=True)
    try:
        rng = np.random.default_rng(0)
        keys = rng.choice(10**12, 500, replace=False)
        vals = rng.normal(size=(500, 8)).astype(np.float32)
        kv.put_batch(keys, vals)
        assert len(kv) == 500
        got, found = kv.get_batch(np.concatenate([keys[:100], [999]]))
        assert found[:100].all() and not found[100]
        np.testing.assert_array_equal(got[:100], vals[:100])
        assert (got[100] == 0).all()
        # update in place
        kv.put(int(keys[0]), np.full(8, 7.5, np.float32))
        np.testing.assert_array_equal(kv.get(int(keys[0])),
                                      np.full(8, 7.5, np.float32))
        assert len(kv) == 500
        assert kv.get(123456789) is None
    finally:
        kv.close(unlink=True)


def test_full_table_raises():
    kv = ShmKV(_name() + "f", capacity=4, dim=2, create=True)
    try:
        for k in range(4):
            kv.put(k, [float(k), 0.0])
        with pytest.raises(RuntimeError):
            kv.put(99, [1.0, 1.0])
    finally:
        kv.close(unlink=True)


def test_reserved_sentinel_key_rejected():
    """key -1 is the EMPTY slot sentinel: before the guard, put(-1)
    CAS'd -1 -> -1 (trivially succeeding, bumping count on EVERY call)
    while get(-1) stopped at the first 'empty' probe and reported the
    row missing — a silent count leak + unreadable row. Both paths must
    reject it loudly; other negative keys are ordinary."""
    kv = ShmKV(_name() + "s", capacity=64, dim=2, create=True)
    try:
        with pytest.raises(ValueError):
            kv.put(-1, [1.0, 2.0])
        with pytest.raises(ValueError):
            kv.put_batch(np.array([5, -1], np.int64),
                         np.ones((2, 2), np.float32))
        assert kv.get(-1) is None
        assert len(kv) <= 1  # nothing claimed by the rejected puts
        kv.put(-2, [3.0, 4.0])  # other negatives are fine
        np.testing.assert_array_equal(kv.get(-2), [3.0, 4.0])
    finally:
        kv.close(unlink=True)


def test_cross_process_visibility(tmp_path):
    """Trainer-writes / server-reads across REAL process boundaries:
    the child attaches to the segment, verifies the parent's rows,
    writes its own, and the parent sees them."""
    name = _name() + "x"
    kv = ShmKV(name, capacity=256, dim=4, create=True)
    try:
        kv.put(42, [1.0, 2.0, 3.0, 4.0])
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        child = f"""
import sys
sys.path.insert(0, {repo!r})
import numpy as np
from lightctr_tpu.utils.shm_kv import ShmKV
kv = ShmKV({name!r}, create=False)
assert kv.dim == 4 and kv.capacity == 256
row = kv.get(42)
assert row is not None and list(row) == [1.0, 2.0, 3.0, 4.0], row
kv.put(43, np.asarray([9.0, 8.0, 7.0, 6.0], np.float32))
kv.close()
print("CHILD_OK")
"""
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env["PYTHONPATH"] = repo
        out = subprocess.run([sys.executable, "-c", child], env=env,
                             capture_output=True, text=True, timeout=120)
        assert out.returncode == 0, out.stdout + out.stderr
        assert "CHILD_OK" in out.stdout
        np.testing.assert_array_equal(
            kv.get(43), np.asarray([9.0, 8.0, 7.0, 6.0], np.float32))
        assert len(kv) == 2
    finally:
        kv.close(unlink=True)
