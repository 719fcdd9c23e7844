"""System/device introspection — parity with the reference's helpers
(common/system.h: getEnv, /proc/meminfo SystemMemoryUsage) extended with
device-memory stats from the JAX runtime.
"""

from __future__ import annotations

import os

import jax


def get_env(name: str, default=None, cast=str):
    v = os.environ.get(name)
    if v is None:
        return default
    try:
        return cast(v)
    except (TypeError, ValueError):
        return default


def host_memory_usage() -> dict:
    """RSS/available from /proc (Linux)."""
    out = {}
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                k, v = line.split(":", 1)
                if k in ("MemTotal", "MemAvailable"):
                    out[k] = int(v.strip().split()[0]) * 1024
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    out["VmRSS"] = int(line.split()[1]) * 1024
    except OSError:
        pass
    return out


def device_memory_stats() -> list[dict]:
    """Per-device memory stats where the PJRT backend reports them."""
    stats = []
    for d in jax.local_devices():
        try:
            s = d.memory_stats() or {}
        except Exception:
            s = {}
        stats.append({
            "device": str(d),
            "bytes_in_use": s.get("bytes_in_use"),
            "bytes_limit": s.get("bytes_limit"),
        })
    return stats
