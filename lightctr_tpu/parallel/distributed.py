"""Multi-host bootstrap — the TPU replacement of the reference's entire
custom control plane (distribut/master.h handshake/topology/heartbeats,
common/network.h ZeroMQ RPC, dist_machine_abst.h rank bootstrap):
`jax.distributed.initialize` + the PJRT coordinator does registration,
topology exchange, and failure detection natively (SURVEY.md §5.8).

What remains worth owning is liveness visibility and restart policy:
`heartbeat()` runs a host-side liveness logger (the master.h:202-241
heartbeat monitor capability, now just observability — the runtime
already aborts on lost peers), and `elastic_restore` is the
checkpoint-resume path that replaces PS warm state on worker rejoin.
"""

from __future__ import annotations

import os
import threading
import time
from typing import Callable

import jax


def initialize_cluster(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> dict:
    """Initialise multi-host JAX. No-ops on single-process.

    Env fallbacks mirror the reference's env-var cluster config
    (LightCTR_MASTER_ADDR / _WORKER_NUM, master.h:23-24):
      LIGHTCTR_COORDINATOR, LIGHTCTR_NUM_PROCS, LIGHTCTR_PROC_ID
    """
    coordinator_address = coordinator_address or os.environ.get("LIGHTCTR_COORDINATOR")
    if coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=int(num_processes or os.environ.get("LIGHTCTR_NUM_PROCS", 1)),
            process_id=int(process_id if process_id is not None
                           else os.environ.get("LIGHTCTR_PROC_ID", 0)),
        )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def heartbeat(
    interval_s: float = 5.0,
    log: Callable[[str], None] = print,
    stop_event: threading.Event | None = None,
) -> threading.Event:
    """Liveness logger thread; returns the stop event."""
    stop = stop_event or threading.Event()

    def run():
        step = 0
        while not stop.wait(interval_s):
            step += 1
            log(
                f"[heartbeat {step}] proc {jax.process_index()}/{jax.process_count()} "
                f"alive, {len(jax.local_devices())} local devices"
            )

    t = threading.Thread(target=run, daemon=True)
    t.start()
    return stop


def elastic_restore(ckpt_path: str, template, placer=None):
    """Resume-from-checkpoint on (re)start if one exists, else None —
    the elasticity story: crashed/preempted workers rejoin by restoring
    the last checkpoint rather than pulling warm PS state (exercised by
    the kill-and-restore flow in tests/test_multiprocess.py).

    Prefers per-shard checkpoints (`<path>.proc*.npz`,
    train/checkpoint.save_checkpoint_sharded) — each process re-places
    only the slices its devices own; falls back to the single-file
    format."""
    import glob

    from ..train.checkpoint import load_checkpoint, load_checkpoint_sharded

    if glob.glob(ckpt_path + ".proc*.npz"):
        return load_checkpoint_sharded(ckpt_path, template)
    if os.path.exists(ckpt_path + ".npz"):
        return load_checkpoint(ckpt_path, template, placer=placer)
    return None
