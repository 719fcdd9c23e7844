"""Step timing + profiler hooks — supersedes the reference's nanosecond
wall timer + printf tracing (common/time.h:81-99, DEBUG packet traces
network.h:219-221; SURVEY.md §5.1).

`StepTimer` reports steps/sec and examples/sec/chip with the readback
discipline this backend needs (block_until_ready may not await real
completion on tunneled PJRT transports — timings must force a scalar).
`trace()` wraps jax.profiler for on-TPU traces viewable in TensorBoard.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


class StepTimer:
    """Windowed steps/sec / examples/sec meter.

    Usage:
        timer = StepTimer(batch_size=B)
        for batch in data:
            state, loss = step(state, batch)
            if timer.tick():              # True every `window` steps
                float(loss)               # force the chain
                print(timer.report())
    """

    def __init__(self, batch_size: int, window: int = 100, n_chips: int = 1):
        self.batch_size = batch_size
        self.window = window
        self.n_chips = n_chips
        self._count = 0
        self._t0 = time.perf_counter()
        self._last = {}

    def tick(self) -> bool:
        self._count += 1
        return self._count % self.window == 0

    def report(self) -> str:
        now = time.perf_counter()
        dt = now - self._t0
        steps_per_sec = self.window / dt
        ex_per_sec = steps_per_sec * self.batch_size
        self._last = {
            "steps_per_sec": steps_per_sec,
            "examples_per_sec": ex_per_sec,
            "examples_per_sec_per_chip": ex_per_sec / self.n_chips,
        }
        self._t0 = now
        return (
            f"{steps_per_sec:.1f} steps/s, {ex_per_sec:,.0f} ex/s "
            f"({ex_per_sec / self.n_chips:,.0f}/chip)"
        )

    @property
    def last(self) -> dict:
        return self._last


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/lightctr_trace"):
    """jax.profiler trace context (open in TensorBoard's profile tab)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def timed(fn: Callable, *args, n: int = 100, chain_arg: int = 0):
    """Benchmark helper: chains `fn` through its `chain_arg`-th argument n
    times and forces completion with a scalar readback. Returns seconds
    per call."""
    args = list(args)
    out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        args[chain_arg] = out[0] if isinstance(out, tuple) else out
    _force(out)
    return (time.perf_counter() - t0) / n


def _force(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    if hasattr(leaf, "ndim"):
        import jax.numpy as jnp

        float(jnp.sum(leaf) if leaf.ndim else leaf)
