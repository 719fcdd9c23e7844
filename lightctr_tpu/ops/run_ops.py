"""Run-structured gather/scatter over the sorted-rank layout — XLA only.

In the sorted layout all positions sharing a rank form one contiguous
run, and ranks are assigned densely (0..n_unique-1, plus a trailing pad
rank). That structure converts both hot ops into cumulative sums plus
R-sized scatters/gathers (R = padded unique count), with NO per-position
indexing and no one-hot matmuls:

  broadcast (rows -> positions):
      delta[r] = rows[r] - rows[r-1]; place delta[r] at run start r;
      cumsum over positions telescopes to e[p] = rows[rank[p]].
      (values stay bounded by construction -> no precision growth;
      pad-run positions read the last real row, harmless because their
      xv mask is 0)

  scatter-add (position grads -> rows):
      S = cumsum(g); grad[r] = S[last_pos[r]] - S[last_pos[r-1]].
      (gradients are tiny, prefix sums stay small, boundary differences
      lose no precision)

Boundaries are host-precomputed per batch plan (static data, like the
reference PS's per-batch key routing). Cost: one [n, D] cumsum + one
R-row scatter or gather per direction.

MEASURED OUTCOME (v5e): slower than the one-hot Pallas kernels for the
benchmark shapes (7.7ms vs 3.7ms full step) — XLA lowers the [384k, 16]
axis-0 cumsum to ~log2(n) full passes over the array, which dominates.
Kept as a tested alternative for hardware where long scans are cheap and
as the numerically-exact reference for the kernels. Selected via
KernelFMConfig(runops=True).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def plan_runs(ranks_sorted: np.ndarray, n_rows: int):
    """Host-side run boundaries for a sorted-rank layout with dense ranks.

    Returns (start_pos [R], last_pos [R]) int32:
      start_pos[r] = first position of rank r's run for real ranks,
                     n (out-of-bounds -> scatter-dropped) for absent/pad
      last_pos[r]  = last position of rank r's run for real ranks,
                     n-1 for all ranks >= n_unique (diffs telescope to 0;
                     the pad run's grads are zero by masking)
    """
    n = ranks_sorted.shape[0]
    is_new = np.concatenate([[True], ranks_sorted[1:] != ranks_sorted[:-1]])
    starts_of_runs = np.nonzero(is_new)[0]
    run_ranks = ranks_sorted[starts_of_runs].astype(np.int64)
    ends_of_runs = np.concatenate([starts_of_runs[1:] - 1, [n - 1]])

    pad_rank = n_rows - 1
    real = run_ranks != pad_rank
    n_unique = int(real.sum())

    start_pos = np.full(n_rows, n, np.int64)          # OOB default
    start_pos[run_ranks[real]] = starts_of_runs[real]
    last_pos = np.full(n_rows, n - 1, np.int64)
    last_pos[run_ranks[real]] = ends_of_runs[real]
    # absent ranks between n_unique and pad keep last_pos = n-1; to make
    # their diffs zero they must all share the PREVIOUS real end instead:
    if n_unique < n_rows:
        prev_end = ends_of_runs[real][-1] if n_unique else -1
        # every rank after the last real one (absent + pad) points at the
        # end of the final real run, except the pad rank which spans to
        # n-1 so the pad run's (zero) grads have somewhere to go
        last_pos[n_unique:] = prev_end
        last_pos[pad_rank] = n - 1
    return start_pos.astype(np.int32), last_pos.astype(np.int32)


@jax.jit
def run_broadcast(rows, start_pos, n_positions: jax.Array):
    """e[p] = rows[rank[p]] via delta scatter + cumsum.

    rows [R, D]; start_pos [R] int32 (OOB entries dropped);
    n_positions: zeros [n, D] template carrying the output shape/dtype.
    """
    prev = jnp.concatenate([jnp.zeros_like(rows[:1]), rows[:-1]], axis=0)
    delta = rows - prev
    placed = n_positions.at[start_pos].add(delta, mode="drop",
                                           unique_indices=True)
    return jnp.cumsum(placed, axis=0)


@jax.jit
def run_scatter_add(g_sorted, last_pos):
    """grad[r] = sum over rank r's run of g_sorted, via cumsum + diff.

    g_sorted [n, D] position grads in sorted order; last_pos [R] int32.
    """
    s = jnp.cumsum(g_sorted.astype(jnp.float32), axis=0)
    ends = s[jnp.clip(last_pos, 0, g_sorted.shape[0] - 1)]
    prev_ends = jnp.concatenate([jnp.zeros_like(ends[:1]), ends[:-1]], axis=0)
    grad = ends - prev_ends
    return jnp.where((last_pos >= 0)[:, None], grad, 0.0)
