"""Fixed-size unique-id extraction + remapping — the heart of the sparse
training path.

This is the TPU-native analogue of the reference worker's per-batch key
dedup before the PS pull (distributed_algo_abst.h:181-190: collect unique
fids -> pull -> compute -> push sparse grads). On TPU everything must be
static-shape, so `unique_fixed` returns a padded [U] id list (U = capacity)
plus each input position's index into it — one sort + one cumsum, all on
device, jit/pjit-safe.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("capacity",))
def unique_fixed(ids: jax.Array, valid: jax.Array, capacity: int):
    """Deduplicate ids under a validity mask into a fixed-size table.

    Args:
      ids:   int32 [...] feature ids (any shape)
      valid: bool/float [...] same shape; invalid slots are ignored
      capacity: static output size U (must be >= true unique count;
        callers size it as min(total_slots, vocab) or a tuned budget)

    Returns:
      uids:   int32 [U] unique ids, padded with 0 beyond n_unique
      index:  int32 ids.shape — position of each input id in uids
              (padded/invalid inputs map to slot 0; their mask stays 0)
      n_unique: int32 scalar
    """
    flat = ids.reshape(-1).astype(jnp.int32)
    v = (jnp.asarray(valid).reshape(-1) > 0)
    n = flat.shape[0]

    # Push invalid slots to the end with a sentinel beyond any real id.
    sentinel = jnp.int32(2**31 - 1)
    keyed = jnp.where(v, flat, sentinel)
    order = jnp.argsort(keyed)
    sorted_ids = keyed[order]

    is_new = jnp.concatenate(
        [jnp.ones((1,), jnp.int32),
         (sorted_ids[1:] != sorted_ids[:-1]).astype(jnp.int32)]
    )
    # sentinels are not unique entries
    is_new = jnp.where(sorted_ids == sentinel, 0, is_new)
    # rank of each sorted position among uniques (0-based)
    rank = jnp.cumsum(is_new) - 1
    n_unique = jnp.sum(is_new)

    take = jnp.where((is_new > 0) & (rank < capacity), rank, capacity)
    uids = jnp.zeros((capacity + 1,), jnp.int32).at[take].set(sorted_ids)[:capacity]

    # map back to original positions
    index_sorted = jnp.where(sorted_ids == sentinel, 0, jnp.clip(rank, 0, capacity - 1))
    index = jnp.zeros((n,), jnp.int32).at[order].set(index_sorted)
    return uids, index.reshape(ids.shape), n_unique
