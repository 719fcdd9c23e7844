"""Device mesh construction.

The TPU replacement of the reference's cluster control plane
(distribut/master.h handshake/topology broadcast): topology is declared as
a `jax.sharding.Mesh` with named axes and XLA handles routing/collectives.

Axes:
  data  — data parallelism (replaces Ring-AllReduce workers, ring_collect.h)
  model — embedding-table row sharding (replaces the PS DHT shards,
          consistent_hash.h / paramserver.h)
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(
    data: int | None = None,
    model: int = 1,
    devices=None,
) -> Mesh:
    """Build a (data, model) mesh. Defaults: all devices on the data axis.

    On multi-host slices pass `devices=jax.devices()` after
    `jax.distributed.initialize()`; axis order puts `model` innermost so
    table all-to-alls ride the fastest ICI links.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))
