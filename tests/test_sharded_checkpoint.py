"""Per-shard checkpoint save/restore (train/checkpoint.py sharded API):
row-sharded tables round-trip without ever materialising unsharded."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from lightctr_tpu.models import fm_kernel
from lightctr_tpu.parallel.mesh import make_mesh
from lightctr_tpu.parallel.sharded_kernel import shard_streaming_state
from lightctr_tpu.train.checkpoint import (
    load_checkpoint_sharded,
    save_checkpoint_sharded,
    checkpoint_metadata,
)


def test_sharded_roundtrip_preserves_sharding(tmp_path):
    mesh = make_mesh(data=1, model=8)
    cfg = fm_kernel.KernelFMConfig(n_features=1024, factor=4)
    state = shard_streaming_state(
        fm_kernel.streaming_init(jax.random.PRNGKey(7), cfg), mesh
    )
    # mutate so values are nontrivial
    state = state._replace(
        table=state.table + 1.5,
        w0=state.w0 + 0.25,
    )
    path = str(tmp_path / "ck")
    save_checkpoint_sharded(path, state, {"model": "fm_kernel"})
    assert checkpoint_metadata(path)["model"] == "fm_kernel"

    template = shard_streaming_state(
        fm_kernel.streaming_init(jax.random.PRNGKey(0), cfg), mesh
    )
    restored = load_checkpoint_sharded(path, template)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(restored.table)),
        np.asarray(jax.device_get(state.table)),
    )
    np.testing.assert_allclose(float(restored.w0), 0.25)
    # sharding preserved: table still split over the model axis
    assert restored.table.sharding.spec == P("model", None)
    shard_shapes = {s.data.shape for s in restored.table.addressable_shards}
    assert shard_shapes == {(128, 16)}


def test_sharded_restore_from_unsharded_save(tmp_path):
    """A single-host (unsharded) save re-places onto a sharded template —
    the cold-start path when topology changed between runs."""
    mesh = make_mesh(data=1, model=8)
    cfg = fm_kernel.KernelFMConfig(n_features=1024, factor=4)
    state = fm_kernel.streaming_init(jax.random.PRNGKey(3), cfg)
    path = str(tmp_path / "cold")
    save_checkpoint_sharded(path, state)          # single-device shards

    template = shard_streaming_state(
        fm_kernel.streaming_init(jax.random.PRNGKey(0), cfg), mesh
    )
    restored = load_checkpoint_sharded(path, template)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(restored.table)), np.asarray(state.table)
    )
    assert restored.table.sharding.spec == P("model", None)


def test_sharded_checkpoint_detects_missing_leaf(tmp_path):
    cfg = fm_kernel.KernelFMConfig(n_features=512, factor=4)
    state = fm_kernel.streaming_init(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "part")
    save_checkpoint_sharded(path, {"only": state.w0})
    import pytest

    with pytest.raises(ValueError, match="missing leaf"):
        load_checkpoint_sharded(path, {"only": state.w0, "extra": state.table})
