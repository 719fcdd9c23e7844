"""Auto-capacity octaves for the streaming planners (VERDICT r2 #5).

The streaming engines size their rank space per batch from the OBSERVED
unique count (counted exactly on the Prefetcher thread), bucketed to
mult * 2^k octaves — skewed traffic stops paying the B*L worst case,
recompiles are bounded to one per octave, and overflow is impossible by
construction (an exact count simply escalates to the next octave).
These tests pin: the octave law, capacity-invariance of the trajectory
(the property that makes re-bucketing safe at all), and that the
engines actually learn with it on.
"""

import numpy as np
import jax
import jax.numpy as jnp

from lightctr_tpu.data import load_libffm
from lightctr_tpu.models import fm_kernel
from lightctr_tpu.ops.embedding_pallas import TILE
from lightctr_tpu.train.kernel_engine import (
    _capacity_octave,
    train_ffm_kernel,
    train_fm_kernel,
)


def test_capacity_octave_law():
    mult, cap_max = 2 * TILE, 65536
    assert _capacity_octave(0, mult, cap_max) == mult
    assert _capacity_octave(mult - TILE - 1, mult, cap_max) == mult
    # need = n + TILE + 1 crosses the octave
    assert _capacity_octave(mult - TILE, mult, cap_max) == 2 * mult
    assert _capacity_octave(3000, mult, cap_max) == 4096
    assert _capacity_octave(10**9, mult, cap_max) == cap_max
    # escalation is monotone
    caps = [_capacity_octave(n, mult, cap_max) for n in range(0, 20000, 97)]
    assert all(b >= a for a, b in zip(caps, caps[1:]))


def test_streaming_trajectory_capacity_invariant():
    """The streaming step's math must not depend on the rank-space
    padding: the same batches at two different capacities produce the
    same losses — the property auto-octave bucketing relies on."""
    rng = np.random.default_rng(0)
    B, L, V = 64, 8, 2048
    ids = rng.integers(0, V, (B, L)).astype(np.int32)
    args = [jnp.asarray(x) for x in (
        ids, np.ones((B, L), np.float32), np.ones((B, L), np.float32),
        rng.integers(0, 2, (B,)).astype(np.float32),
        np.ones((B,), np.float32))]
    cfg = fm_kernel.KernelFMConfig(
        n_features=V, factor=4, learning_rate=0.2, interpret=True,
        exact=True)
    losses = {}
    for cap in (2 * TILE, 8 * TILE):
        state = fm_kernel.streaming_init_packed(jax.random.PRNGKey(0), cfg)
        step = fm_kernel.make_streaming_train_step_fused(cfg, cap, 64)
        ls = []
        for _ in range(4):
            state, loss = step(state, *args)
            ls.append(float(loss))
        losses[cap] = ls
    np.testing.assert_allclose(losses[2 * TILE], losses[8 * TILE],
                               rtol=1e-6)


def _skewed_ds(tmp_path, rows=300, vocab=5000):
    """libffm file whose rows draw from a zipf head — most batches touch
    far fewer uniques than B*L."""
    rng = np.random.default_rng(1)
    lines = []
    for _ in range(rows):
        feats = np.unique(np.minimum(rng.zipf(1.3, 12) - 1, vocab - 1))
        label = int(feats.min() < 2)
        toks = " ".join(f"{f % 7}:{f}:1" for f in feats)
        lines.append(f"{label} {toks}")
    p = tmp_path / "skew.csv"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_fm_streaming_auto_capacity_learns(tmp_path):
    ds = load_libffm(_skewed_ds(tmp_path))
    params, losses = train_fm_kernel(
        ds, factor=4, learning_rate=0.2, epochs=4, batch_size=64,
        seed=0, log=None)
    assert losses[-1] < 0.8 * losses[0]
    assert np.isfinite(losses).all()


def test_ffm_streaming_auto_capacity_learns(tmp_path):
    ds = load_libffm(_skewed_ds(tmp_path))
    params, losses = train_ffm_kernel(
        ds, factor=2, learning_rate=0.2, epochs=4, batch_size=64,
        seed=0, log=None)
    assert losses[-1] < 0.8 * losses[0]
    assert np.isfinite(losses).all()
