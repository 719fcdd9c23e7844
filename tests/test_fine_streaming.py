"""Fine-window (5x128) kernels on the NFM and streaming paths.

The fine gather/scatter windows and the merged backward+scatter kernel
were validated for full-batch FM in test_fine_windows.py; these tests pin
the same numerics through the NFM trainer and the streaming (per-batch
plan) FM steps — fine and coarse must produce identical loss
trajectories from identical inits (interpret mode on CPU; same code
compiles for TPU).
"""

import numpy as np
import jax
import jax.numpy as jnp

from lightctr_tpu.models import fm_kernel, nfm_kernel

# multiple of both 2*TILE=1024 (coarse scatter parity) and 5*WTILE=640
CAPACITY = 5120


def _toy(seed=0, B=8, L=128, V=900):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, V, (B, L)).astype(np.int64)
    ids[:, :16] = rng.integers(0, 8, (B, 16))
    mask = (rng.random((B, L)) > 0.2).astype(np.float32)
    vals = np.ones((B, L), np.float32)
    labels = rng.integers(0, 2, (B,)).astype(np.float32)
    return ids, vals, mask, labels


def test_nfm_fine_matches_coarse():
    ids, vals, mask, labels = _toy()
    V, KF = 900, 4
    plan_c = fm_kernel.plan_batch(ids, vals, mask, labels)
    plan_f = fm_kernel.plan_batch(ids, vals, mask, labels, fine=True)
    assert plan_c.n_unique == plan_f.n_unique
    n_u = plan_c.n_unique

    cfg_c = nfm_kernel.KernelNFMConfig(
        n_features=V, factor=KF, hidden=(8,), learning_rate=0.1,
        interpret=True, exact=True,
    )
    cfg_f = nfm_kernel.KernelNFMConfig(
        n_features=V, factor=KF, hidden=(8,), learning_rate=0.1,
        interpret=True, exact=True, fine=True,
    )
    st_c = nfm_kernel.init(jax.random.PRNGKey(0), cfg_c, plan_c)
    st_f = nfm_kernel.init(jax.random.PRNGKey(0), cfg_f, plan_f)
    # rank-space padding differs between the plans, so the random init
    # draws differ; only rows < n_unique affect the loss — copy those
    rows_f = np.zeros((plan_f.n_rows_pad, st_f.rows.shape[1]), np.float32)
    rows_f[:n_u] = np.asarray(st_c.rows)[:n_u]
    st_f = st_f._replace(rows=jnp.asarray(rows_f), mlp=st_c.mlp)

    trajs = {}
    for name, cfg, plan, st in (("coarse", cfg_c, plan_c, st_c),
                                ("fine", cfg_f, plan_f, st_f)):
        step = nfm_kernel.make_train_step(cfg, plan)
        traj = []
        for _ in range(3):
            st, loss = step(st)
            traj.append(float(loss))
        trajs[name] = traj

    np.testing.assert_allclose(trajs["fine"], trajs["coarse"], rtol=1e-5)


def _streaming_traj(cfg, batches, capacity, b_pad, packed=False):
    if packed:
        state = fm_kernel.streaming_init_packed(jax.random.PRNGKey(0), cfg)
        step = fm_kernel.make_streaming_train_step_packed(cfg, capacity, b_pad)
    else:
        state = fm_kernel.streaming_init(jax.random.PRNGKey(0), cfg)
        step = fm_kernel.make_streaming_train_step(cfg, capacity, b_pad)
    traj = []
    for arrays in batches:
        state, loss = step(state, arrays)
        traj.append(float(loss))
    return traj


def test_streaming_fm_fine_matches_coarse():
    V = 900
    batches = []
    for seed in range(3):
        ids, vals, mask, labels = _toy(seed=seed, V=V)
        arrays = fm_kernel.plan_batch_on_device(
            jnp.asarray(ids), jnp.asarray(vals), jnp.asarray(mask),
            jnp.asarray(labels), jnp.ones((ids.shape[0],), jnp.float32),
            capacity=CAPACITY, b_pad=128,
        )
        batches.append(arrays)

    base = dict(n_features=V, factor=4, learning_rate=0.2,
                interpret=True, exact=True)
    coarse = _streaming_traj(
        fm_kernel.KernelFMConfig(**base), batches, CAPACITY, 128)
    fine = _streaming_traj(
        fm_kernel.KernelFMConfig(**base, fine=True), batches, CAPACITY, 128)
    np.testing.assert_allclose(fine, coarse, rtol=1e-5)

    packed_fine = _streaming_traj(
        fm_kernel.KernelFMConfig(**base, fine=True), batches, CAPACITY, 128,
        packed=True)
    np.testing.assert_allclose(packed_fine, coarse, rtol=1e-5)


def test_streaming_nfm_fine_matches_coarse():
    V = 900
    batches = []
    for seed in range(3):
        ids, vals, mask, labels = _toy(seed=seed, V=V)
        batches.append(fm_kernel.plan_batch_on_device(
            jnp.asarray(ids), jnp.asarray(vals), jnp.asarray(mask),
            jnp.asarray(labels), jnp.ones((ids.shape[0],), jnp.float32),
            capacity=CAPACITY, b_pad=128,
        ))

    trajs = {}
    for fine in (False, True):
        cfg = nfm_kernel.KernelNFMConfig(
            n_features=V, factor=4, hidden=(8,), learning_rate=0.1,
            interpret=True, exact=True, fine=fine,
        )
        state = nfm_kernel.streaming_init(jax.random.PRNGKey(0), cfg)
        step = nfm_kernel.make_streaming_train_step(cfg, CAPACITY, 128)
        traj = []
        for arrays in batches:
            state, loss = step(state, arrays)
            traj.append(float(loss))
        trajs[fine] = traj
    np.testing.assert_allclose(trajs[True], trajs[False], rtol=1e-5)


def test_streaming_nfm_fused_matches_separate():
    """make_streaming_train_step_fused (NFM: plan traced into the step,
    one dispatch per raw batch) == plan_batch_on_device + streaming step."""
    V = 900
    raw = [_toy(seed=s, V=V) for s in range(3)]
    cfg = nfm_kernel.KernelNFMConfig(
        n_features=V, factor=4, hidden=(8,), learning_rate=0.1,
        interpret=True, exact=True, fine=True,
    )
    state_s = nfm_kernel.streaming_init(jax.random.PRNGKey(0), cfg)
    state_f = nfm_kernel.streaming_init(jax.random.PRNGKey(0), cfg)
    step_s = nfm_kernel.make_streaming_train_step(cfg, CAPACITY, 128)
    step_f = nfm_kernel.make_streaming_train_step_fused(cfg, CAPACITY, 128)

    losses_s, losses_f = [], []
    for ids, vals, mask, labels in raw:
        ids = jnp.asarray(ids)
        vals = jnp.asarray(vals)
        mask = jnp.asarray(mask)
        labels = jnp.asarray(labels)
        rmask = jnp.ones((ids.shape[0],), jnp.float32)
        arrays = fm_kernel.plan_batch_on_device(
            ids, vals, mask, labels, rmask, capacity=CAPACITY, b_pad=128)
        state_s, ls = step_s(state_s, arrays)
        state_f, lf = step_f(state_f, ids, vals, mask, labels, rmask)
        losses_s.append(float(ls))
        losses_f.append(float(lf))
    np.testing.assert_allclose(losses_f, losses_s, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(state_f.table),
                               np.asarray(state_s.table),
                               rtol=1e-6, atol=1e-8)


def test_fine_tile1024_matches_default_windows():
    """fine_tile=1024/fine_nwin=10 (half the Mosaic grid slots per
    sweep) reproduces the default 512/5 fine trajectory exactly — the
    window-coverage rule (nwin*128 >= tile+128) holds by construction
    for dense rank spaces."""
    V, capacity, b_pad = 900, 5120, 128
    B, L = 16, 64                       # 1024 positions: % fine_tile == 0
    batches = []
    rng = np.random.default_rng(5)
    for seed in range(3):
        ids = np.minimum(rng.integers(0, V, (B, L)), V - 1).astype(np.int64)
        vals = rng.random((B, L)).astype(np.float32)
        mask = np.ones((B, L), np.float32)
        labels = rng.integers(0, 2, (B,)).astype(np.float32)
        batches.append((ids, vals, mask, labels))

    trajs = {}
    for name, tile, nwin in (("default", 512, 5), ("wide", 1024, 10)):
        cfg = fm_kernel.KernelFMConfig(
            n_features=V, factor=4, learning_rate=0.1,
            interpret=True, exact=True, fine=True, fine_tile=tile,
            fine_nwin=nwin,
        )
        state = fm_kernel.streaming_init_packed(jax.random.PRNGKey(0), cfg)
        step = fm_kernel.make_streaming_train_step_packed(
            cfg, capacity, b_pad)
        traj = []
        for ids, vals, mask, labels in batches:
            plan = fm_kernel.plan_batch(
                ids, vals, mask, labels, n_rows_pad=capacity, fine=True,
                fine_tile=tile, fine_nwin=nwin)
            arrays = fm_kernel.plan_to_arrays(plan, capacity)
            state, loss = step(state, arrays)
            traj.append(float(loss))
        trajs[name] = (traj, np.asarray(state.packed))
    np.testing.assert_allclose(trajs["wide"][0], trajs["default"][0],
                               rtol=1e-6)
    # cross-geometry reduction-order ulps (the residue scatter sums the
    # same contributions in different block groupings) amplified through
    # Adagrad's 1/sqrt — same tolerance class as the partitioned tests
    np.testing.assert_allclose(trajs["wide"][1], trajs["default"][1],
                               rtol=1e-4, atol=1e-5)
