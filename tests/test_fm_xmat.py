"""Design-matrix FM step (cfg.xmat) vs the Pallas kernel step.

cfg.xmat replaces every position-space kernel with dense matmuls against
the plan-constant count matrices Crow/Crow2; it must reproduce the
kernel path's losses and weights exactly (both are fp32-faithful in
exact mode).
"""

import numpy as np
import jax
import jax.numpy as jnp

from lightctr_tpu.models import fm_kernel


def _toy(seed=0, B=8, L=64, V=700):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, V, (B, L)).astype(np.int64)
    ids[:, :8] = rng.integers(0, 6, (B, 8))
    mask = (rng.random((B, L)) > 0.2).astype(np.float32)
    vals = rng.random((B, L)).astype(np.float32)  # non-unit x
    labels = rng.integers(0, 2, (B,)).astype(np.float32)
    return ids, vals, mask, labels


def _run(cfg, plan, n_steps=4):
    st = fm_kernel.init(jax.random.PRNGKey(0), cfg, plan)
    step = fm_kernel.make_train_step(cfg, plan)
    traj = []
    for _ in range(n_steps):
        st, loss = step(st)
        traj.append(float(loss))
    return traj, np.asarray(st.rows)


def test_xmat_matches_kernel_step():
    ids, vals, mask, labels = _toy()
    V = 700
    plan = fm_kernel.plan_batch(ids, vals, mask, labels)
    base = dict(n_features=V, factor=4, learning_rate=0.1, l2=1e-4,
                interpret=True, exact=True)
    traj_k, rows_k = _run(fm_kernel.KernelFMConfig(**base), plan)
    traj_x, rows_x = _run(fm_kernel.KernelFMConfig(**base, xmat=True), plan)
    np.testing.assert_allclose(traj_x, traj_k, rtol=1e-5)
    np.testing.assert_allclose(rows_x, rows_k, rtol=1e-4, atol=1e-6)


def test_xmat_ftrl_wide_matches_kernel_step():
    ids, vals, mask, labels = _toy(seed=1)
    V = 700
    plan = fm_kernel.plan_batch(ids, vals, mask, labels)
    base = dict(n_features=V, factor=4, learning_rate=0.1,
                wide_optimizer="ftrl", interpret=True, exact=True)
    traj_k, rows_k = _run(fm_kernel.KernelFMConfig(**base), plan)
    traj_x, rows_x = _run(fm_kernel.KernelFMConfig(**base, xmat=True), plan)
    np.testing.assert_allclose(traj_x, traj_k, rtol=1e-5)
    # fp32 reduction-order noise only (matmul vs one-hot accumulation)
    np.testing.assert_allclose(rows_x, rows_k, rtol=1e-4, atol=1e-5)


def test_count_matrices_values():
    ids, vals, mask, labels = _toy(seed=2, B=4, L=128, V=60)
    plan = fm_kernel.plan_batch(ids, vals, mask, labels)
    Crow, Crow2 = fm_kernel.count_matrices(plan)
    Crow, Crow2 = np.asarray(Crow), np.asarray(Crow2)
    rid = np.asarray(plan.rowid_sorted)
    rnk = np.asarray(plan.ranks_sorted)
    xv = np.asarray(plan.xv_sorted)
    want = np.zeros_like(Crow)
    want2 = np.zeros_like(Crow2)
    np.add.at(want, (rid, rnk), xv)
    np.add.at(want2, (rid, rnk), xv * xv)
    np.testing.assert_allclose(Crow, want, rtol=1e-6)
    np.testing.assert_allclose(Crow2, want2, rtol=1e-6)
    # every valid (row, id) weight is represented
    assert np.isclose(Crow.sum(), (vals * mask).sum(), rtol=1e-5)


def test_streaming_xmat_matches_kernel_step():
    """Packed streaming step with cfg.xmat (per-batch device-built count
    matrices) must reproduce the kernel streaming trajectory exactly."""
    ids, vals, mask, labels = _toy(seed=4, B=8, L=64, V=700)
    V = 700
    capacity = 1024
    b_pad = 128
    base = dict(n_features=V, factor=4, learning_rate=0.1, l2=1e-4,
                interpret=True, exact=True)

    trajs = {}
    for xmat in (False, True):
        cfg = fm_kernel.KernelFMConfig(**base, xmat=xmat)
        state = fm_kernel.streaming_init_packed(jax.random.PRNGKey(0), cfg)
        step = fm_kernel.make_streaming_train_step_packed(cfg, capacity,
                                                          b_pad)
        traj = []
        for s in range(3):
            b = fm_kernel.plan_batch_on_device(
                jnp.asarray(np.roll(ids, s, axis=0).astype(np.int32)),
                jnp.asarray(vals), jnp.asarray(mask), jnp.asarray(labels),
                jnp.asarray(np.ones(ids.shape[0], np.float32)),
                capacity=capacity, b_pad=b_pad,
            )
            state, loss = step(state, b)
            traj.append(float(loss))
        trajs[xmat] = (traj, np.asarray(state.packed))
    np.testing.assert_allclose(trajs[True][0], trajs[False][0], rtol=1e-5)
    # fp32 reduction-order noise compounds over 3 adagrad steps
    np.testing.assert_allclose(trajs[True][1], trajs[False][1],
                               rtol=1e-4, atol=1e-5)


def test_kernel_engine_picks_streaming_xmat():
    """The CLI engine routes small-capacity streaming to xmat and still
    trains (loss falls)."""
    from lightctr_tpu.data import load_libffm
    from lightctr_tpu.train.kernel_engine import train_fm_kernel

    ds = load_libffm("/root/reference/data/train_sparse.csv")
    params, losses = train_fm_kernel(ds, factor=4, epochs=2, batch_size=250,
                                     learning_rate=0.05, log=None)
    assert losses[-1] < losses[0]
    assert params["v"].shape == (ds.n_features, 4)


def test_nfm_xmat_matches_kernel_step():
    from lightctr_tpu.models import nfm_kernel

    ids, vals, mask, labels = _toy(seed=3)
    V = 700
    plan = fm_kernel.plan_batch(ids, vals, mask, labels)
    base = dict(n_features=V, factor=4, hidden=(8,), learning_rate=0.1,
                interpret=True, exact=True)

    trajs = {}
    for xmat in (False, True):
        cfg = nfm_kernel.KernelNFMConfig(**base, xmat=xmat)
        st = nfm_kernel.init(jax.random.PRNGKey(0), cfg, plan)
        step = nfm_kernel.make_train_step(cfg, plan)
        traj = []
        for _ in range(4):
            st, loss = step(st)
            traj.append(float(loss))
        trajs[xmat] = (traj, np.asarray(st.rows))
    np.testing.assert_allclose(trajs[True][0], trajs[False][0], rtol=1e-5)
    np.testing.assert_allclose(trajs[True][1], trajs[False][1],
                               rtol=1e-4, atol=1e-5)


def test_xmat_wide_factor_matches_bruteforce():
    """factor > 15 exceeds the Pallas packed row (K.D=16) and runs on the
    width-agnostic xmat path (cfg.row_width pads to 16-lane multiples) —
    the reference's vs_libfm benchmark goes to k=64. First-step loss must
    equal the brute-force dense FM logloss computed straight from the
    formula (train_fm_algo.cpp:75-83), and training must make progress."""
    ids, vals, mask, labels = _toy(seed=2)
    V, k = 700, 20
    plan = fm_kernel.plan_batch(ids, vals, mask, labels)
    cfg = fm_kernel.KernelFMConfig(n_features=V, factor=k,
                                   learning_rate=0.1, exact=True, xmat=True)
    assert cfg.row_width == 32
    st = fm_kernel.init(jax.random.PRNGKey(0), cfg, plan)
    step = fm_kernel.make_train_step(cfg, plan)
    _, loss0 = step(st)

    # brute force: rank(id) via the plan's uids map
    rows = np.asarray(st.rows)
    uids = np.asarray(plan.uids)
    rank_of = {int(u): r for r, u in enumerate(uids[: plan.n_unique])}
    B, L = ids.shape
    z = np.zeros(B)
    for i in range(B):
        s = np.zeros(k)
        ss = 0.0
        for l in range(L):
            if mask[i, l] <= 0:
                continue
            r = rank_of[int(ids[i, l])]
            x = vals[i, l]
            z[i] += rows[r, 0] * x
            vx = rows[r, 1 : 1 + k] * x
            s += vx
            ss += float(vx @ vx)
        z[i] += 0.5 * (float(s @ s) - ss)
    p = 1.0 / (1.0 + np.exp(-z))
    ref_loss = float(np.mean(
        -(labels * np.log(p) + (1 - labels) * np.log(1 - p))))
    np.testing.assert_allclose(float(loss0), ref_loss, rtol=1e-5)

    traj, _ = _run(cfg, plan, n_steps=6)
    assert traj[-1] < traj[0]


def test_kernel_path_rejects_wide_factor():
    ids, vals, mask, labels = _toy(seed=3)
    plan = fm_kernel.plan_batch(ids, vals, mask, labels)
    cfg = fm_kernel.KernelFMConfig(n_features=700, factor=20)
    import pytest

    with pytest.raises(ValueError, match="xmat"):
        fm_kernel.make_train_step(cfg, plan)
