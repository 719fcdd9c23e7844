"""Fused-kernel FM vs dense-jnp FM: loss trajectory must match (interpret
mode on CPU; same code path compiles for TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from lightctr_tpu.models import fm, fm_kernel
from lightctr_tpu import optim
from lightctr_tpu.train.loop import TrainState, make_train_step


def _toy_batch(seed=0, B=8, L=128, V=300):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, V, (B, L)).astype(np.int64)
    ids[:, :16] = rng.integers(0, 8, (B, 16))       # hot head, CTR-like
    mask = (rng.random((B, L)) > 0.2).astype(np.float32)
    vals = np.ones((B, L), np.float32)
    labels = rng.integers(0, 2, (B,)).astype(np.float32)
    return ids, vals, mask, labels


def test_kernel_fm_matches_dense_fm():
    ids, vals, mask, labels = _toy_batch()
    V = 300
    KF = 4

    # dense reference
    cfg_d = fm.FMConfig(n_features=V, factor=KF)
    params = fm.init(jax.random.PRNGKey(0), cfg_d)
    v0 = np.array(params["v"])
    batch = {
        "ids": jnp.asarray(ids.astype(np.int32)),
        "vals": jnp.asarray(vals),
        "fields": jnp.zeros_like(jnp.asarray(ids, jnp.int32)),
        "mask": jnp.asarray(mask),
        "labels": jnp.asarray(labels),
        "row_mask": jnp.ones((ids.shape[0],), jnp.float32),
    }
    tx = optim.adagrad(0.02)
    st_d = TrainState(params, tx.init(params), jax.random.PRNGKey(1))
    step_d = make_train_step(fm, cfg_d, tx)
    dense_losses = []
    for _ in range(5):
        st_d, l = step_d(st_d, batch)
        dense_losses.append(float(l))

    # fused kernel trainer (interpret mode on CPU)
    cfg_k = fm_kernel.KernelFMConfig(
        n_features=V, factor=KF, learning_rate=0.02, interpret=True
    )
    plan = fm_kernel.plan_batch(ids, vals, mask, labels)
    st_k = fm_kernel.init(jax.random.PRNGKey(0), cfg_k, plan)
    # align the factor init with the dense model's (map vocab -> rank space)
    rows = np.array(st_k.rows)
    uids = plan.uids[: plan.n_unique]
    rows[: plan.n_unique, 1 : 1 + KF] = v0[uids]
    rows[plan.n_rows_pad - 1] = 0.0
    st_k = st_k._replace(rows=jnp.asarray(rows))
    step_k = fm_kernel.make_train_step(cfg_k, plan)
    kernel_losses = []
    for _ in range(5):
        st_k, l = step_k(st_k)
        kernel_losses.append(float(l))

    # step-1 loss computed from identical params must agree tightly
    np.testing.assert_allclose(dense_losses[0], kernel_losses[0], rtol=1e-4)
    # bf16 one-hot matmuls round at ~1e-2; trajectories drift slowly
    np.testing.assert_allclose(dense_losses, kernel_losses, rtol=6e-2)
    assert kernel_losses[-1] < kernel_losses[0]


def test_mega_kernel_matches_staged_path():
    """fused=True (one two-phase pallas_call) must reproduce the staged
    3-kernel path exactly in fp32-exact mode: same losses, same weights."""
    ids, vals, mask, labels = _toy_batch(seed=11)
    V, KF = 300, 4
    cfg_s = fm_kernel.KernelFMConfig(
        n_features=V, factor=KF, learning_rate=0.05, l2=1e-3,
        interpret=True, exact=True,
    )
    cfg_f = fm_kernel.KernelFMConfig(
        n_features=V, factor=KF, learning_rate=0.05, l2=1e-3,
        interpret=True, exact=True, fused=True,
    )
    plan = fm_kernel.plan_batch(ids, vals, mask, labels)
    st_s = fm_kernel.init(jax.random.PRNGKey(0), cfg_s, plan)
    st_f = fm_kernel.init(jax.random.PRNGKey(0), cfg_f, plan)
    step_s = fm_kernel.make_train_step(cfg_s, plan)
    step_f = fm_kernel.make_train_step(cfg_f, plan)
    for i in range(5):
        st_s, ls = step_s(st_s)
        st_f, lf = step_f(st_f)
        np.testing.assert_allclose(float(lf), float(ls), rtol=1e-6,
                                   err_msg=f"step {i}")
    np.testing.assert_allclose(
        np.asarray(st_f.rows), np.asarray(st_s.rows), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(float(st_f.w0), float(st_s.w0), rtol=1e-5)


def test_mega_kernel_ftrl_wide():
    ids, vals, mask, labels = _toy_batch(seed=13)
    plan = fm_kernel.plan_batch(ids, vals, mask, labels)
    for fused in (False, True):
        cfg = fm_kernel.KernelFMConfig(
            n_features=300, factor=4, learning_rate=0.1, interpret=True,
            exact=True, fused=fused, wide_optimizer="ftrl",
            ftrl_alpha=0.1, ftrl_lambda1=5.0,
        )
        st = fm_kernel.init(jax.random.PRNGKey(0), cfg, plan)
        step = fm_kernel.make_train_step(cfg, plan)
        for _ in range(8):
            st, _ = step(st)
        if fused:
            w_f = np.asarray(st.rows[: plan.n_unique, 0])
        else:
            w_s = np.asarray(st.rows[: plan.n_unique, 0])
    np.testing.assert_allclose(w_f, w_s, rtol=1e-5, atol=1e-7)
    assert (w_f == 0.0).mean() > 0.5


def test_kernel_fm_export_roundtrip():
    ids, vals, mask, labels = _toy_batch(seed=3)
    V, KF = 300, 4
    cfg_k = fm_kernel.KernelFMConfig(
        n_features=V, factor=KF, learning_rate=0.2, interpret=True
    )
    plan = fm_kernel.plan_batch(ids, vals, mask, labels)
    st = fm_kernel.init(jax.random.PRNGKey(0), cfg_k, plan)
    step = fm_kernel.make_train_step(cfg_k, plan)
    for _ in range(10):
        st, loss = step(st)
    w0, w_full, v_full = fm_kernel.export_tables(st, plan, cfg_k)
    # score with the plain dense formulation and check it learned something
    xv = jnp.asarray(vals * mask)
    idsj = jnp.asarray(ids.astype(np.int32))
    linear = jnp.sum(jnp.asarray(w_full)[idsj] * xv, axis=-1)
    vx = jnp.asarray(v_full)[idsj] * xv[..., None]
    s = jnp.sum(vx, axis=1)
    ss = jnp.sum(vx * vx, axis=1)
    logits = w0 + linear + 0.5 * jnp.sum(s * s - ss, axis=-1)
    probs = np.asarray(jax.nn.sigmoid(logits))
    pred = (probs > 0.5).astype(np.float32)
    assert (pred == labels).mean() >= 0.75  # separable tiny batch: fits it


def test_kernel_fm_ftrl_wide_sparsifies():
    """FTRL wide column: strong lambda1 zeroes most w while v still learns."""
    ids, vals, mask, labels = _toy_batch(seed=7)
    V = 300
    cfg = fm_kernel.KernelFMConfig(
        n_features=V, factor=4, learning_rate=0.1, interpret=True, exact=True,
        wide_optimizer="ftrl", ftrl_alpha=0.1, ftrl_lambda1=5.0,
    )
    plan = fm_kernel.plan_batch(ids, vals, mask, labels)
    st = fm_kernel.init(jax.random.PRNGKey(0), cfg, plan)
    step = fm_kernel.make_train_step(cfg, plan)
    losses = []
    for _ in range(10):
        st, l = step(st)
        losses.append(float(l))
    assert losses[-1] < losses[0]
    w = np.asarray(st.rows[: plan.n_unique, 0])
    v = np.asarray(st.rows[: plan.n_unique, 1:5])
    # L1 proximal zeroes a large fraction of the wide weights exactly
    assert (w == 0.0).mean() > 0.5
    # while factors keep training
    assert np.abs(v).max() > 0.01

    # and with lambda1=0 the wide part is dense
    cfg2 = fm_kernel.KernelFMConfig(
        n_features=V, factor=4, learning_rate=0.1, interpret=True, exact=True,
        wide_optimizer="ftrl", ftrl_alpha=0.1, ftrl_lambda1=0.0,
    )
    st2 = fm_kernel.init(jax.random.PRNGKey(0), cfg2, plan)
    step2 = fm_kernel.make_train_step(cfg2, plan)
    for _ in range(10):
        st2, _ = step2(st2)
    w2 = np.asarray(st2.rows[: plan.n_unique, 0])
    assert (w2 == 0.0).mean() < 0.1
