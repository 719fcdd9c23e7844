"""Native parser, wire codec, hashing, persistence, profiling, DAG parity."""

import numpy as np
import pytest

from lightctr_tpu.data import load_libffm
from lightctr_tpu.data.native import load_libffm_native, native_available
from lightctr_tpu.utils.hashing import hash_to_vocab, murmur64, murmur_string
from lightctr_tpu.utils.persistent import PersistentArray, PersistentKV
from lightctr_tpu.utils.wire import (
    decode_sparse_update,
    delta_varuint_decode,
    delta_varuint_encode,
    encode_sparse_update,
    fp16_decode,
    fp16_encode,
    varuint_decode,
    varuint_encode,
)


@pytest.mark.skipif(not native_available(), reason="native lib not built")
def test_native_parser_matches_python(train_sparse_path):
    ds_py = load_libffm(train_sparse_path)
    ds_c = load_libffm_native(train_sparse_path)
    np.testing.assert_array_equal(ds_py.ids, ds_c.ids)
    np.testing.assert_array_equal(ds_py.fields, ds_c.fields)
    np.testing.assert_array_equal(ds_py.nnz, ds_c.nnz)
    np.testing.assert_array_equal(ds_py.labels, ds_c.labels)
    np.testing.assert_allclose(ds_py.vals, ds_c.vals, rtol=1e-6)
    assert ds_c.n_features == ds_py.n_features
    assert ds_c.n_fields == ds_py.n_fields


def test_varuint_roundtrip():
    vals = np.array([0, 1, 127, 128, 300, 1 << 20, (1 << 40) + 7], np.uint64)
    enc = varuint_encode(vals)
    # small values take 1 byte (wire-compactness, the point of the codec)
    assert len(varuint_encode([5])) == 1
    np.testing.assert_array_equal(varuint_decode(enc), vals)


def test_delta_varuint_sorted_ids():
    ids = np.sort(np.random.default_rng(0).choice(1 << 20, 500, replace=False))
    enc = delta_varuint_encode(ids)
    # ascending deltas compress far below 8 bytes/id
    assert len(enc) < 500 * 4
    np.testing.assert_array_equal(delta_varuint_decode(enc, 500), ids)


def test_fp16_and_sparse_update_roundtrip():
    vals = np.array([0.5, -1.25, 3.0e-4, 100.0], np.float32)
    np.testing.assert_allclose(fp16_decode(fp16_encode(vals)), vals, rtol=1e-3)
    ids = np.array([42, 7, 100000], np.uint64)
    w = np.array([0.5, -0.25, 1.5], np.float32)
    blob = encode_sparse_update(ids, w)
    rid, rw = decode_sparse_update(blob)
    np.testing.assert_array_equal(rid, np.sort(ids))
    np.testing.assert_allclose(rw, w[np.argsort(ids)], rtol=1e-3)


def test_sparse_update_empty_payload():
    """Regression (ADVICE r1): a PS-style exchange can legitimately carry
    zero touched keys; the codec must round-trip the empty payload."""
    blob = encode_sparse_update(np.empty((0,), np.uint64), np.empty((0,), np.float32))
    rid, rw = decode_sparse_update(blob)
    assert rid.size == 0 and rw.size == 0
    assert delta_varuint_encode(np.empty((0,), np.uint64)) == b""
    assert delta_varuint_decode(b"", 0).size == 0


def test_murmur_hash():
    keys = np.arange(1000, dtype=np.uint64)
    h = murmur64(keys)
    assert len(np.unique(h)) == 1000  # no collisions on tiny input
    # deterministic
    np.testing.assert_array_equal(h, murmur64(keys))
    assert murmur_string("field1:tokenA") != murmur_string("field1:tokenB")
    v = hash_to_vocab(keys, 64)
    assert v.min() >= 0 and v.max() < 64
    # roughly uniform
    counts = np.bincount(v, minlength=64)
    assert counts.min() > 0


def test_persistent_array_roundtrip(tmp_path):
    p = str(tmp_path / "arr.bin")
    a = PersistentArray(p, shape=(10, 4), dtype=np.float32)
    a[3] = 7.5
    a.flush()
    b = PersistentArray(p)  # reopen without shape
    assert b.array.shape == (10, 4)
    assert float(b[3][0]) == 7.5


def test_persistent_kv(tmp_path):
    kv = PersistentKV(str(tmp_path / "kv"), capacity=64, dim=3)
    kv.put(12345, [1.0, 2.0, 3.0])
    kv.put(678, [4.0, 5.0, 6.0])
    kv.put(12345, [9.0, 9.0, 9.0])  # update
    np.testing.assert_allclose(kv.get(12345), [9.0, 9.0, 9.0])
    np.testing.assert_allclose(kv.get(678), [4.0, 5.0, 6.0])
    assert kv.get(999) is None
    kv.flush()
    kv2 = PersistentKV(str(tmp_path / "kv"))
    np.testing.assert_allclose(kv2.get(678), [4.0, 5.0, 6.0])
    # key -1 is the EMPTY sentinel: a stored -1 row would look free to
    # later probes and be silently evicted — must be rejected loudly
    # (mirrors the native shm KV guard, tests/test_shm_kv.py)
    import pytest

    with pytest.raises(ValueError):
        kv2.put(-1, [0.0, 0.0, 0.0])
    assert kv2.get(-1) is None
    kv2.put(-2, [7.0, 8.0, 9.0])  # other negatives are ordinary keys
    np.testing.assert_allclose(kv2.get(-2), [7.0, 8.0, 9.0])


def test_dag_parity_linear_sigmoid_logloss():
    """The reference's one true unit test (main.cpp:80-116): a w*x+b ->
    sigmoid -> logistic-loss graph optimised for 20 steps must converge.
    JAX's tracer/autograd natively supplies the DAG capability
    (SURVEY.md §2.4)."""
    import jax
    import jax.numpy as jnp

    from lightctr_tpu import optim
    from lightctr_tpu.nn.losses import logistic_loss

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 4)).astype(np.float32))
    true_w = jnp.asarray([1.0, -2.0, 0.5, 0.0])
    y = (x @ true_w + 0.3 > 0).astype(jnp.float32)

    params = {"w": jnp.zeros((4,)), "b": jnp.zeros(())}

    def loss_fn(p):
        return logistic_loss(x @ p["w"] + p["b"], y)

    tx = optim.sgd(1.0)
    opt_state = tx.init(params)
    losses = []
    for _ in range(20):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optim.apply_updates(params, updates)
        losses.append(float(loss))
    assert losses[-1] < 0.3 * losses[0]  # converged in 20 steps


def test_step_timer():
    from lightctr_tpu.utils.profiling import StepTimer

    t = StepTimer(batch_size=100, window=3)
    assert not t.tick()
    assert not t.tick()
    assert t.tick()
    msg = t.report()
    assert "ex/s" in msg
    assert t.last["examples_per_sec"] > 0


def test_initialize_cluster_single_process():
    from lightctr_tpu.parallel.distributed import initialize_cluster

    info = initialize_cluster()
    assert info["process_count"] == 1
    assert info["global_devices"] >= 1
