"""Dense-step vs sparse-step FM at large vocab (the PS-replacement story).

Dense autodiff touches every table row per step (O(vocab) HBM traffic);
the sparse path scales with batch nnz. Run on TPU:
    python benchmarks/bench_sparse.py [vocab_millions ...]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    o = None
    for _ in range(n):
        o = fn(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / n


def main():
    sys.path.insert(0, ".")
    from lightctr_tpu import optim
    from lightctr_tpu.models import fm, fm_sparse
    from lightctr_tpu.train.loop import TrainState, make_train_step

    vocab_sizes = [int(float(a) * 1e6) for a in sys.argv[1:]] or [1_000_000, 10_000_000]
    B, L, K = 4096, 64, 8
    rng = np.random.default_rng(0)

    for vocab in vocab_sizes:
        ids = rng.integers(0, vocab, (B, L)).astype(np.int32)
        batch = {
            "ids": jnp.asarray(ids),
            "vals": jnp.ones((B, L), jnp.float32),
            "fields": jnp.zeros((B, L), jnp.int32),
            "mask": jnp.ones((B, L), jnp.float32),
            "labels": jnp.asarray(rng.integers(0, 2, (B,)).astype(np.float32)),
            "row_mask": jnp.ones((B,), jnp.float32),
        }

        # dense step
        cfg_d = fm.FMConfig(n_features=vocab, factor=K)
        params = fm.init(jax.random.PRNGKey(0), cfg_d)
        tx = optim.adagrad(0.05)
        state_d = TrainState(params, tx.init(params), jax.random.PRNGKey(1))
        step_d = make_train_step(fm, cfg_d, tx)

        def dense_once(s):
            s2, _ = step_d(s, batch)
            return s2

        # sparse step
        cfg_s = fm_sparse.SparseFMConfig(
            n_features=vocab, factor=K, capacity=B * L, learning_rate=0.05
        )
        state_s = fm_sparse.init(jax.random.PRNGKey(0), cfg_s)
        step_s = fm_sparse.make_train_step(cfg_s)

        def sparse_once(s):
            s2, _ = step_s(s, batch)
            return s2

        td = timeit(dense_once, state_d, n=30)
        ts = timeit(sparse_once, state_s, n=30)
        print(
            f"vocab={vocab/1e6:.0f}M B={B} L={L} K={K}: "
            f"dense={td*1e3:.2f}ms ({B/td/1e6:.2f}M ex/s) "
            f"sparse={ts*1e3:.2f}ms ({B/ts/1e6:.2f}M ex/s) "
            f"speedup={td/ts:.1f}x"
        )


if __name__ == "__main__":
    main()
