import numpy as np
import jax.numpy as jnp

from lightctr_tpu import optim
from lightctr_tpu.data import sparse_batches
from lightctr_tpu.data.pipeline import Prefetcher
from lightctr_tpu.models import fm
from lightctr_tpu.parallel import make_mesh
from lightctr_tpu.parallel.collectives import make_compressed_train_step
from lightctr_tpu.train.loop import TrainState, make_train_step


def test_prefetcher_yields_all_batches(sparse_small):
    rng = np.random.default_rng(0)
    pf = Prefetcher(lambda ep: sparse_batches(sparse_small, 128, rng=rng))
    n1 = sum(1 for _ in pf.epoch(0))
    n2 = sum(1 for _ in pf.epoch(1))
    assert n1 == n2 == 4
    # batches arrive as device arrays
    b = next(iter(pf.epoch(2)))
    assert hasattr(b["ids"], "devices")


def test_prefetcher_propagates_errors():
    def bad_factory(ep):
        yield {"x": np.zeros(3)}
        raise RuntimeError("loader exploded")

    pf = Prefetcher(bad_factory)
    it = pf.epoch(0)
    next(it)
    try:
        list(it)
    except RuntimeError as e:
        assert "exploded" in str(e)
    else:
        raise AssertionError("expected the loader error to propagate")


def test_prefetched_training_matches_plain(sparse_small):
    cfg = fm.FMConfig(n_features=sparse_small.n_features, factor=4)
    tx = optim.adagrad(0.1)
    import jax

    params = fm.init(jax.random.PRNGKey(0), cfg)
    step = make_train_step(fm, cfg, tx)

    def run(batches):
        # fresh buffers per run: the jitted step donates its state
        p = jax.tree_util.tree_map(jnp.array, params)
        st = TrainState(p, tx.init(p), jax.random.PRNGKey(1))
        losses = []
        for b in batches:
            st, l = step(st, b)
            losses.append(float(l))
        return losses

    plain = run(sparse_batches(sparse_small, 128))
    pf = Prefetcher(lambda ep: sparse_batches(sparse_small, 128))
    fetched = run(pf.epoch(0))
    np.testing.assert_allclose(plain, fetched, rtol=1e-6)


def test_compressed_train_step_learns(sparse_small):
    mesh = make_mesh(data=8, model=1)
    cfg = fm.FMConfig(n_features=sparse_small.n_features, factor=4)
    tx = optim.adagrad(0.2)
    import jax

    params = fm.init(jax.random.PRNGKey(0), cfg)
    state = TrainState(params, tx.init(params), jax.random.PRNGKey(1))
    step = make_compressed_train_step(fm, cfg, tx, mesh, wire_dtype=jnp.bfloat16)
    losses = []
    for _ in range(6):
        for b in sparse_batches(sparse_small, 128):
            state, loss = step(state, b)
            losses.append(float(loss))
    assert losses[-1] < 0.5 * losses[0]
