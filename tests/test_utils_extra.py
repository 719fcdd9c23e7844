"""PCA / ensembling / compression / stats tests."""

import numpy as np
import jax
import jax.numpy as jnp

from lightctr_tpu.utils import pca, stats
from lightctr_tpu.utils.compress import (
    ProductQuantizer,
    QuantileCompress,
    kmeans,
    lowbit_dequantize,
    lowbit_quantize,
)
from lightctr_tpu.utils.ensembling import (
    adaboost,
    adaboost_predict,
    vote_hard,
    vote_soft,
)


def test_pca_recovers_direction():
    rng = np.random.default_rng(0)
    t = rng.normal(size=(500, 1)).astype(np.float32)
    direction = np.array([[3.0, 4.0]], np.float32) / 5.0
    x = t @ direction * 5 + rng.normal(size=(500, 2)).astype(np.float32) * 0.1
    comps, mean, ev = pca.fit(jnp.asarray(x), 1)
    c = np.asarray(comps)[0]
    assert abs(abs(c @ direction[0]) - 1.0) < 0.01
    reduced = np.asarray(pca.reduce_dimension(jnp.asarray(x), comps, mean))
    assert reduced.shape == (500, 1)
    # removing the top PC kills most variance
    removed = np.asarray(pca.remove_pc(jnp.asarray(x), 1))
    assert removed.var() < 0.1 * x.var()


def test_voting():
    p1 = np.array([0, 0, 1, 1])
    p2 = np.array([0, 1, 1, 1])
    p3 = np.array([1, 0, 1, 0])
    np.testing.assert_array_equal(vote_hard([p1, p2, p3]), [0, 0, 1, 1])
    probs = [np.array([[0.8, 0.2]]), np.array([[0.4, 0.6]])]
    np.testing.assert_allclose(vote_soft(probs), [[0.6, 0.4]])


def test_adaboost_improves_weak_stumps():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(400, 2))
    y = ((x[:, 0] + x[:, 1]) > 0).astype(np.float64)

    def fit_stump(x, y, w):
        # best-of-few axis-aligned stumps under weights
        best = None
        for f in range(2):
            for thr in np.linspace(-1, 1, 9):
                for sign in (1, -1):
                    pred = ((sign * (x[:, f] - thr)) > 0).astype(np.float64)
                    err = np.sum(w * (pred != y))
                    if best is None or err < best[0]:
                        best = (err, f, thr, sign)
        _, f, thr, sign = best
        return lambda xx: ((sign * (xx[:, f] - thr)) > 0).astype(np.float64)

    models, alphas = adaboost(fit_stump, x, y, n_rounds=10)
    acc = (adaboost_predict(models, alphas, x) == y).mean()
    single = (models[0](x) == y).mean()
    assert acc > single
    assert acc > 0.9


def test_quantile_compress_roundtrip():
    for dist in ["uniform", "log", "normal"]:
        qc = QuantileCompress(n_bits=8, distribution=dist, scale=1.0)
        x = np.clip(np.random.default_rng(0).normal(size=1000) * 0.3, -1, 1)
        codes = qc.encode(jnp.asarray(x))
        assert codes.dtype == jnp.uint8
        decoded = np.asarray(qc.decode(codes))
        # 8-bit roundtrip: small error relative to range
        assert np.abs(decoded - x).mean() < 0.02, dist


def test_quantile_compress_custom_fit_roundtrip():
    # reference CUSTOM_DISTRIBUT: N(mu, sigma) table fit from observed data
    # (quantile_compress.h:65-105); skewed off-center values so that the
    # default uniform/normal tables would be a poor match.
    rng = np.random.default_rng(3)
    x = rng.normal(5.0, 0.25, size=4000)
    qc = QuantileCompress.fit(x, n_bits=8, distribution="custom")
    assert abs(qc.mu - 5.0) < 0.05 and abs(qc.sigma - 0.25) < 0.05
    codes = qc.encode(jnp.asarray(x))
    decoded = np.asarray(qc.decode(codes))
    span = x.max() - x.min()
    assert np.abs(decoded - x).mean() < 0.01 * span
    # custom table is dense where the data is: beats a uniform table over
    # a range 10x wider than the data's spread
    wide = QuantileCompress(n_bits=8, distribution="uniform", scale=10.0)
    wide_err = np.abs(np.asarray(wide.decode(wide.encode(jnp.asarray(x - 5.0)))) - (x - 5.0))
    assert np.abs(decoded - x).mean() < wide_err.mean()
    # out-of-range values clamp to the table ends (reference encoding :109-113);
    # the top entry is the top in-range normal quantile, not hi itself
    ends = np.asarray(qc.decode(qc.encode(jnp.asarray([x.min() - 10, x.max() + 10]))))
    assert ends[0] <= x.min() + 1e-5 * span and ends[1] >= np.quantile(x, 0.99)


def test_quantile_compress_empirical_fit_roundtrip():
    # bimodal data — empirical mode puts table mass on both modes
    rng = np.random.default_rng(4)
    x = np.concatenate([rng.normal(-3, 0.1, 2000), rng.normal(7, 0.2, 2000)])
    qc = QuantileCompress.fit(x, n_bits=8, distribution="empirical")
    tbl = np.asarray(qc.table())
    assert tbl.shape == (256,) and np.all(np.diff(tbl) >= 0)
    decoded = np.asarray(qc.decode(qc.encode(jnp.asarray(x))))
    span = x.max() - x.min()
    assert np.abs(decoded - x).mean() < 0.005 * span
    # 4-bit property roundtrip still within a table-spacing of the truth
    qc4 = QuantileCompress.fit(x, n_bits=4, distribution="empirical")
    d4 = np.asarray(qc4.decode(qc4.encode(jnp.asarray(x))))
    assert np.abs(d4 - x).mean() < 0.08 * span


def test_kmeans_clusters():
    rng = np.random.default_rng(0)
    x = np.concatenate(
        [rng.normal(c, 0.2, size=(50, 3)).astype(np.float32) for c in (-2, 0, 2)]
    )
    cents, assign = kmeans(x, 3, seed=1)
    assert len(np.unique(np.asarray(assign))) == 3
    c = np.sort(np.asarray(cents).mean(axis=1))
    np.testing.assert_allclose(c, [-2, 0, 2], atol=0.3)


def test_product_quantizer_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(300, 20)).astype(np.float32)
    pq = ProductQuantizer(n_parts=5, n_clusters=16, seed=0)
    codes = pq.train(x)
    assert codes.shape == (300, 5) and codes.dtype == np.uint8
    decoded = pq.decode(codes)
    # PQ reconstruction beats zero baseline by a wide margin
    assert np.mean((decoded - x) ** 2) < 0.5 * np.mean(x**2)
    codes2 = pq.encode(x)
    np.testing.assert_array_equal(codes, codes2)


def test_lowbit_roundtrip():
    x = np.array([0.5, -0.3, 0.8, -0.9], np.float32)
    codes, scale = lowbit_quantize(jnp.asarray(x), 1)
    d = np.asarray(lowbit_dequantize(codes, scale, 1))
    assert np.all(np.sign(d) == np.sign(x))
    codes2, scales2 = lowbit_quantize(jnp.asarray(x), 2)
    d2 = np.asarray(lowbit_dequantize(codes2, scales2, 2))
    assert np.all(np.sign(d2) == np.sign(x))
    assert np.abs(d2 - x).mean() <= np.abs(d - x).mean() + 1e-6


def test_stats_cdf_pair():
    p = np.asarray(stats.normal_cdf(jnp.asarray([0.0, 1.96, -1.96])))
    np.testing.assert_allclose(p, [0.5, 0.975, 0.025], atol=1e-3)
    x = np.asarray(stats.normal_inverse_cdf(jnp.asarray([0.5, 0.975])))
    np.testing.assert_allclose(x, [0.0, 1.96], atol=1e-2)
    n = stats.sub_sample_size(10000, 0.95, 0.05)
    assert 350 < n < 400  # classic ~370 for N=10k
