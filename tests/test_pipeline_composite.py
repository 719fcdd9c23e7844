"""The reference's composite TEST_EMB pipeline (main.cpp:234-249):
train word embeddings -> GMM-cluster them -> PQ-quantize -> dump clusters.
"""

import numpy as np
import jax

from lightctr_tpu.models import embedding as emb
from lightctr_tpu.models import gmm
from lightctr_tpu.utils.compress import ProductQuantizer


def test_embed_gmm_pq_pipeline(tmp_path):
    rng = np.random.default_rng(0)
    V, dim = 40, 16
    # corpus with two word communities (co-occurring halves)
    half = V // 2
    tokens = []
    for _ in range(3000):
        if rng.random() < 0.5:
            tokens.extend(rng.integers(0, half, 3))
        else:
            tokens.extend(rng.integers(half, V, 3))
    tokens = np.asarray(tokens)
    counts = np.bincount(tokens, minlength=V)

    # 1. train embeddings (CBOW negative sampling)
    cfg = emb.CBOWConfig(vocab_size=V, dim=dim, window=2, n_negatives=5,
                         subsample_t=1e9, seed=0)
    params = emb.train_cbow(tokens, counts, cfg, epochs=8, batch_size=512,
                            learning_rate=0.5)
    vectors = np.asarray(emb.normalized_embeddings(params))

    # 2. save + reload roundtrip (reference saveModel/loadPretrainFile)
    path = str(tmp_path / "emb.txt")
    words = [f"w{i}" for i in range(V)]
    emb.save_embeddings(path, params, words)
    words2, vectors2 = emb.load_embeddings(path)
    assert words2 == words
    np.testing.assert_allclose(vectors2, vectors, atol=1e-5)

    # 3. GMM-cluster the embeddings (reference scales by 10)
    gcfg = gmm.GMMConfig(n_clusters=2, dim=dim, seed=1)
    state, ll = gmm.fit(vectors * 10.0, gcfg, epochs=100)
    labels = np.asarray(gmm.predict(state, vectors * 10.0))
    first, second = labels[:half], labels[half:]
    # the two communities separate into the two clusters
    assert (first == np.bincount(first).argmax()).mean() > 0.8
    assert (second == np.bincount(second).argmax()).mean() > 0.8
    assert np.bincount(first).argmax() != np.bincount(second).argmax()

    # 4. PQ-quantize the embeddings (reference Quantization(part_cnt, k))
    pq = ProductQuantizer(n_parts=4, n_clusters=8, seed=0)
    codes = pq.train(vectors)
    assert codes.shape == (V, 4)
    decoded = pq.decode(codes)
    # quantized vectors preserve the community structure
    sims = decoded @ vectors.T
    assert np.mean(np.argmax(sims, axis=1) == np.arange(V)) > 0.5
