"""PLSA + word-embedding head-to-head on a SYNTHESIZED corpus (r3).

The reference ships its TEST_TM / TEST_EMB demos without data
(train_topic.csv / train_text.txt absent). Round 3 closes the loop by
SYNTHESIZING a corpus consistent with the bundled vocab.txt (800 docs x
120 tokens drawn from 8 latent Dirichlet topics — /tmp/topic_docs.npy +
train_text.txt generator recorded in git history) and running BOTH
sides on it.

Reference measurements (this host, /tmp/refprobe builds, 4 threads):
  TEST_TM  (200 epochs, 24 topics, 5000 words):
    seed 7: 54.0 s wall, total log-likelihood -931857 -> -575811
    seed 1: 33.4 s wall,                      ...    -> -578935
  TEST_EMB (full composite: CBOW 50 epochs window 6 dim 100 w/
    hsoftmax+negsampling, then PQ quantization, then GMM-50 clustering
    — main.cpp:234-249): 89.4 s wall; CBOW mean loss1/doc
    1322 -> 1111 over 50 epochs. Format gotcha documented: documents
    are ONE LINE each, preceded by a literal `<TEXT>` line
    (NextWord returns -1 at newline, train_embed_algo.cpp:74-85) — the
    first attempt trained "All 0 docs" silently.

Ours (this file, v5e): plsa.fit_scan (one compiled while_loop) at the
same config; the same composite pipeline with CBOW negative sampling
(embedding.train_cbow), PQ (utils/compress.py), GMM-50 (gmm.fit_scan).

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_topic_embed_headtohead.py
"""

import json
import time

import numpy as np

REF = {
    "plsa_wall_s": [54.0, 33.4],
    "plsa_final_total_ll": [-575811, -578935],
    "plsa_epochs": 200,
    "emb_composite_wall_s": 89.4,
}


def main():
    from lightctr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from lightctr_tpu.models import gmm, plsa
    from lightctr_tpu.models import embedding as emb
    from lightctr_tpu.utils.compress import ProductQuantizer

    out = {"reference": REF}
    counts = np.load("/tmp/topic_docs.npy")

    # ---- PLSA at the TEST_TM config
    cfg = plsa.PLSAConfig(n_topics=24, n_words=counts.shape[1], seed=0)
    state, ll, ep = plsa.fit_scan(counts, cfg, epochs=200, tol_total=1e-3)
    t0 = time.perf_counter()
    state, ll, ep = plsa.fit_scan(counts, cfg, epochs=200, tol_total=1e-3)
    out["plsa"] = {
        "wall_s": round(time.perf_counter() - t0, 3),
        "epochs": ep,
        "final_total_ll": round(ll, 1),
        "speedup_vs_ref": round(
            np.mean(REF["plsa_wall_s"]) / (time.perf_counter() - t0), 1),
    }
    print("plsa", out["plsa"], flush=True)

    # ---- EMB composite at the TEST_EMB config
    lines = [l for l in open("/tmp/refprobe/data/train_text.txt")
             if not l.startswith("<TEXT>")]
    vocab = {}
    for line in open("/root/reference/data/vocab.txt"):
        parts = line.split()
        if len(parts) >= 2:
            vocab[parts[1]] = int(parts[0])
    tokens = np.asarray(
        [vocab[w] for l in lines for w in l.split() if w in vocab],
        np.int32)
    word_counts = np.bincount(tokens, minlength=len(vocab))

    t0 = time.perf_counter()
    ecfg = emb.CBOWConfig(vocab_size=len(vocab), dim=100, window=6,
                          mode="negative", seed=0)
    params = emb.train_cbow(tokens, word_counts, ecfg, epochs=50,
                            batch_size=8192, learning_rate=0.05)
    vecs = np.asarray(params["emb"])
    vecs = vecs / np.clip(np.linalg.norm(vecs, axis=1, keepdims=True),
                          1e-12, None)
    pq = ProductQuantizer(n_parts=20, n_clusters=64)
    codes = pq.train(vecs)
    gstate, gll, gep = gmm.fit_scan(
        vecs * 10.0, gmm.GMMConfig(n_clusters=50, dim=100, seed=0),
        epochs=200, tol_total=1e-3)
    wall = time.perf_counter() - t0
    out["emb_composite"] = {
        "wall_s": round(wall, 2),
        "speedup_vs_ref": round(REF["emb_composite_wall_s"] / wall, 1),
        "gmm_epochs": gep,
        "pq_codes_shape": list(np.asarray(codes).shape),
    }
    print("emb", out["emb_composite"], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
