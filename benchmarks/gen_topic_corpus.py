"""Synthesize the topic/embedding head-to-head corpus (r3).

The reference ships TEST_TM / TEST_EMB without their data files. This
generates a corpus CONSISTENT with the bundled vocab.txt: 800 documents
x 120 tokens drawn from 8 latent Dirichlet topics (so PLSA has real
structure to recover), written in BOTH formats the reference consumes:

  train_topic.csv — dense doc x 5000-word count rows (what
    proc_text_topic.py would emit; em_algo_abst.h's sscanf loader)
  train_text.txt  — one document per line, each preceded by a literal
    `<TEXT>` marker line (train_embed_algo.cpp:74-85 dispatches a doc
    per marker and NextWord stops at the newline; without the markers
    the binary silently trains "All 0 docs")

    python benchmarks/gen_topic_corpus.py OUTDIR   # writes both files
                                                    # + topic_docs.npy
"""

import sys

import numpy as np


def generate(outdir: str, vocab_path="/root/reference/data/vocab.txt",
             n_topics=8, n_docs=800, doc_len=120, seed=42):
    rng = np.random.default_rng(seed)
    vocab = []
    for line in open(vocab_path):
        parts = line.split()
        if len(parts) >= 2:
            vocab.append(parts[1])
    V = len(vocab)

    topic_word = np.zeros((n_topics, V))
    for k in range(n_topics):
        sl = slice((k * 600) % (V - 700), (k * 600) % (V - 700) + 700)
        w = np.zeros(V)
        w[sl] = rng.dirichlet(np.full(700, 0.1))
        topic_word[k] = 0.95 * w + 0.05 / V

    docs, lines = [], []
    for _ in range(n_docs):
        theta = rng.dirichlet(np.full(n_topics, 0.2))
        words = [rng.choice(V, p=topic_word[rng.choice(n_topics, p=theta)])
                 for _ in range(doc_len)]
        docs.append(np.bincount(words, minlength=V))
        lines.append(" ".join(vocab[w] for w in words))

    np.save(f"{outdir}/topic_docs.npy", np.asarray(docs, np.float32))
    with open(f"{outdir}/train_topic.csv", "w") as f:
        f.write("\n".join(" ".join(str(int(c)) for c in row)
                          for row in docs) + "\n")
    with open(f"{outdir}/train_text.txt", "w") as f:
        for l in lines:
            f.write("<TEXT>\n" + l + "\n")
    return len(docs)


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp"
    print("docs:", generate(out))
