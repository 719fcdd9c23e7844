"""Dataset preparation utilities — parity with the reference's data
scripts (data/proc_file_split.py: random row sharding into per-worker
`_<rank>` files; data/proc_text_topic.py: text -> bag-of-words matrix for
the topic model).
"""

from __future__ import annotations

import collections
import re

import numpy as np


def split_for_workers(
    path: str, n_workers: int, out_prefix: str | None = None, seed: int = 0
) -> list[str]:
    """Randomly shard a row-per-line file into `<prefix>_<rank>.csv` files
    (the reference's per-worker `ad_data_<rank>.csv` layout,
    distributed_algo_abst.h:97-100)."""
    with open(path) as f:
        lines = f.readlines()
    rng = np.random.default_rng(seed)
    assign = rng.integers(0, n_workers, len(lines))
    prefix = out_prefix or path.rsplit(".", 1)[0]
    paths = []
    for rank in range(n_workers):
        p = f"{prefix}_{rank}.csv"
        with open(p, "w") as f:
            for line, a in zip(lines, assign):
                if a == rank:
                    f.write(line)
        paths.append(p)
    return paths


_TOKEN_RE = re.compile(r"[A-Za-z']+")


def text_to_bow(
    docs: list[str],
    vocab: list[str] | None = None,
    max_vocab: int = 5000,
    lowercase: bool = True,
):
    """Documents -> (counts [D, W] float32, vocab list). With no vocab
    given, builds one from corpus frequency (proc_text_topic.py flow)."""
    tokenized = []
    for doc in docs:
        toks = _TOKEN_RE.findall(doc)
        if lowercase:
            toks = [t.lower() for t in toks]
        tokenized.append(toks)
    if vocab is None:
        freq = collections.Counter(t for toks in tokenized for t in toks)
        vocab = [w for w, _ in freq.most_common(max_vocab)]
    index = {w: i for i, w in enumerate(vocab)}
    counts = np.zeros((len(docs), len(vocab)), np.float32)
    for d, toks in enumerate(tokenized):
        for t in toks:
            i = index.get(t)
            if i is not None:
                counts[d, i] += 1.0
    return counts, vocab


def tokens_from_text(path_or_text: str, vocab: list[str], is_path: bool = True):
    """Text stream -> token-id array for the CBOW trainer, using a fixed
    vocab (reference Train_Embed_Algo corpus loading)."""
    text = open(path_or_text).read() if is_path else path_or_text
    index = {w: i for i, w in enumerate(vocab)}
    toks = _TOKEN_RE.findall(text.lower())
    return np.asarray([index[t] for t in toks if t in index], np.int64)


def token_chunks_from_text(path: str, vocab: list[str],
                           chunk_tokens: int = 1 << 20):
    """Stream a corpus file as token-id chunks of ~chunk_tokens each,
    WITHOUT loading the file into memory (the reference streams its corpus
    per thread-range the same way, train_embed_algo.h loadDataRow). Context
    windows do not span chunk boundaries — the same approximation the
    reference makes at thread-range boundaries."""
    index = {w: i for i, w in enumerate(vocab)}
    buf: list[int] = []
    with open(path) as f:
        for line in f:
            for t in _TOKEN_RE.findall(line.lower()):
                i = index.get(t)
                if i is not None:
                    buf.append(i)
            if len(buf) >= chunk_tokens:
                yield np.asarray(buf[:chunk_tokens], np.int64)
                buf = buf[chunk_tokens:]
    if buf:
        yield np.asarray(buf, np.int64)


def frequency_remap(ids, mask=None, n_features: int | None = None):
    """Bijective old->new feature-id table ordering ids by DESCENDING
    observed frequency: the hottest id becomes 0, ties and never-seen
    ids keep their original relative order after the seen ones.

    Real CTR feature ids are hashes with no frequency structure, but the
    streaming engine's skew economics (PARITY.md: the vocab-master
    pull/push cost scales with *touched rows*, auto-capacity octaves
    pick the rank space from observed unique counts) reward a layout
    where hot rows cluster at the bottom of the table. Build the remap
    from a traffic sample, apply it with `remap[ids]` at ingest (and to
    dump/export paths via its inverse `np.argsort(remap)`).

    ids: int array of any shape; mask: optional same-shape validity
    mask; n_features: table size (default max seen id + 1).
    Returns remap [n_features] int64 with remap[old_id] = new_id.
    """
    flat = np.asarray(ids).reshape(-1)
    if mask is not None:
        flat = flat[np.asarray(mask).reshape(-1) > 0]
    if n_features is None:
        n_features = int(flat.max()) + 1 if flat.size else 0
    counts = np.bincount(flat, minlength=n_features)
    order = np.argsort(-counts, kind="stable")
    remap = np.empty(n_features, np.int64)
    remap[order] = np.arange(n_features, dtype=np.int64)
    return remap
