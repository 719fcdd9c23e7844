import numpy as np

from lightctr_tpu.data.prep import split_for_workers, text_to_bow, tokens_from_text
from lightctr_tpu.utils.system import device_memory_stats, get_env, host_memory_usage


def test_split_for_workers(tmp_path):
    src = tmp_path / "data.csv"
    lines = [f"{i} 0:{i}:1\n" for i in range(100)]
    src.write_text("".join(lines))
    paths = split_for_workers(str(src), 4, seed=0)
    assert len(paths) == 4
    total = sum(len(open(p).readlines()) for p in paths)
    assert total == 100
    # shards are disjoint
    seen = set()
    for p in paths:
        for line in open(p):
            assert line not in seen
            seen.add(line)


def test_text_to_bow():
    docs = ["the cat sat on the mat", "dogs and cats", "the dog barked"]
    counts, vocab = text_to_bow(docs, max_vocab=10)
    assert counts.shape == (3, len(vocab))
    the_idx = vocab.index("the")
    assert counts[0, the_idx] == 2.0
    # fixed vocab path
    counts2, _ = text_to_bow(docs, vocab=["cat", "dog"])
    assert counts2.shape == (3, 2)
    assert counts2[0, 0] == 1.0 and counts2[2, 1] == 1.0


def test_tokens_from_text():
    toks = tokens_from_text("the cat the dog", ["the", "cat"], is_path=False)
    np.testing.assert_array_equal(toks, [0, 1, 0])


def test_env_and_memory():
    import os

    os.environ["LIGHTCTR_TEST_ENV"] = "42"
    assert get_env("LIGHTCTR_TEST_ENV", cast=int) == 42
    assert get_env("LIGHTCTR_MISSING", default=7, cast=int) == 7
    mem = host_memory_usage()
    assert mem.get("MemTotal", 0) > 0
    stats = device_memory_stats()
    assert len(stats) >= 1


def test_frequency_remap():
    """Hot ids become the smallest new ids (bijectively), so zipf-skewed
    traffic touches a contiguous hot prefix — the layout the streaming
    engine's skew wins assume (PARITY.md zipf rows, auto-capacity
    octaves)."""
    from lightctr_tpu.data.prep import frequency_remap

    rng = np.random.default_rng(0)
    V = 5000
    # zipf-ish sample over hashed (shuffled) id space
    ranks = np.minimum(rng.zipf(1.3, size=(64, 32)) - 1, V - 1)
    perm = rng.permutation(V)          # hash-like scatter of the ids
    ids = perm[ranks]
    mask = (rng.random(ids.shape) > 0.1).astype(np.float32)

    remap = frequency_remap(ids, mask=mask, n_features=V)
    assert sorted(remap.tolist()) == list(range(V))  # bijection
    new_ids = remap[ids]

    flat = ids.reshape(-1)[mask.reshape(-1) > 0]
    nflat = new_ids.reshape(-1)[mask.reshape(-1) > 0]
    counts = np.bincount(nflat, minlength=V)
    # frequencies non-increasing in the new id order
    assert (np.diff(counts) <= 0).all() or (
        np.sort(counts)[::-1] == counts).all()
    # the touched set concentrates: max touched new id == n_unique - 1
    assert nflat.max() == len(np.unique(flat)) - 1
    # masked-out positions did not contribute counts
    remap_nomask = frequency_remap(ids, n_features=V)
    assert not np.array_equal(remap, remap_nomask) or mask.all()
