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
