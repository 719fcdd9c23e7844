import numpy as np

from lightctr_tpu.data import load_libffm, sparse_batches
from lightctr_tpu.data.libffm import to_csr


def test_load_libffm_reference_train(train_sparse_path):
    ds = load_libffm(train_sparse_path)
    assert len(ds) == 1000
    # Reference data: 68 fields, feature ids up to ~225k (SURVEY.md §2.7)
    assert ds.n_fields == 68
    assert 200_000 < ds.n_features < 300_000
    assert ds.ids.shape == ds.vals.shape == ds.fields.shape == ds.mask.shape
    assert ds.ids.shape[1] % 128 == 0
    # mask matches nnz
    np.testing.assert_array_equal(ds.mask.sum(axis=1).astype(np.int32), ds.nnz)
    # labels are binary
    assert set(np.unique(ds.labels)) <= {0.0, 1.0}
    # padded slots carry zeros
    row = 0
    n = ds.nnz[row]
    assert np.all(ds.vals[row, n:] == 0.0)
    assert np.all(ds.mask[row, n:] == 0.0)


def test_first_row_parse_exact(train_sparse_path):
    ds = load_libffm(train_sparse_path)
    # First row of the file starts: "0 0:0:1 0:2:1 0:3:1 ..."
    assert ds.labels[0] == 0.0
    assert ds.fields[0, 0] == 0 and ds.ids[0, 0] == 0 and ds.vals[0, 0] == 1.0
    assert ds.ids[0, 1] == 2 and ds.ids[0, 2] == 3


def test_batching_static_shapes(sparse_small):
    batches = list(sparse_batches(sparse_small, batch_size=100))
    assert len(batches) == 6  # 512 rows -> 5 full + 1 padded
    for b in batches:
        assert b["ids"].shape == (100, sparse_small.max_len)
        assert b["labels"].shape == (100,)
    # last batch padding rows are masked out
    last = batches[-1]
    assert last["row_mask"].sum() == 12
    assert np.all(last["mask"][12:] == 0.0)


def test_csr_roundtrip(sparse_small):
    indptr, ids, vals, fields = to_csr(sparse_small)
    assert indptr[-1] == sparse_small.nnz.sum()
    row3 = ids[indptr[3] : indptr[4]]
    np.testing.assert_array_equal(row3, sparse_small.ids[3, : sparse_small.nnz[3]])
