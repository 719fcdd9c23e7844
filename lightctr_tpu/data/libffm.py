"""libffm-format sparse CTR data loader.

Parses the ``label field:fid:val ...`` row format used by the reference's
sparse datasets (semantics of LightCTR ``fm_algo_abst.h:70-107``: discover
max feature id / max field id while streaming rows; no dedup).

TPU-first design: rows are ragged, but TPU wants static shapes — so the
dataset is materialised as *padded dense blocks* ``(ids, vals, fields, mask)``
with the pad length rounded up to a bucket multiple, plus a CSR view for
host-side algorithms (GBM). Padding uses id 0 with mask 0; models must apply
the mask, never rely on a sentinel id.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class SparseDataset:
    """A padded sparse dataset.

    Attributes:
      ids:    int32 [N, L]  feature ids (0 where padded)
      vals:   float32 [N, L] feature values (0 where padded)
      fields: int32 [N, L]  field ids (0 where padded)
      mask:   float32 [N, L] 1.0 for real features, 0.0 for padding
      labels: float32 [N]   binary labels
      nnz:    int32 [N]     true per-row feature counts
      n_features: int       max feature id + 1 (vocabulary size)
      n_fields:   int       max field id + 1
    """

    ids: np.ndarray
    vals: np.ndarray
    fields: np.ndarray
    mask: np.ndarray
    labels: np.ndarray
    nnz: np.ndarray
    n_features: int
    n_fields: int

    def __len__(self) -> int:
        return int(self.ids.shape[0])

    @property
    def max_len(self) -> int:
        return int(self.ids.shape[1])

    def take(self, idx: np.ndarray) -> "SparseDataset":
        return SparseDataset(
            ids=self.ids[idx],
            vals=self.vals[idx],
            fields=self.fields[idx],
            mask=self.mask[idx],
            labels=self.labels[idx],
            nnz=self.nnz[idx],
            n_features=self.n_features,
            n_fields=self.n_fields,
        )


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def load_libffm(
    path: str,
    pad_multiple: int = 128,
    n_features: int | None = None,
    n_fields: int | None = None,
    max_rows: int | None = None,
    oov: str = "mod",
) -> SparseDataset:
    """Parse a libffm file into a padded SparseDataset.

    ``n_features`` / ``n_fields`` may be supplied to force a vocabulary size
    (e.g. so train and test agree); otherwise discovered from the data like
    the reference loader does (``fm_algo_abst.h:88-100``). When a forced
    vocabulary is smaller than ids present (real OOV — the bundled test set
    contains ids beyond the train set's), ``oov`` selects the policy:
    'mod' hashes them into range (id % n_features), 'drop' masks them out.
    """
    labels: list[float] = []
    row_ids: list[np.ndarray] = []
    row_vals: list[np.ndarray] = []
    row_fields: list[np.ndarray] = []
    max_fid = 0
    max_field = 0
    max_nnz = 0

    with open(path, "r") as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            labels.append(float(parts[0]))
            n = len(parts) - 1
            fids = np.empty(n, dtype=np.int64)
            flds = np.empty(n, dtype=np.int64)
            vals = np.empty(n, dtype=np.float32)
            for j, tok in enumerate(parts[1:]):
                a, b, c = tok.split(":")
                flds[j] = int(a)
                fids[j] = int(b)
                vals[j] = float(c)
            if n:
                max_fid = max(max_fid, int(fids.max()))
                max_field = max(max_field, int(flds.max()))
            max_nnz = max(max_nnz, n)
            row_ids.append(fids)
            row_fields.append(flds)
            row_vals.append(vals)
            if max_rows is not None and len(labels) >= max_rows:
                break

    n_rows = len(labels)
    pad_len = max(_round_up(max(max_nnz, 1), pad_multiple), pad_multiple)

    ids = np.zeros((n_rows, pad_len), dtype=np.int32)
    vals = np.zeros((n_rows, pad_len), dtype=np.float32)
    fields = np.zeros((n_rows, pad_len), dtype=np.int32)
    mask = np.zeros((n_rows, pad_len), dtype=np.float32)
    nnz = np.zeros((n_rows,), dtype=np.int32)

    for i in range(n_rows):
        n = len(row_ids[i])
        ids[i, :n] = row_ids[i]
        vals[i, :n] = row_vals[i]
        fields[i, :n] = row_fields[i]
        mask[i, :n] = 1.0
        nnz[i] = n

    if n_features is not None and max_fid >= n_features:
        over = ids >= n_features
        if oov == "drop":
            mask[over] = 0.0
            vals[over] = 0.0
            ids[over] = 0
        else:  # 'mod': hash into range
            ids = np.where(over, ids % n_features, ids)
    if n_fields is not None and max_field >= n_fields:
        fields = np.where(fields >= n_fields, fields % n_fields, fields)

    return SparseDataset(
        ids=ids,
        vals=vals,
        fields=fields,
        mask=mask,
        labels=np.asarray(labels, dtype=np.float32),
        nnz=nnz,
        n_features=int(n_features if n_features is not None else max_fid + 1),
        n_fields=int(n_fields if n_fields is not None else max_field + 1),
    )


def to_csr(ds: SparseDataset):
    """CSR view (indptr, ids, vals, fields) for host-side algorithms (GBM)."""
    indptr = np.zeros(len(ds) + 1, dtype=np.int64)
    np.cumsum(ds.nnz, out=indptr[1:])
    total = int(indptr[-1])
    ids = np.empty(total, dtype=np.int32)
    vals = np.empty(total, dtype=np.float32)
    fields = np.empty(total, dtype=np.int32)
    for i in range(len(ds)):
        s, e = indptr[i], indptr[i + 1]
        n = e - s
        ids[s:e] = ds.ids[i, :n]
        vals[s:e] = ds.vals[i, :n]
        fields[s:e] = ds.fields[i, :n]
    return indptr, ids, vals, fields
