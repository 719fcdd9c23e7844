"""Dense CSV loader (MNIST-like rows: ``label,p0,p1,...``).

Semantics of the reference dense loader (``dl_algo_abst.h:179-252``) minus
its 500-row cap — callers pass ``max_rows`` explicitly if they want one.
"""

from __future__ import annotations

import numpy as np


def load_dense_csv(
    path: str,
    max_rows: int | None = None,
    scale: float = 1.0 / 255.0,
    n_classes: int | None = None,
):
    """Returns (x [N, D] float32, y [N] int32, n_classes)."""
    labels: list[int] = []
    rows: list[np.ndarray] = []
    with open(path, "r") as f:
        for line in f:
            line = line.strip().rstrip(",")
            if not line:
                continue
            parts = line.split(",")
            labels.append(int(float(parts[0])))
            rows.append(np.asarray(parts[1:], dtype=np.float32))
            if max_rows is not None and len(rows) >= max_rows:
                break
    x = np.stack(rows) * scale
    y = np.asarray(labels, dtype=np.int32)
    k = int(n_classes if n_classes is not None else y.max() + 1)
    return x, y, k


def load_cluster_data(path: str, dim: int):
    """Whitespace-separated float stream reshaped to [N, dim] (GMM data,
    semantics of ``em_algo_abst.h`` loader over data/train_cluster.csv)."""
    with open(path, "r") as f:
        flat = np.asarray(f.read().split(), dtype=np.float32)
    n = (flat.size // dim) * dim
    return flat[:n].reshape(-1, dim)
