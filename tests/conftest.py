"""Test configuration: force CPU backend with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware (the same
loopback-cluster trick the reference uses for multi-node testing, see
SURVEY.md §4)."""

import os

# Force CPU regardless of ambient platform. The session may pre-import jax
# with a TPU platform selected (via sitecustomize), so setting env vars here
# is too late — use config.update, which works as long as no backend has
# been initialised yet. Tests must be hermetic, fast, and fp32-exact.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


REFERENCE_DATA = "/root/reference/data"


@pytest.fixture(scope="session")
def train_sparse_path():
    return os.path.join(REFERENCE_DATA, "train_sparse.csv")


@pytest.fixture(scope="session")
def test_sparse_path():
    return os.path.join(REFERENCE_DATA, "test_sparse.csv")


@pytest.fixture(scope="session")
def sparse_small():
    """Small synthetic libffm dataset with a learnable rule."""
    from lightctr_tpu.data.libffm import SparseDataset

    rng = np.random.default_rng(0)
    n, length, n_feat, n_fields = 512, 16, 100, 8
    ids = rng.integers(0, n_feat, size=(n, length)).astype(np.int32)
    vals = np.ones((n, length), np.float32)
    fields = (ids % n_fields).astype(np.int32)
    mask = np.ones((n, length), np.float32)
    # label depends on presence of low feature ids -> learnable by LR/FM
    score = (ids < 20).sum(axis=1) - 3
    labels = (score > 0).astype(np.float32)
    return SparseDataset(
        ids=ids,
        vals=vals,
        fields=fields,
        mask=mask,
        labels=labels,
        nnz=np.full((n,), length, np.int32),
        n_features=n_feat,
        n_fields=n_fields,
    )
