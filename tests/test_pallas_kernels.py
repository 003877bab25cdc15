"""Pallas kernels vs plain-XLA results (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pydca_tpu.ops import pallas_kernels as pk


def test_identity_counts_interpret():
    rng = np.random.default_rng(0)
    n, l, q = 70, 11, 5
    msa = rng.integers(0, q, size=(n, l))
    onehot = np.eye(q, dtype=np.int8)[msa].reshape(n, l * q)
    thr = 0.8 * l
    counts = pk.identity_counts(
        jnp.asarray(onehot), thr, block=32, interpret=True
    )
    iid = (msa[:, None, :] == msa[None, :, :]).sum(axis=2)
    expected = (iid > thr).sum(axis=1)
    np.testing.assert_array_equal(np.asarray(counts), expected)


def test_weighted_gram_interpret():
    rng = np.random.default_rng(1)
    n, l, q = 50, 7, 5
    msa = rng.integers(0, q, size=(n, l))
    w = rng.random(n).astype(np.float32)
    onehot = np.eye(q, dtype=np.float32)[msa].reshape(n, l * q)
    gram = pk.weighted_gram(
        jnp.asarray(onehot), jnp.asarray(w), block_n=16, block_k=128,
        interpret=True,
    )
    expected = onehot.T @ (onehot * w[:, None])
    np.testing.assert_allclose(np.asarray(gram), expected, rtol=1e-6, atol=1e-6)
