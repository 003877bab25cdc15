"""Validate the JAX statistics kernels against the NumPy oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

import oracle
from pydca_tpu import stats


def random_msa(n=40, l=11, q=5, seed=0):
    rng = np.random.default_rng(seed)
    # biased sampling so duplicates & near-duplicates occur
    base = rng.integers(0, q, size=(5, l))
    msa = base[rng.integers(0, 5, size=n)]
    mut = rng.random((n, l)) < 0.2
    msa = np.where(mut, rng.integers(0, q, size=(n, l)), msa)
    return msa.astype(np.int32)


@pytest.mark.parametrize("q,seqid", [(5, 0.8), (21, 0.7), (5, 0.999)])
def test_sequence_weights(q, seqid):
    msa = random_msa(q=q, seed=q)
    w = np.asarray(stats.sequence_weights(jnp.asarray(msa), seqid, q, block=16))
    w_ref = oracle.seq_weights(msa, seqid)
    np.testing.assert_allclose(w, w_ref, rtol=1e-6)


def test_single_site_freqs():
    q = 5
    msa = random_msa(q=q)
    w = oracle.seq_weights(msa, 0.8)
    fi = np.asarray(stats.single_site_freqs(jnp.asarray(msa), jnp.asarray(w), q))
    fi_ref = oracle.single_site_freqs(msa, w, q)
    np.testing.assert_allclose(fi, fi_ref, rtol=1e-10, atol=1e-12)
    assert fi.shape == (msa.shape[1], q)
    np.testing.assert_allclose(fi.sum(axis=1), 1.0, rtol=1e-10)


def test_gram_diag_equals_fi():
    q = 5
    msa = random_msa(q=q)
    w = jnp.asarray(oracle.seq_weights(msa, 0.8))
    g = stats.weighted_gram(jnp.asarray(msa), w, q)
    l = msa.shape[1]
    fi_from_gram = np.asarray(jnp.diagonal(g)).reshape(l, q)
    fi = np.asarray(stats.single_site_freqs(jnp.asarray(msa), w, q))
    np.testing.assert_allclose(fi_from_gram, fi, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("include_gap", [False, True])
def test_pair_site_freqs(include_gap):
    q = 5
    msa = random_msa(q=q)
    w = oracle.seq_weights(msa, 0.8)
    fij = np.asarray(
        stats.pair_site_freqs(
            jnp.asarray(msa), jnp.asarray(w), q, include_gap=include_gap
        )
    )
    fij_ref = oracle.pair_site_freqs(msa, w, q, include_gap=include_gap)
    np.testing.assert_allclose(fij, fij_ref, rtol=1e-9, atol=1e-12)


def test_corr_mat():
    q, theta = 5, 0.5
    msa = random_msa(q=q)
    l = msa.shape[1]
    w = oracle.seq_weights(msa, 0.8)
    fi_r = oracle.reg_fi(oracle.single_site_freqs(msa, w, q), q, theta)
    fij_r = oracle.reg_fij(oracle.pair_site_freqs(msa, w, q), q, theta)
    c_ref = oracle.corr_mat(fi_r, fij_r, l, q)

    g = stats.weighted_gram(jnp.asarray(msa), jnp.asarray(w), q)
    c = np.asarray(
        stats.corr_mat_from_gram(g, jnp.asarray(fi_r), theta, l, q)
    )
    np.testing.assert_allclose(c, c_ref, rtol=1e-9, atol=1e-12)
    # symmetric positive definite
    np.testing.assert_allclose(c, c.T, atol=1e-12)
    assert np.linalg.eigvalsh(c_ref).min() > 0


def test_pair_index_matrix():
    l = 7
    m = stats.pair_index_matrix(l)
    c = 0
    for i in range(l - 1):
        for j in range(i + 1, l):
            assert m[i, j] == c == m[j, i]
            assert stats.pair_index(i, j, l) == c
            c += 1


def test_weights_million_sequences_memory():
    """Compile (not run) the blocked weights scan at N=10^6, L=1000, q=21:
    peak temp memory must be far below the ~21 GB one-hot that the old
    implementation materialized (VERDICT r3 item 6).  The per-tile one-hot
    design bounds live buffers at O(block * L * q)."""
    import jax

    n, l, q = 1_000_000, 1000, 21
    spec = jax.ShapeDtypeStruct((n, l), jnp.int32)
    compiled = (
        jax.jit(
            lambda m: stats._sequence_weights_impl(
                m, jnp.float32(0.8 * l), q, 2048
            )
        )
        .lower(spec)
        .compile()
    )
    mem = compiled.memory_analysis()
    onehot_bytes = n * l * q  # int8
    assert mem.temp_size_in_bytes < 0.25 * onehot_bytes, (
        f"temp {mem.temp_size_in_bytes/2**30:.2f} GiB suggests a "
        f"materialized one-hot ({onehot_bytes/2**30:.2f} GiB)"
    )
