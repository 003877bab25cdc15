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
    thr = 0.8 * l
    counts = pk.identity_counts(
        jnp.asarray(msa), thr, q, block=32, interpret=True
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


def test_identity_counts_masked_interpret():
    """Masked counts == brute force with invalid rows excluded as neighbors."""
    import numpy as np
    import jax.numpy as jnp
    from pydca_tpu.ops.pallas_kernels import identity_counts

    rng = np.random.default_rng(11)
    n, l, q = 50, 13, 5
    msa = rng.integers(0, q, (n, l))
    valid = rng.random(n) > 0.3
    thr = 0.5 * l
    got = identity_counts(
        jnp.asarray(msa), thr, q, valid=jnp.asarray(valid), block=32,
        interpret=True,
    )
    ident = (msa[:, None, :] == msa[None, :, :]).sum(-1)
    want = ((ident > thr) & valid[None, :]).sum(1)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_sequence_weights_pallas_masked_dispatch(monkeypatch):
    """Above the crossover the valid path routes through the Pallas kernel
    and matches the XLA masked scan (ADVICE r2)."""
    import numpy as np
    import jax.numpy as jnp
    from pydca_tpu import stats

    rng = np.random.default_rng(12)
    n, l, q = 64, 9, 5
    msa = jnp.asarray(rng.integers(0, q, (n, l)), jnp.int32)
    valid = jnp.asarray(rng.random(n) > 0.25)

    w_xla = stats.sequence_weights(msa, 0.8, q, valid=valid)

    calls = {}

    def fake_pallas(msa_, thr, q_, valid_=None):
        calls["used"] = True
        from pydca_tpu.ops.pallas_kernels import identity_counts

        return identity_counts(msa_, float(thr), q_, valid=valid_, interpret=True)

    monkeypatch.setattr(stats, "_pallas_counts", fake_pallas)
    monkeypatch.setattr(stats, "_on_tpu", lambda: True)
    monkeypatch.setattr(stats, "PALLAS_MIN_N", 1)  # force the Pallas branch
    w_pl = stats.sequence_weights(msa, 0.8, q, valid=valid)

    assert calls.get("used") is True
    np.testing.assert_allclose(np.asarray(w_pl), np.asarray(w_xla))
