"""Family-batched pipeline must reproduce the per-family single pipelines."""

import numpy as np
import jax.numpy as jnp
import pytest

from pydca_tpu import stats
from pydca_tpu.alphabets import RNA
from pydca_tpu.family import (
    FamilyBatch,
    family_meanfield_scores,
    family_plm_fit,
    family_plm_scores,
    family_sequence_weights,
)
from pydca_tpu.io.fasta import MSA
from pydca_tpu.meanfield import MeanFieldDCA
from pydca_tpu.plm import PlmDCA


def _toy_msa(n, l, seed):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 5, size=(3, l))
    msa = base[rng.integers(0, 3, size=n)]
    mut = rng.random((n, l)) < 0.3
    data = np.where(mut, rng.integers(0, 5, size=(n, l)), msa).astype(np.int8)
    return MSA(data=data, alphabet=RNA)


@pytest.fixture(scope="module")
def batch():
    return FamilyBatch([_toy_msa(40, 8, 0), _toy_msa(25, 11, 1), _toy_msa(55, 6, 2)])


def test_family_weights_match_single(batch):
    wb = np.asarray(family_sequence_weights(batch, 0.8))
    for f, msa in enumerate(batch.msas):
        w1 = np.asarray(
            stats.sequence_weights(jnp.asarray(msa.data, jnp.int32), 0.8, msa.q)
        )
        np.testing.assert_allclose(wb[f, : msa.num_seqs], w1, rtol=1e-6)
        assert np.all(wb[f, msa.num_seqs :] == 0.0)


def test_family_plm_matches_single(batch):
    thetas, states = family_plm_fit(batch, max_iterations=30)
    scores_b = family_plm_scores(batch, thetas, apc=True)
    for f, msa in enumerate(batch.msas):
        inst = PlmDCA(msa, "rna", max_iterations=30)
        scores_1 = inst.compute_sorted_FN_APC()
        d1 = dict((p, s) for p, s in scores_1)
        db = dict((p, s) for p, s in scores_b[f])
        assert set(d1) == set(db)
        a = np.array([d1[k] for k in sorted(d1)])
        b = np.array([db[k] for k in sorted(d1)])
        # same optimization on padded shapes: scores agree to float tolerance
        np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-3)
        # top pair identical
        assert scores_1[0][0] == scores_b[f][0][0]


def test_family_padded_params_are_zero(batch):
    thetas, _ = family_plm_fit(batch, max_iterations=5)
    l, q = batch.lmax, batch.q
    t = np.asarray(thetas)
    for f, msa in enumerate(batch.msas):
        h = t[f, : l * q].reshape(l, q)
        assert np.all(h[msa.seqs_len :] == 0.0), "pad-site fields must stay 0"


def test_family_meanfield_matches_single(batch):
    scores_b = family_meanfield_scores(batch, pseudocount=0.5, apc=True)
    for f, msa in enumerate(batch.msas):
        inst = MeanFieldDCA(msa, "rna", pseudocount=0.5)
        scores_1 = inst.compute_sorted_FN_APC()
        d1 = dict((p, s) for p, s in scores_1)
        db = dict((p, s) for p, s in scores_b[f])
        assert set(d1) == set(db)
        a = np.array([d1[k] for k in sorted(d1)])
        b = np.array([db[k] for k in sorted(d1)])
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5)
