"""End-to-end mean-field engine vs the NumPy oracle, plus RF00167 smoke."""

import numpy as np
import pytest

import oracle
from pydca_tpu import MeanFieldDCA, read_msa
from pydca_tpu.alphabets import RNA
from pydca_tpu.io.fasta import MSA


def small_msa(n=120, l=14, q=5, seed=3):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, q, size=(4, l))
    msa = base[rng.integers(0, 4, size=n)]
    mut = rng.random((n, l)) < 0.25
    msa = np.where(mut, rng.integers(0, q, size=(n, l)), msa)
    # dedup like the reader would
    _, idx = np.unique(msa, axis=0, return_index=True)
    return msa[np.sort(idx)].astype(np.int8)


@pytest.fixture(scope="module")
def engine_and_oracle():
    import jax.numpy as jnp

    data = small_msa()
    mfdca = MeanFieldDCA(
        MSA(data=data, alphabet=RNA), "rna", pseudocount=0.5, seqid=0.8,
        dtype=jnp.float64,
    )
    l, q, theta = data.shape[1], 5, 0.5
    w = oracle.seq_weights(data, 0.8)
    fi_r = oracle.reg_fi(oracle.single_site_freqs(data, w, q), q, theta)
    fij_r = oracle.reg_fij(oracle.pair_site_freqs(data, w, q), q, theta)
    coup = oracle.couplings(oracle.corr_mat(fi_r, fij_r, l, q))
    return mfdca, dict(w=w, fi_r=fi_r, coup=coup, l=l, q=q)


def test_weights_and_meff(engine_and_oracle):
    mfdca, o = engine_and_oracle
    np.testing.assert_allclose(
        np.asarray(mfdca.get_sequences_weight()), o["w"], rtol=1e-9
    )
    assert mfdca.effective_num_sequences == pytest.approx(o["w"].sum(), rel=1e-9)


def test_couplings(engine_and_oracle):
    mfdca, o = engine_and_oracle
    coup = np.asarray(mfdca.compute_couplings())
    np.testing.assert_allclose(coup, o["coup"], rtol=1e-6, atol=1e-8)


def test_fn_apc_scores(engine_and_oracle):
    mfdca, o = engine_and_oracle
    l, q = o["l"], o["q"]
    fn_ref = oracle.fn_scores(o["coup"], l, q)
    apc_ref = oracle.apc(fn_ref, l)

    fn = {p: s for p, s in mfdca.compute_sorted_FN()}
    fn_apc = {p: s for p, s in mfdca.compute_sorted_FN_APC()}
    iu, ju = np.triu_indices(l, k=1)
    for k, (i, j) in enumerate(zip(iu, ju)):
        assert fn[(i, j)] == pytest.approx(fn_ref[k], rel=1e-6, abs=1e-9)
        assert fn_apc[(i, j)] == pytest.approx(apc_ref[k], rel=1e-6, abs=1e-9)
    # descending order
    vals = [s for _, s in mfdca.compute_sorted_FN_APC()]
    assert vals == sorted(vals, reverse=True)


def test_di_scores(engine_and_oracle):
    mfdca, o = engine_and_oracle
    l, q = o["l"], o["q"]
    blocks = np.stack(
        [
            o["coup"][i * (q - 1) : (i + 1) * (q - 1), j * (q - 1) : (j + 1) * (q - 1)]
            for i, j in zip(*np.triu_indices(l, k=1))
        ]
    )
    di_ref = oracle.two_site_fields_and_di(blocks, o["fi_r"], l, q)
    di = {p: s for p, s in mfdca.compute_sorted_DI()}
    iu, ju = np.triu_indices(l, k=1)
    for k, (i, j) in enumerate(zip(iu, ju)):
        assert di[(i, j)] == pytest.approx(di_ref[k], rel=1e-4, abs=1e-8)


def test_fields(engine_and_oracle):
    mfdca, o = engine_and_oracle
    l, q = o["l"], o["q"]
    qm1 = q - 1
    fields = mfdca.compute_fields()
    # oracle: h_i = log(fi/fi_gap) - sum_{j != i} J_ij f_j
    fi_r = o["fi_r"]
    coup = o["coup"]
    for i in range(l):
        acc = np.zeros(qm1)
        for j in range(l):
            if j == i:
                continue
            jij = coup[i * qm1 : (i + 1) * qm1, j * qm1 : (j + 1) * qm1]
            acc += jij @ fi_r[j, :qm1]
        h_ref = np.log(fi_r[i, :qm1] / fi_r[i, -1]) - acc
        np.testing.assert_allclose(fields[i], h_ref, rtol=1e-6, atol=1e-8)


def test_compute_params(engine_and_oracle):
    mfdca, o = engine_and_oracle
    fields, ranked = mfdca.compute_params(linear_dist=2, num_site_pairs=5)
    assert len(fields) == o["l"]
    assert 0 < len(ranked) <= 5
    for (i, j), cij in ranked:
        assert abs(i - j) > 2
        assert cij.shape == ((o["q"] - 1) ** 2,)
        # gauge-shifted: row and column sums vanish
        m = cij.reshape(o["q"] - 1, o["q"] - 1)
        np.testing.assert_allclose(m.sum(axis=0), 0, atol=1e-8)
        np.testing.assert_allclose(m.sum(axis=1), 0, atol=1e-8)


def test_rf00167_smoke(rf00167_path):
    msa = read_msa(rf00167_path, "rna")
    assert msa.seqs_len == 102
    assert msa.q == 5
    # reference python reader dedups: full file has 2704 records
    assert 2000 < msa.num_seqs <= 2704
    mfdca = MeanFieldDCA(msa, "rna")
    scores = mfdca.compute_sorted_FN_APC()
    assert len(scores) == 102 * 101 // 2
    vals = [s for _, s in scores]
    assert vals == sorted(vals, reverse=True)
    assert vals[0] > 0

def test_frobenius_norms_from_matrix_matches_blocks():
    """Matrix-reduction FN == per-pair block FN on a random coupling matrix."""
    import jax.numpy as jnp
    from pydca_tpu import score as score_mod

    rng = np.random.default_rng(11)
    l, qm1 = 9, 4
    m = rng.standard_normal((l * qm1, l * qm1))
    m = (m + m.T) / 2  # couplings are symmetric
    iu, ju = np.triu_indices(l, k=1)
    blocks = m.reshape(l, qm1, l, qm1).transpose(0, 2, 1, 3)[iu, ju]
    ref = np.asarray(score_mod.frobenius_norms(jnp.asarray(blocks)))
    got = np.asarray(
        score_mod.frobenius_norms_from_matrix(jnp.asarray(m), l, qm1)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-7)


def test_couplings_lu_fallback_on_non_spd():
    """A non-SPD corr_mat silently NaNs under jitted Cholesky; the engine
    must detect it and fall back to an LU inverse (ADVICE round 1)."""
    import jax.numpy as jnp
    from pydca_tpu.meanfield import MeanFieldDCA

    c = jnp.asarray(np.diag([1.0, -2.0, 3.0, -4.0]))
    out = np.asarray(MeanFieldDCA._inverse_with_fallback(c))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, -np.diag([1.0, -0.5, 1 / 3, -0.25]), rtol=1e-6)


def test_fused_pipeline_non_spd_takes_lu_fallback(caplog):
    """When the fused program's Cholesky fails (C not numerically SPD), the
    engine must detect the NaN couplings, warn, invalidate the fused FN
    caches, and recompute via the staged LU path."""
    import logging

    import numpy as np
    from pydca_tpu.alphabets import RNA
    from pydca_tpu.io.fasta import MSA
    from pydca_tpu.meanfield import MeanFieldDCA

    # 3 distinct sequences, pseudocount 0: C is rank-deficient -> Cholesky NaN
    data = np.array(
        [[0, 1, 2, 3, 0, 1], [1, 2, 3, 0, 1, 2], [2, 3, 0, 1, 2, 3]],
        dtype=np.int8,
    )
    inst = MeanFieldDCA(MSA(data=data, alphabet=RNA), "rna", pseudocount=0.0)
    with caplog.at_level(logging.WARNING, logger="pydca_tpu.meanfield"):
        scores = inst.compute_sorted_FN_APC()
    assert any("falling back to an LU inverse" in r.message for r in caplog.records)
    # structure intact (values may be non-finite: C here is truly singular,
    # matching the reference's behavior of inverting garbage-in garbage-out)
    assert len(scores) == 6 * 5 // 2
