"""Drop-in compatibility surface: reference-named APIs behave like the
reference (``pydca/fasta_reader/fasta_reader.py``, ``meanfield_dca.py``,
``plmdca.py``)."""

import numpy as np
import pytest

from pydca_tpu import fasta_reader
from pydca_tpu.io.fasta import read_msa
from pydca_tpu.meanfield import MeanFieldDCA
from pydca_tpu.plm import PlmDCA


@pytest.fixture(scope="module")
def tiny_msa_file(tmp_path_factory):
    rng = np.random.default_rng(7)
    base = rng.integers(0, 5, size=(4, 10))
    rows = base[rng.integers(0, 4, size=40)]
    mut = rng.random((40, 10)) < 0.3
    rows = np.where(mut, rng.integers(0, 5, size=(40, 10)), rows)
    chars = np.array(list("ACGU-"))
    path = tmp_path_factory.mktemp("compat") / "tiny.fa"
    with open(path, "w") as fh:
        for k, row in enumerate(rows):
            fh.write(f">s{k}\n{''.join(chars[row])}\n")
    return str(path)


# ------------------------------------------------------------- fasta_reader
def test_int_form_is_one_based_and_dedupped(tiny_msa_file):
    int_form = fasta_reader.get_alignment_int_form(tiny_msa_file, "rna")
    msa = read_msa(tiny_msa_file, "rna")
    assert len(int_form) == msa.num_seqs
    assert np.array_equal(np.asarray(int_form), np.asarray(msa.data) + 1)
    # all codes in 1..q, gap = q
    flat = np.asarray(int_form).ravel()
    assert flat.min() >= 1 and flat.max() <= 5


def test_char_form_and_roundtrip(tiny_msa_file):
    char_form = fasta_reader.get_alignment_char_form(tiny_msa_file, "rna")
    int_form = fasta_reader.get_alignment_int_form(tiny_msa_file, "rna")
    assert fasta_reader.sequences_to_char_form(int_form, "rna") == char_form


def test_res_to_char_tables():
    r2c = fasta_reader.res_to_char("protein")
    assert r2c[1] == "A" and r2c[21] == "-" and len(r2c) == 21
    assert fasta_reader.RES_TO_INT_ALL["RNA"]["U"] == 4
    assert fasta_reader.RES_TO_INT_ALL["PROTEIN"]["Y"] == 20


def test_alignment_letter2int_maps_nonstandard_to_gap():
    out = fasta_reader.alignment_letter2int(["ACGU", "ACGX"], biomolecule="rna")
    assert out == [[1, 2, 3, 4], [1, 2, 3, 5]]


def test_get_alignment_from_fasta_file(tiny_msa_file):
    seqs = fasta_reader.get_alignment_from_fasta_file(tiny_msa_file)
    assert len(seqs) == 40 and all(len(s) == 10 for s in seqs)


# ------------------------------------------------------------- MeanFieldDCA
def test_mf_alignment_and_weight_properties(tiny_msa_file):
    mf = MeanFieldDCA(tiny_msa_file, "rna")
    aln = mf.alignment
    assert aln.min() >= 1 and aln.max() <= 5
    assert aln.shape == (mf.num_sequences, mf.sequences_len)
    w1 = np.asarray(mf.sequences_weight)
    w2 = np.asarray(mf.compute_sequences_weight())
    assert np.allclose(w1, w2)


def test_mf_corr_mat_from_explicit_freqs(tiny_msa_file):
    mf = MeanFieldDCA(tiny_msa_file, "rna")
    fast = np.asarray(mf.construct_corr_mat())
    explicit = np.asarray(
        mf.construct_corr_mat(
            mf.get_reg_single_site_freqs(), mf.get_reg_pair_site_freqs()
        )
    )
    assert np.allclose(fast, explicit, atol=1e-6)


def test_mf_couplings_from_explicit_corr_mat(tiny_msa_file):
    mf = MeanFieldDCA(tiny_msa_file, "rna")
    cached = np.asarray(mf.compute_couplings())
    explicit = np.asarray(mf.compute_couplings(mf.construct_corr_mat()))
    assert np.allclose(cached, explicit, atol=1e-4)


def test_mf_two_site_model_fields_shape(tiny_msa_file):
    mf = MeanFieldDCA(tiny_msa_file, "rna")
    l, q = mf.sequences_len, mf.num_site_states
    fields_ij = mf.compute_two_site_model_fields()
    assert fields_ij.shape == (l * (l - 1) // 2, 2, q)
    # explicit-argument form matches
    explicit = mf.compute_two_site_model_fields(
        mf.compute_couplings(), mf.get_reg_single_site_freqs()
    )
    assert np.allclose(fields_ij, explicit)


def test_mf_site_pair_di_dict_matches_sorted_di(tiny_msa_file):
    mf = MeanFieldDCA(tiny_msa_file, "rna")
    d = mf.get_site_pair_di_score()
    sorted_di = mf.compute_sorted_DI()
    assert len(d) == len(sorted_di)
    top_pair, top_score = sorted_di[0]
    assert d[top_pair] == pytest.approx(top_score)


# ------------------------------------------------------------------- PlmDCA
def test_plm_compat_methods(tiny_msa_file):
    plm = PlmDCA(tiny_msa_file, "rna", max_iterations=3)
    l, q = plm.sequences_len, plm.num_site_states
    # index mapper against the closed-form pair offset
    k = plm.map_index_couplings(0, 1, 0, 0)
    assert k == l * q
    k2 = plm.map_index_couplings(0, 2, 1, 3)
    assert k2 == l * q + 1 * q * q + 1 * q + 3
    fi = np.asarray(plm.get_single_site_freqs())
    assert fi.shape == (l, q)
    assert np.allclose(fi.sum(axis=1), 1.0, atol=1e-5)
    di = plm.compute_direct_info_unsorted_DI()
    assert di.shape == (l * (l - 1) // 2,)
    fields_ij = plm.compute_two_site_model_fields()
    assert fields_ij.shape == (l * (l - 1) // 2, 2, q)


def test_meanfield_accepts_seqrecord_like_objects(tmp_path):
    """Duck-typed Bio.Align.MultipleSeqAlignment input: items exposing
    .id/.seq (reference ``meanfield_dca.py:97-106``; its only equality test
    asserts file-path and Bio-object FN_APC are identical,
    ``tests/meanfield_dca_test.py:42-61``)."""
    import numpy as np

    from pydca_tpu.meanfield import MeanFieldDCA

    rng = np.random.default_rng(9)
    letters = "ACGU-"
    rows = rng.integers(0, 5, size=(25, 14))
    path = tmp_path / "m.fa"
    with open(path, "w") as fh:
        for k, r in enumerate(rows):
            fh.write(f">s{k}\n" + "".join(letters[i] for i in r) + "\n")

    class FakeSeq:
        def __init__(self, s):
            self._s = s

        def __str__(self):
            return self._s

    class FakeRecord:
        def __init__(self, rid, s):
            self.id = rid
            self.seq = FakeSeq(s)

    records = [
        FakeRecord(f"s{k}", "".join(letters[i] for i in r))
        for k, r in enumerate(rows)
    ]
    a = MeanFieldDCA(str(path), "rna")
    b = MeanFieldDCA(records, "rna")
    fa = a.compute_sorted_FN_APC()
    fb = b.compute_sorted_FN_APC()
    assert fa == fb
