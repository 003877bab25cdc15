"""Generate backmapping golden dicts by executing the *reference* backmapper.

The reference ``SequenceBackmapper`` (``pydca/sequence_backmapper/
sequence_backmapper.py:339-466``) implements an intricate gap re-insertion
walk (``align_subsequences``, incl. the "Fabrizio" boundary check at
``:327``).  Biopython is not installable here, so the alignment *engine*
(``Bio.pairwise2.align.localds``) is stubbed with our own Smith-Waterman-
Gotoh (same gap model: first gap char costs `open`, each further char
`extend`), rendered in Biopython's local-alignment output format (full
padded strings + begin/end of the local region).  Everything downstream of
the alignment — template search ordering, leading-residue bookkeeping, the
gap walk, the mapping inversion — is the reference's own code executed from
/root/reference, unmodified.

The committed goldens therefore pin our ``backmap.py`` against the
reference's mapping logic; alignment ties (if any) are resolved by the same
aligner on both sides.

Run:  python scripts/gen_backmap_goldens.py
"""

import os
import sys
import time
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
OUT = os.path.join(REPO, "tests", "goldens")
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from ref_mf import _install_stubs  # numba + Bio.AlignIO/Align stubs

from pydca_tpu.align import aligned_strings, local_align  # noqa: E402
from pydca_tpu.matrices import BLOSUM62  # noqa: E402

_install_stubs()


# ---------------------------------------------------------------------------
# Bio.pairwise2.align.localds stub in Biopython's output format
# ---------------------------------------------------------------------------
def _localds(seq_a, seq_b, matrix, gap_open, gap_extend, score_only=False,
             **_kw):
    letters = sorted(set(seq_a) | set(seq_b))
    enc = {c: i for i, c in enumerate(letters)}
    sub = np.zeros((len(letters), len(letters)))
    for x in letters:
        for y in letters:
            v = matrix.get((x, y), matrix.get((y, x)))
            if v is None:
                raise KeyError(f"no substitution score for {(x, y)}")
            sub[enc[x], enc[y]] = v
    a = np.array([enc[c] for c in seq_a])
    b = np.array([enc[c] for c in seq_b])
    score, a0, b0, path = local_align(a, b, sub, gap_open, gap_extend)
    if score_only:
        return score
    mid_a, mid_b = aligned_strings(seq_a, seq_b, a0, b0, path)
    a_end = a0 + sum(da for da, _ in path)
    b_end = b0 + sum(db for _, db in path)
    # Biopython local alignments return the FULL sequences padded with gaps;
    # begin/end delimit the locally aligned region.  Flank layout (A residues
    # against gaps, then B residues against gaps) only needs to preserve the
    # per-line non-gap counts, which is all the reference reads from it.
    line_a = seq_a[:a0] + "-" * b0 + mid_a + seq_a[a_end:] + "-" * (len(seq_b) - b_end)
    line_b = "-" * a0 + seq_b[:b0] + mid_b + "-" * (len(seq_a) - a_end) + seq_b[b_end:]
    begin = a0 + b0
    end = begin + len(mid_a)
    return [(line_a, line_b, float(score), begin, end)]


def _install_pairwise_stubs():
    pairwise2 = types.ModuleType("Bio.pairwise2")
    align_ns = types.SimpleNamespace(localds=_localds)
    pairwise2.align = align_ns
    sys.modules["Bio.pairwise2"] = pairwise2
    sys.modules["Bio"].pairwise2 = pairwise2

    submat = types.ModuleType("Bio.SubsMat")
    matinfo = types.ModuleType("Bio.SubsMat.MatrixInfo")
    matinfo.blosum62 = dict(BLOSUM62)
    submat.MatrixInfo = matinfo
    sys.modules["Bio.SubsMat"] = submat
    sys.modules["Bio.SubsMat.MatrixInfo"] = matinfo
    sys.modules["Bio"].SubsMat = submat


CASES = {
    "rf00167": (
        f"{REF}/examples/MSA_RF00167.fa",
        f"{REF}/examples/ref_RF00167.fa",
        "rna",
    ),
    "pf02826": (
        f"{REF}/tests/tests_input/PF02826.faa",
        f"{REF}/tests/tests_input/ref_seq_PF02826.faa",
        "protein",
    ),
    "rf00059": (
        f"{REF}/tests/tests_input/MSA_RF00059_trimmed_gap_treshold_50.fa",
        f"{REF}/tests/tests_input/ref_seq_RF00059.faa",
        "rna",
    ),
    **{
        f"rf00059_test{k}": (
            f"{REF}/tests/tests_input/MSA_RF00059_trimmed_gap_treshold_50.fa",
            f"{REF}/tests/tests_input/ref_seq_RF00059_test{k}.faa",
            "rna",
        )
        for k in (1, 2, 3, 4)
    },
}


def main():
    _install_pairwise_stubs()
    sys.path.insert(0, REF)
    from pydca.sequence_backmapper.sequence_backmapper import (  # noqa: E402
        SequenceBackmapper,
    )

    out = {}
    for name, (msa_file, refseq_file, biomolecule) in CASES.items():
        t0 = time.time()
        bm = SequenceBackmapper(
            msa_file=msa_file, refseq_file=refseq_file, biomolecule=biomolecule
        )
        mapping = bm.map_to_reference_sequence()
        keys = np.array(sorted(mapping), dtype=np.int32)
        vals = np.array([mapping[k] for k in keys], dtype=np.int32)
        out[f"{name}_msa_sites"] = keys
        out[f"{name}_ref_sites"] = vals
        print(
            f"[{name}] {len(mapping)} sites mapped "
            f"(first {keys[0]}->{vals[0]}, last {keys[-1]}->{vals[-1]}) "
            f"in {time.time() - t0:.1f}s"
        )
    path = os.path.join(OUT, "ref_backmap.npz")
    np.savez_compressed(path, **out)
    print("wrote", path)


if __name__ == "__main__":
    main()
