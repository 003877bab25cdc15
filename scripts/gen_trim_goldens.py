"""Generate MSA-trimmer goldens by executing the reference MSATrimmer.

Same stub arrangement as scripts/gen_backmap_goldens.py (numba + Biopython
stubbed, our aligner behind the pairwise2 interface); the column-selection
logic (``/root/reference/pydca/msa_trimmer/msa_trimmer.py:58-194``) is the
reference's own code.  Writes tests/goldens/ref_trim.npz with the removed-
column tuples for trim_by_refseq (both remove_all_gaps modes) on all three
datasets plus trim_by_gap_size cases.

Run:  python scripts/gen_trim_goldens.py
"""

import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))
sys.path.insert(0, os.path.join(HERE, "..", "tests"))
sys.path.insert(0, HERE)

import gen_backmap_goldens as gbg  # noqa: E402  (installs numba/Bio stubs)

REF = gbg.REF

CASES = {
    "rf00059_refseq": (
        f"{REF}/tests/tests_input/MSA_RF00059_trimmed_gap_treshold_50.fa",
        f"{REF}/tests/tests_input/ref_seq_RF00059.faa",
        "rna",
    ),
    "rf00167_refseq": (
        f"{REF}/examples/MSA_RF00167.fa",
        f"{REF}/examples/ref_RF00167.fa",
        "rna",
    ),
    "pf02826_refseq": (
        f"{REF}/tests/tests_input/PF02826.faa",
        f"{REF}/tests/tests_input/ref_seq_PF02826.faa",
        "protein",
    ),
}

GAP_CASES = [(0.5, "rf00167"), (0.4, "pf02826")]


def main():
    gbg._install_pairwise_stubs()
    sys.path.insert(0, REF)
    from pydca.msa_trimmer.msa_trimmer import MSATrimmer

    out = {}
    for name, (msa, ref, bio) in CASES.items():
        t0 = time.time()
        tr = MSATrimmer(msa, biomolecule=bio, refseq_file=ref)
        out[f"{name}_cols"] = np.asarray(
            tr.trim_by_refseq(remove_all_gaps=False), np.int32
        )
        out[f"{name}_cols_all"] = np.asarray(
            tr.trim_by_refseq(remove_all_gaps=True), np.int32
        )
        print(name, len(out[f"{name}_cols"]), len(out[f"{name}_cols_all"]),
              f"{time.time() - t0:.1f}s")
    for gs, key in GAP_CASES:
        msa, _, bio = CASES[key + "_refseq"]
        tr = MSATrimmer(msa, biomolecule=bio, max_gap=gs)
        out[f"{key}_gap{int(gs * 100)}_cols"] = np.asarray(
            tr.trim_by_gap_size(), np.int32
        )
        print(key, "gap", gs, len(out[f"{key}_gap{int(gs * 100)}_cols"]))
    path = os.path.join(HERE, "..", "tests", "goldens", "ref_trim.npz")
    np.savez_compressed(path, **out)
    print("wrote", path)


if __name__ == "__main__":
    main()
