"""Generate *reference-exact* mean-field DCA goldens from the reference code.

The reference mfDCA kernels (/root/reference/pydca/meanfield_dca/msa_numerics.py)
are plain numpy apart from ``@numba.jit`` decorators, and the engine
(meanfield_dca.py) needs Biopython only for its file reader.  We stub both
(`numba.jit` -> identity decorator, `Bio.AlignIO.read` -> tiny FASTA parser)
and drive the reference engine as a black box on the bundled datasets,
committing FN / FN_APC / DI / DI_APC rankings as .npz goldens.

This is a one-time generation script: its outputs live in tests/goldens/ and
are consumed by tests/test_ref_parity.py.  No reference code is vendored —
only imported from /root/reference and executed.

Run:  python scripts/gen_mf_goldens.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))
from ref_mf import load_reference_meanfield  # noqa: E402

REF = "/root/reference"
OUT = "/root/repo/tests/goldens"

MeanFieldDCA = load_reference_meanfield()


def pack(sorted_scores):
    """[( (i,j), s ), ...] -> int32 pairs array + float64 score array."""
    pairs = np.array([p for p, _ in sorted_scores], dtype=np.int32)
    scores = np.array([s for _, s in sorted_scores], dtype=np.float64)
    return pairs, scores


def run(name, msa_file, biomolecule):
    t0 = time.time()
    inst = MeanFieldDCA(msa_file, biomolecule, pseudocount=0.5, seqid=0.8)
    print(f"[{name}] N={inst.num_sequences} L={inst.sequences_len} "
          f"q={inst.num_site_states} Meff={inst.effective_num_sequences:.3f} "
          f"({time.time()-t0:.1f}s for weights)")

    out = {}
    for attr, key in [
        ("compute_sorted_FN", "fn"),
        ("compute_sorted_FN_APC", "fn_apc"),
        ("compute_sorted_DI", "di"),
        ("compute_sorted_DI_APC", "di_apc"),
    ]:
        t1 = time.time()
        pairs, scores = pack(getattr(inst, attr)())
        out[f"{key}_pairs"] = pairs
        out[f"{key}_scores"] = scores
        print(f"[{name}] {key}: top pair {tuple(pairs[0])} "
              f"score {scores[0]:.6f}  ({time.time()-t1:.1f}s)")

    out["meff"] = np.float64(inst.effective_num_sequences)
    out["seqs_weight"] = np.asarray(inst.sequences_weight, dtype=np.float64)
    path = f"{OUT}/ref_mf_{name}.npz"
    np.savez_compressed(path, **out)
    print(f"[{name}] wrote {path}  total {time.time()-t0:.1f}s")


if __name__ == "__main__":
    run("rf00167", f"{REF}/examples/MSA_RF00167.fa", "rna")
    run("pf02826", f"{REF}/tests/tests_input/PF02826.faa", "protein")
