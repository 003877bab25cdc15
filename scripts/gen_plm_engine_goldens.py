"""Reference plm *engine* goldens: scoring pipeline outputs on fixed params.

The committed ``ref_plm_*_it100.npz`` goldens pin the reference backend's
parameter vectors; this script additionally pins the reference PYTHON
engine's scoring pipeline (``/root/reference/pydca/plmdca/plmdca.py``):
gap-state exclusion index arithmetic (:246-292), per-pair gauge shift + FN
(:437-482), APC (:484-524) and the DI path with its hard-coded pseudocount
0.5 (:638-720).

Determinism: the engine's one nondeterministic input (the OpenMP backend
fit) is replaced by the committed golden parameter vector — the instance's
``get_fields_and_couplings_from_backend`` is patched to return it, so the
goldens are a pure function of committed data and every downstream line is
the reference's own code (numba/Bio stubbed as in scripts/gen_mf_goldens.py;
the backend .so is compiled only so the module imports).

Run:  python scripts/gen_plm_engine_goldens.py
"""

import glob as _glob
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.join(HERE, "..")
REF = "/root/reference"
OUT = os.path.join(REPO, "tests", "goldens")
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from ref_mf import _install_stubs  # noqa: E402

import ref_backend  # noqa: E402


def main():
    _install_stubs()
    # the reference calls np.reshape(x, shape=...) (plmdca/msa_numerics.py:151),
    # a kwarg this numpy spells `newshape`; accept both during generation
    _orig_reshape = np.reshape

    def _reshape(a, *args, **kw):
        if "shape" in kw:
            kw["newshape"] = kw.pop("shape")
        return _orig_reshape(a, *args, **kw)

    np.reshape = _reshape
    ref_backend.build()  # the module import dlopens the .so (never called)
    orig_glob = _glob.glob
    _glob.glob = lambda pat: (
        [ref_backend.SO_PATH] if "_plmdcaBackend" in pat else orig_glob(pat)
    )
    sys.path.insert(0, REF)
    from pydca.plmdca.plmdca import PlmDCA  # noqa: E402

    cases = {
        "rf00167": (f"{REF}/examples/MSA_RF00167.fa", "rna"),
        "pf02826": (f"{REF}/tests/tests_input/PF02826.faa", "protein"),
    }
    out = {}
    for name, (msa_file, biomolecule) in cases.items():
        params = np.load(
            os.path.join(OUT, f"ref_plm_{name}_it100.npz")
        )["params"]
        inst = PlmDCA(msa_file, biomolecule)
        inst.get_fields_and_couplings_from_backend = lambda p=params: p

        t0 = time.time()
        for attr, key in [
            ("compute_sorted_FN", "fn"),
            ("compute_sorted_FN_APC", "fn_apc"),
            ("compute_sorted_DI", "di"),
            ("compute_sorted_DI_APC", "di_apc"),
        ]:
            t1 = time.time()
            scores = getattr(inst, attr)()
            out[f"{name}_{key}_pairs"] = np.array(
                [p for p, _ in scores], np.int32
            )
            out[f"{name}_{key}_scores"] = np.array(
                [s for _, s in scores], np.float64
            )
            print(f"[{name}] {key}: top {scores[0]}  ({time.time()-t1:.1f}s)")
        print(f"[{name}] total {time.time()-t0:.1f}s")
    path = os.path.join(OUT, "ref_plm_engine.npz")
    np.savez_compressed(path, **out)
    print("wrote", path)


if __name__ == "__main__":
    main()
