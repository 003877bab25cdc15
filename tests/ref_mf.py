"""Load the *reference* mean-field DCA engine as a black box.

The reference mf kernels (/root/reference/pydca/meanfield_dca/msa_numerics.py)
are plain numpy apart from ``@numba.jit`` decorators, and the engine
(meanfield_dca.py) needs Biopython only for file reading.  numba and
Biopython are not installed here, so we stub both (``numba.jit`` -> identity,
``Bio.AlignIO.read`` -> a tiny FASTA parser) and import the reference engine
from /root/reference unmodified.  Nothing is vendored or copied — the
reference runs in place.

Used by scripts/gen_mf_goldens.py (golden generation) and bench.py (the
config-0 baseline timing: the reference mf engine as it would run on this
host, where numba is unavailable so the kernels execute as pure numpy;
the numba-compiled loops would be faster, but they cannot run here).
"""

import sys
import types

REF = "/root/reference"


class _Record:
    def __init__(self, seq):
        self.seq = seq


def _read_fasta(file_name, fmt):
    assert fmt == "fasta"
    records = []
    cur = []
    with open(file_name) as fh:
        for line in fh:
            line = line.rstrip("\n")
            if line.startswith(">"):
                if cur:
                    records.append(_Record("".join(cur)))
                cur = []
            elif line.strip():
                cur.append(line.strip())
    if cur:
        records.append(_Record("".join(cur)))
    return records


def _install_stubs():
    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")

        def _jit(*args, **kwargs):
            if args and callable(args[0]) and not kwargs:
                return args[0]

            def deco(fn):
                return fn

            return deco

        numba.jit = _jit
        numba.prange = range
        sys.modules["numba"] = numba

    if "Bio" not in sys.modules:
        bio = types.ModuleType("Bio")
        align_io = types.ModuleType("Bio.AlignIO")
        align_io.read = _read_fasta
        align_mod = types.ModuleType("Bio.Align")

        class MultipleSeqAlignment:  # engine's isinstance check only
            pass

        align_mod.MultipleSeqAlignment = MultipleSeqAlignment
        bio.AlignIO = align_io
        bio.Align = align_mod
        sys.modules["Bio"] = bio
        sys.modules["Bio.AlignIO"] = align_io
        sys.modules["Bio.Align"] = align_mod


def load_reference_meanfield():
    """Return the reference ``MeanFieldDCA`` class (stubs installed)."""
    _install_stubs()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from pydca.meanfield_dca.meanfield_dca import MeanFieldDCA

    return MeanFieldDCA
