"""Diagnose where a cold `mfdca compute_fn` run spends its wall time.

Dumps all-thread stacks every 45 s (faulthandler) and prints a wall-clock
timestamp around each pipeline stage by monkey-patching the engine methods.
"""

import faulthandler
import sys
import time

faulthandler.dump_traceback_later(45, repeat=True, file=sys.stderr)

T0 = time.time()


def stamp(label):
    print(f"[{time.time() - T0:8.2f}s] {label}", flush=True)


import pydca_tpu.meanfield as mf
import pydca_tpu.score as score_mod
import pydca_tpu.stats as stats

for mod, names in [
    (mf.MeanFieldDCA, [
        "get_sequences_weight", "_get_gram", "construct_corr_mat",
        "compute_couplings", "_fn_scores", "compute_sorted_FN_APC",
    ]),
]:
    for name in names:
        orig = getattr(mod, name)

        def wrap(orig=orig, name=name):
            def inner(*a, **k):
                stamp(f"enter {name}")
                out = orig(*a, **k)
                stamp(f"exit  {name}")
                return out
            return inner

        setattr(mod, name, wrap())

stamp("imports done")
from pydca_tpu.cli.mfdca_main import run_meanfield_dca

run_meanfield_dca(
    [
        "compute_fn", "rna", "/root/reference/examples/MSA_RF00167.fa",
        "--apc", "--output_dir", "/tmp/mf_diag",
    ]
)
stamp("ALL DONE")
faulthandler.cancel_dump_traceback_later()
