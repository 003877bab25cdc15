"""Benchmark: plmDCA on RF00167 (BASELINE.json configs[1]) on the real TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

value   = steady-state wall-clock of a full 100-iteration plmDCA fit
          (second run; the first run pays one-time JIT compilation).
vs_baseline = reference C++/OpenMP backend wall-clock on this host divided
          by ours (>1 means faster than the reference).  The reference
          timing is measured once and cached in tests/goldens/.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
MSA = "/root/reference/examples/MSA_RF00167.fa"
GOLDEN = os.path.join(REPO, "tests", "goldens", "ref_plm_rf00167_it100.npz")
ITERS = 100


def reference_seconds() -> float:
    import numpy as np

    if os.path.exists(GOLDEN):
        return float(np.load(GOLDEN)["seconds"])
    sys.path.insert(0, os.path.join(REPO, "tests"))
    import ref_backend

    t0 = time.time()
    params = ref_backend.run_backend(
        MSA, "rna", 102, max_iterations=ITERS, num_threads=os.cpu_count()
    )
    dt = time.time() - t0
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    np.savez_compressed(GOLDEN, params=params, seconds=dt)
    return dt


def main():
    from pydca_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp

    from pydca_tpu import read_msa, stats
    from pydca_tpu.plm import fit_plm

    ref_s = reference_seconds()

    msa = read_msa(MSA, "rna")
    l, q = msa.seqs_len, msa.q
    m = jnp.asarray(msa.data, jnp.int32)
    w = stats.sequence_weights(m, 0.8, q)
    w.block_until_ready()
    lam = jnp.float32(0.2 * (l - 1))

    def run():
        t0 = time.time()
        res = fit_plm(m, w, lam, lam, l, q, max_iterations=ITERS)
        res.x.block_until_ready()
        return time.time() - t0, int(res.num_iters)

    run()  # warm-up: pays JIT compilation
    dt, iters = min(run() for _ in range(3))

    print(
        json.dumps(
            {
                "metric": "plmdca_rf00167_100it_wallclock",
                "value": round(dt, 4),
                "unit": "s",
                "vs_baseline": round(ref_s / dt, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
