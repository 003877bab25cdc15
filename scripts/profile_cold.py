"""Profile where the cold-start time of the mf pipeline goes on the real TPU.

Runs each jitted stage of `mfdca compute_fn` separately, timing lowering,
compilation, and first execution. Run with PYDCA_TPU_CACHE_DIR="" to disable
the persistent compilation cache (true cold start).
"""

import os
import sys
import time

# run-by-path bootstrap: make the repo root importable regardless of
# PYTHONPATH (which carries the TPU plugin dir on this host)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pydca_tpu import read_msa, stats
from pydca_tpu.ops import linalg
from pydca_tpu import score as score_mod

RF00167 = "/root/reference/examples/MSA_RF00167.fa"


def t(label, fn, *args, **kwargs):
    t0 = time.time()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    print(f"{label:45s} {time.time() - t0:8.2f}s", flush=True)
    return out


def timed_jit(label, fn, *args, static_argnames=(), **kwargs):
    jitted = jax.jit(fn, static_argnames=static_argnames)
    t0 = time.time()
    lowered = jitted.lower(*args, **kwargs)
    t1 = time.time()
    compiled = lowered.compile()
    t2 = time.time()
    out = compiled(*args, **{k: v for k, v in kwargs.items() if k not in static_argnames})
    jax.block_until_ready(out)
    t3 = time.time()
    print(
        f"{label:45s} lower {t1-t0:7.2f}s  compile {t2-t1:7.2f}s  run {t3-t2:7.2f}s",
        flush=True,
    )
    return out


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    t0_all = time.time()
    msa = t("read_msa", read_msa, RF00167, "rna")
    l, q = msa.seqs_len, msa.q
    m = jnp.asarray(msa.data, jnp.int32)

    w = t("sequence_weights (jit+run)", stats.sequence_weights, m, 0.8, q)
    gram = t("weighted_gram (jit+run)", stats.weighted_gram, m, w, q)
    fi = jnp.diagonal(gram).reshape(l, q)
    fi_reg = stats.regularize_fi(fi, q, 0.5)
    c = t(
        "corr_mat_from_gram (jit+run)",
        stats.corr_mat_from_gram,
        gram, fi_reg, 0.5, l, q,
    )
    c = c.astype(jnp.float32)

    # break the inverse into parts
    chol = timed_jit("cholesky", jnp.linalg.cholesky, c)
    w_inv = timed_jit(
        "tri_inv_lower", linalg.tri_inv_lower, chol
    )
    timed_jit("syrk w.T @ w", lambda a: a.T @ a, w_inv)
    couplings = t("spd_inverse (full, jit+run)", linalg.spd_inverse, c)
    couplings = -couplings

    fn = t(
        "frobenius_norms_from_matrix (jit+run)",
        score_mod.frobenius_norms_from_matrix,
        couplings, l, q - 1,
    )
    t("apc (jit+run)", score_mod.apc, fn, l)
    print(f"{'TOTAL':45s} {time.time() - t0_all:8.2f}s", flush=True)


if __name__ == "__main__":
    main()
