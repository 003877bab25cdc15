"""Production-fit diagnostics: evals + ms/eval for compact vs w2 space."""
import sys, time
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from pydca_tpu import read_msa, stats
from pydca_tpu.plm import fit_plm
from pydca_tpu.profiling import sync

CASES = [
    ("/root/reference/tests/tests_input/PF02826.faa", "protein", "pf02826"),
    ("/root/reference/tests/tests_input/MSA_RF00059_trimmed_gap_treshold_50.fa", "rna", "rf00059"),
]
for path, bio, name in CASES:
    msa = read_msa(path, bio)
    l, q = msa.seqs_len, msa.q
    m = jnp.asarray(msa.data, jnp.int32)
    w = stats.sequence_weights(m, 0.8, q); sync(w)
    lam = jnp.float32(0.2 * (l - 1))
    for space in ("compact", "w2"):
        def run():
            t0 = time.time()
            r = fit_plm(m, w, lam, lam, l, q, max_iterations=100, param_space=space)
            sync(r.x)
            return r, time.time() - t0
        run()
        r, t1 = run(); r2, t2 = run()
        t = min(t1, t2)
        ev = int(r.n_evals); it = int(r.num_iters)
        print(f"{name} {space}: warm {t:.3f}s iters={it} evals={ev} "
              f"-> {t/max(ev,1)*1e3:.2f} ms/eval, {t/max(it,1)*1e3:.2f} ms/iter",
              flush=True)
