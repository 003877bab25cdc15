"""r5: decompose the fused plm iteration — optimizer machinery vs eval side.

The r4 ask (VERDICT item 2) was machinery <= 4 ms/iter at D = 8.35M.  The
fused loop's D-space machinery is the direction combination + the Z@g'
refresh + a few axpys; everything evaluation-shaped (logits matmuls, the
per-direction coupling expansion and per-iterate pullback, line-search
trials) scales with N or is a fixed D-permutation cost.

Method: slope-time the fused chunk program at PF02826's D with the REAL
alignment (N=2030) and with a TINY alignment (N=32, same L, q).  The tiny
run's per-iter cost = machinery + expansion/pullback (both N-independent);
the difference to the real run = the N-proportional eval side.
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from pydca_tpu import plm as plm_mod
from pydca_tpu import stats
from pydca_tpu.io.fasta import read_msa
from pydca_tpu.profiling import sync

PF02826 = "/root/reference/tests/tests_input/PF02826.faa"


def slope(msa, w, l, q, hist_bf16, lo=10, hi=160):
    """Per-iteration slope; (lo, hi) must stay below the problem's
    convergence/rounding-exit point (returned k values verify)."""
    lam = jnp.float32(0.2 * (l - 1))
    x1h, maskq = plm_mod._prep_msa_jit(msa, l, q)

    def run(iters):
        st = plm_mod._plm_fused_state0(msa, w, lam, lam, l, q, 5, False,
                                       hist_bf16)
        st = plm_mod._plm_fused_steps(
            st, x1h, maskq, w, lam, lam, l, q, iters, False, 0.0
        )
        sync(st.x)
        return st

    out = {}
    for iters in (lo, hi):
        run(iters)
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            st = run(iters)
            best = min(best, time.time() - t0)
        out[iters] = (best, int(st.k), int(st.n_evals))
    (tlo, klo, elo), (thi, khi, ehi) = out[lo], out[hi]
    per = (thi - tlo) / max(khi - klo, 1)
    evs = (ehi - elo) / max(khi - klo, 1)
    return per, evs, (klo, khi)


def main():
    msa_o = read_msa(PF02826, "protein")
    l, q = msa_o.seqs_len, msa_o.q
    m = jnp.asarray(msa_o.data, jnp.int32)
    n = m.shape[0]
    w = stats.sequence_weights(m, 0.8, q)
    sync(w)
    d = l * q + l * (l - 1) // 2 * q * q

    rng = np.random.default_rng(0)
    tiny = jnp.asarray(rng.integers(0, q, (32, l)), jnp.int32)
    wt = jnp.ones((32,), jnp.float32)

    for hist_bf16, tag in ((True, "bf16 hist (TPU default)"),
                           (False, "f32 hist")):
        per_t, _, ks_t = slope(tiny, wt, l, q, hist_bf16, lo=5, hi=25)
        per_f, evs, ks_f = slope(m, w, l, q, hist_bf16)
        assert ks_t[1] > ks_t[0] and ks_f[1] > ks_f[0], (ks_t, ks_f)
        print(
            f"[{tag}] D={d}: machinery+expand/pullback {per_t*1e3:.2f} "
            f"ms/iter (N=32, k={ks_t}) | full iter {per_f*1e3:.2f} ms "
            f"({evs:.2f} evals/iter, N={n}, k={ks_f}) | eval side "
            f"{(per_f-per_t)*1e3:.2f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
