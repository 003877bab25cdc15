"""r5: per-iteration cost of the fused plm L-BFGS loop at PF02826 scale.

Slope method as in r4_lbfgs_overhead: run the chunk program at two
iteration counts with epsilon=0 (never converges) and divide the delta.
Also times the end-to-end 100-iteration fit wall.
"""
import sys, time
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from pydca_tpu import plm as plm_mod
from pydca_tpu import stats
from pydca_tpu.io.fasta import read_msa
from pydca_tpu.profiling import sync

PF02826 = "/root/reference/tests/tests_input/PF02826.faa"

msa_o = read_msa(PF02826, "protein")
l, q = msa_o.seqs_len, msa_o.q
m = jnp.asarray(msa_o.data, jnp.int32)
n = m.shape[0]
w = stats.sequence_weights(m, 0.8, q)
sync(w)
lam = jnp.float32(0.2 * (l - 1))
x1h, maskq = plm_mod._prep_msa_jit(m, l, q)

steps_fn = jax.jit(
    lambda st, it: plm_mod._plm_fused_steps(
        st, x1h, maskq, w, lam, lam, l, q, it, False, 0.0
    ),
    static_argnums=(1,),
)


def run(iters):
    st = plm_mod._plm_fused_state0(m, w, lam, lam, l, q, 5, False)
    t0 = time.time()
    st = plm_mod._plm_fused_steps(
        st, x1h, maskq, w, lam, lam, l, q, iters, False, 0.0
    )
    sync(st.x)
    return time.time() - t0, int(st.k), int(st.n_evals)


# warm compile both programs
for it in (10, 210):
    run(it)

best = {}
for it in (10, 210):
    b = 1e9
    for t in range(3):
        dt, k, ev = run(it)
        b = min(b, dt)
    best[it] = (b, k, ev)
(tlo, klo, elo), (thi, khi, ehi) = best[10], best[210]
per = (thi - tlo) / max(khi - klo, 1)
evs = (ehi - elo) / max(khi - klo, 1)
flops = 4.0 * n * (l * q) ** 2
tf = flops / per / 1e12
print(f"fused per-iter: {per*1e3:.3f} ms ({evs:.2f} evals/iter) "
      f"-> {tf:.1f} model TF/s ({tf/197*100:.1f}% of bf16 peak) "
      f"[lo {tlo:.3f}s/{klo}it, hi {thi:.3f}s/{khi}it]")

# end-to-end fit wall (default epsilon, 100 iters, as production)
t0 = time.time()
res = plm_mod.fit_plm(m, w, lam, lam, l, q, max_iterations=100)
sync(res.x)
cold = time.time() - t0
walls = []
for _ in range(3):
    t0 = time.time()
    res = plm_mod.fit_plm(m, w, lam, lam, l, q, max_iterations=100)
    sync(res.x)
    walls.append(time.time() - t0)
print(f"100-iter fit wall: {min(walls):.3f} s (first {cold:.1f} s) "
      f"iters={int(res.num_iters)} evals={int(res.n_evals)} "
      f"fx={float(res.fx):.2f} conv={bool(res.converged)}")
