"""Isolate L-BFGS machinery cost per iteration at production D.

Slope method: time lbfgs_steps at two iteration counts (epsilon=0 so it
never converges) and divide the difference — call/dispatch overhead and
the tunnel fetch cancel.
"""
import sys, time
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from pydca_tpu.ops.lbfgs import lbfgs_init, lbfgs_steps
from pydca_tpu.profiling import sync

def bench(d, lo=10, hi=210):
    diag = 1.0 + 1e4 * jnp.arange(d, dtype=jnp.float32) / max(d - 1, 1)

    def fun(x):
        g = diag * x - 1.0
        return 0.5 * jnp.vdot(x, diag * x) - jnp.sum(x), g

    @jax.jit
    def run(x0, iters):
        st = lbfgs_init(fun, x0)
        return lbfgs_steps(fun, st, int(iters), epsilon=0.0)

    runs = {}
    for iters in (lo, hi):
        f = jax.jit(
            lambda x0, it=iters: lbfgs_steps(
                fun, lbfgs_init(fun, x0), it, epsilon=0.0
            )
        )
        x0 = jnp.zeros(d, jnp.float32)
        st = f(x0); sync(st.x)
        best = 1e9
        for t in range(3):
            t0 = time.time(); st = f(x0 + 1e-6 * (t + 1)); sync(st.x)
            best = min(best, time.time() - t0)
        runs[iters] = (best, int(st.k), int(st.n_evals))
    (tlo, klo, elo), (thi, khi, ehi) = runs[lo], runs[hi]
    per = (thi - tlo) / max(khi - klo, 1)
    evs = (ehi - elo) / max(khi - klo, 1)
    print(f"D={d:>9}: {per*1e3:6.2f} ms/iter ({evs:.2f} evals/iter) "
          f"[lo {tlo:.3f}s/{klo}it, hi {thi:.3f}s/{khi}it]", flush=True)

for d in (1_000, 150_000, 2_000_000, 8_350_000, 16_800_000):
    bench(d)
