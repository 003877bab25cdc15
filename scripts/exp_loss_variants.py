"""Experiment: alternative formulations of the plm loss hot path (TPU).

Variants of the J-expansion + logits matmul, timed in-program (fori_loop
inside one jit, one dispatch):

  A  current: gather -> where(swapaxes) -> transpose -> (N,Lq)x(Lq,qL)
  B  no-w2-transpose: dot_general contracts (j,b) dims of jfull directly
  C  double-gather: gather from j_flat AND a pre-transposed copy, fused
     where (no full-size swapaxes copy), then the standard matmul
"""
# NOTE (r5): this probe pins the pre-r5 internal API (2-D one-hot /
# (Lq, qL) coupling operands).  The r5 fused loop switched to 3-D one-hot
# and 4-D operands (see plm.py); run this script against the r4 tree
# (git log: "round 4" snapshot) to reproduce its published numbers.

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "pf02826"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    from pydca_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pydca_tpu import plm as plm_mod
    from pydca_tpu import read_msa, stats

    files = {
        "rf00167": ("/root/reference/examples/MSA_RF00167.fa", "rna"),
        "pf02826": ("/root/reference/tests/tests_input/PF02826.faa", "protein"),
    }
    msa_file, biomolecule = files[name]
    msa = read_msa(msa_file, biomolecule)
    l, q = msa.seqs_len, msa.q
    m = jnp.asarray(msa.data, jnp.int32)
    n = m.shape[0]
    w = stats.sequence_weights(m, 0.8, q)
    lam = jnp.float32(0.2 * (l - 1))
    x, maskq = plm_mod._prep_msa(m, l, q, jnp.float32)
    x3 = x.reshape(n, l, q)
    theta0 = plm_mod.init_params(m, w, l, q)
    flops = 2.0 * n * (l * q) * (q * l)

    pidx_flat = jnp.asarray(stats.pair_index_matrix(l).reshape(-1))
    ii = np.arange(l)[:, None]
    jj = np.arange(l)[None, :]
    lower = jnp.asarray((ii > jj).reshape(-1))[:, None]
    diag = jnp.asarray((ii == jj).reshape(-1))[:, None]

    def tail(logits_nql, h, t):
        lse = jax.scipy.special.logsumexp(logits_nql, axis=1)
        picked = jnp.sum(jnp.where(maskq, logits_nql, 0), axis=1)
        nll = jnp.sum(w[:, None] * (lse - picked))
        return nll + lam * jnp.sum(h * h) + lam * jnp.sum(t[l * q :] ** 2)

    def loss_a(t):
        return plm_mod._plm_loss_prepped(t, x, maskq, w, lam, lam, l, q)

    def loss_b(t):
        h = t[: l * q].reshape(l, q)
        jfull = plm_mod._expand_full(t[l * q :], l, q)  # (i, j, a, b)
        # contract x3 (n, j, b) against jfull dims (j, b) -> (n, i, a)
        logits = jax.lax.dot_general(
            x3, jfull,
            dimension_numbers=(((1, 2), (1, 3)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (n, i, a)
        logits = logits.transpose(0, 2, 1) + h.T[None]  # (n, a=q, i=L)
        return tail(logits, h, t)

    import functools

    @jax.custom_vjp
    def expand_c(j_flat):
        j2 = j_flat.reshape(-1, q * q)
        j2t = j_flat.reshape(-1, q, q).swapaxes(-1, -2).reshape(-1, q * q)
        g = j2[pidx_flat]   # (l*l, q*q)
        gt = j2t[pidx_flat]
        out = jnp.where(lower, gt, g)
        out = jnp.where(diag, jnp.zeros((), j_flat.dtype), out)
        return out.reshape(l, l, q, q)

    iu, ju = np.triu_indices(l, k=1)

    def expand_c_fwd(j_flat):
        return expand_c(j_flat), None

    def expand_c_bwd(_, ct):
        cr = ct.reshape(l * l, q * q)
        d_ij = cr[jnp.asarray(iu * l + ju)].reshape(-1, q, q)
        d_ji = cr[jnp.asarray(ju * l + iu)].reshape(-1, q, q)
        return ((d_ij + jnp.swapaxes(d_ji, -1, -2)).reshape(-1),)

    expand_c.defvjp(expand_c_fwd, expand_c_bwd)

    def loss_c(t):
        h = t[: l * q].reshape(l, q)
        jfull = expand_c(t[l * q :])
        w2 = jfull.transpose(1, 3, 2, 0).reshape(l * q, q * l)
        logits = jax.lax.dot_general(
            x, w2, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(n, q, l) + h.T[None]
        return tail(logits, h, t)

    def loss_d(t):
        # C-expansion + B-contraction (no transposes at all on the J side)
        h = t[: l * q].reshape(l, q)
        jfull = expand_c(t[l * q :])
        logits = jax.lax.dot_general(
            x3, jfull, dimension_numbers=(((1, 2), (1, 3)), ((), ())),
            preferred_element_type=jnp.float32,
        ).transpose(0, 2, 1) + h.T[None]
        return tail(logits, h, t)

    def timed(label, body, fl):
        @jax.jit
        def run(theta):
            def step(i, acc):
                return acc + body(theta + 0.0 * acc)

            return jax.lax.fori_loop(0, k, step, jnp.float32(0))

        run(theta0).block_until_ready()
        t0 = time.time()
        run(theta0).block_until_ready()
        dt = (time.time() - t0) / k
        print(f"{label:10s} {dt * 1e3:8.3f} ms/rep  {fl / dt / 1e12:7.2f} TFLOP/s")

    for lbl, fn in [("A cur", loss_a), ("B dotg", loss_b), ("C 2gath", loss_c),
                    ("D both", loss_d)]:
        v = float(jax.jit(fn)(theta0))
        print(f"{lbl}: fx={v:.3f}")
        timed(lbl + " loss", fn, flops)
        gf = jax.value_and_grad(fn)
        timed(lbl + " grad", lambda t, gf=gf: gf(t)[0] + gf(t)[1][0], 2 * flops)


if __name__ == "__main__":
    main()
