"""In-program cost breakdown of the plm objective on the real TPU.

Host-side timing over the tunnel includes ~10-20 ms dispatch latency per
call, so each candidate is timed as a K-iteration fori_loop INSIDE one jit
(one dispatch, K repetitions) — the per-rep figure is the true in-program
cost.  Components:

  matmul      the (N, Lq) x (Lq, qL) logits matmul alone
  expand      _expand_full + transpose to the matmul operand
  loss        full forward loss
  grad        full value_and_grad (the L-BFGS per-evaluation cost)

Usage: python scripts/profile_plm.py [pf02826|rf00167] [K]
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

DATASETS = {
    "rf00167": ("/root/reference/examples/MSA_RF00167.fa", "rna"),
    "pf02826": ("/root/reference/tests/tests_input/PF02826.faa", "protein"),
}


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "pf02826"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    from pydca_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from pydca_tpu import plm as plm_mod
    from pydca_tpu import read_msa, stats

    msa_file, biomolecule = DATASETS[name]
    msa = read_msa(msa_file, biomolecule)
    l, q = msa.seqs_len, msa.q
    m = jnp.asarray(msa.data, jnp.int32)
    n = m.shape[0]
    w = stats.sequence_weights(m, 0.8, q)
    lam = jnp.float32(0.2 * (l - 1))
    x, maskq = plm_mod._prep_msa(m, l, q, jnp.float32)
    theta0 = plm_mod.init_params(m, w, l, q)
    w2_const = jnp.zeros((l * q, q * l), jnp.float32)

    flops_mm = 2.0 * n * (l * q) * (q * l)

    def timed(label, body, flops_per_rep):
        @jax.jit
        def run(theta):
            def step(i, acc):
                return acc + body(theta + 0.0 * acc)

            return jax.lax.fori_loop(0, k, step, jnp.float32(0))

        run(theta0).block_until_ready()  # compile
        t0 = time.time()
        out = run(theta0)
        out.block_until_ready()
        dt = (time.time() - t0) / k
        tf = flops_per_rep / dt / 1e12
        print(f"{label:8s} {dt * 1e3:8.3f} ms/rep   {tf:7.2f} TFLOP/s")
        return dt

    timed(
        "matmul",
        lambda t: jnp.sum(
            jax.lax.dot_general(
                x, w2_const + t[0],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )[::97, ::31]
        ),
        flops_mm,
    )
    timed(
        "expand",
        lambda t: jnp.sum(
            plm_mod._expand_full(t[l * q :], l, q).transpose(1, 3, 2, 0)[0, 0]
        ),
        0,
    )
    timed(
        "loss",
        lambda t: plm_mod._plm_loss_prepped(t, x, maskq, w, lam, lam, l, q),
        flops_mm,
    )
    grad_fn = jax.value_and_grad(plm_mod._plm_loss_prepped)

    def g_body(t, bf16=False):
        fx, g = grad_fn(t, x, maskq, w, lam, lam, l, q, bf16)
        return fx + g[0]

    timed("grad", g_body, 2 * flops_mm)
    # bf16 variants
    timed(
        "loss16",
        lambda t: plm_mod._plm_loss_prepped(t, x, maskq, w, lam, lam, l, q, True),
        flops_mm,
    )
    timed("grad16", lambda t: g_body(t, True), 2 * flops_mm)


if __name__ == "__main__":
    main()
