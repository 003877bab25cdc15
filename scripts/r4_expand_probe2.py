"""Probe 2: honest decomposition of the plm step + XLA-level variants.

All probes consume FULL outputs (vdot) so XLA cannot dead-code-eliminate
the backward (r4 finding: consuming only g[0] silently pruned the
expansion VJP and part of the backward, inflating the r3 MFU numbers).

V0  current step, honest (value_and_grad, full-grad consumption)
V0f current forward only (loss scalar)
V1  w2-as-parameter step (no expansion anywhere): the floor
V1f w2-as-parameter forward only
V2  dot_general directly on the (i,j,a,b) gather output, epilogue on
    (n, i, a) layout (trailing-q reductions — pays lane padding)
V3  V1 + gradient symmetrization transpose (z-space L-BFGS eval cost)
"""
# NOTE (r5): this probe pins the pre-r5 internal API (2-D one-hot /
# (Lq, qL) coupling operands).  The r5 fused loop switched to 3-D one-hot
# and 4-D operands (see plm.py); run this script against the r4 tree
# (git log: "round 4" snapshot) to reproduce its published numbers.

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from pydca_tpu import plm as plm_mod
from pydca_tpu import stats
from pydca_tpu.io.fasta import read_msa
from pydca_tpu.profiling import sync

PF02826 = "/root/reference/tests/tests_input/PF02826.faa"


def timed(fn, *args, reps=300, trials=3):
    @jax.jit
    def run(shift, *a):
        def step(i, acc):
            out = fn(shift + 1e-30 * acc, *a)
            leaves = jax.tree_util.tree_leaves(out)
            return acc + sum(
                jnp.vdot(leaf.reshape(-1), leaf.reshape(-1)).astype(jnp.float32)
                * 1e-30
                for leaf in leaves
            )

        return jax.lax.fori_loop(0, reps, step, jnp.float32(0))

    float(run(jnp.float32(0), *args))
    best = 1e9
    for t in range(trials):
        t0 = time.time()
        float(run(jnp.float32(1e-12 * (t + 1)), *args))
        best = min(best, (time.time() - t0) / reps)
    return best


def main():
    msa = read_msa(PF02826, "protein")
    l, q = msa.seqs_len, msa.q
    m = jnp.asarray(msa.data, jnp.int32)
    n = m.shape[0]
    w = stats.sequence_weights(m, 0.8, q)
    sync(w)
    lam = jnp.float32(0.2 * (l - 1))
    theta = plm_mod.init_params(m, w, l, q)
    rng = np.random.default_rng(0)
    theta = theta + jnp.asarray(
        rng.normal(scale=0.01, size=theta.shape), jnp.float32
    )
    x, maskq = plm_mod._prep_msa(m, l, q, jnp.float32)
    flops = 4.0 * n * (l * q) ** 2

    def report(name, dt, is_step=True):
        tf = flops / dt / 1e12 if is_step else 0.0
        extra = f"  ({tf:.1f} model TF/s, {tf/197*100:.1f}% MFU)" if is_step else ""
        print(f"{name}: {dt*1e3:.3f} ms{extra}", flush=True)

    grad_fn = jax.value_and_grad(plm_mod._plm_loss_prepped)
    report("V0  current step", timed(
        lambda s: grad_fn(theta + s, x, maskq, w, lam, lam, l, q, False)))
    report("V0f current fwd", timed(
        lambda s: plm_mod._plm_loss_prepped(theta + s, x, maskq, w, lam, lam, l, q, False)
    ), is_step=False)

    # ---- V1: w2 as the parameter (h separate) -------------------------
    h0 = theta[: l * q].reshape(l, q)
    w2_0 = plm_mod._expand_full(theta[l * q:], l, q).transpose(1, 3, 2, 0).reshape(l * q, q * l)
    w2_0 = jax.device_put(w2_0)

    def loss_w2(params, x_, maskq_, w_):
        h, w2 = params
        logits = plm_mod._logits_mm(x_, w2, False).reshape(-1, q, l) + h.T[None]
        lse = plm_mod._lse_q(logits)
        picked = jnp.sum(jnp.where(maskq_, logits, 0), axis=1)
        nll = jnp.sum(w_[:, None] * (lse - picked))
        # L2 on w2 counts each pair twice; halve to match theta-space reg
        return nll + lam * jnp.sum(h * h) + 0.5 * lam * jnp.sum(w2 * w2)

    gw2_fn = jax.value_and_grad(loss_w2)
    report("V1  w2-param step", timed(
        lambda s: gw2_fn((h0 + s, w2_0 + s), x, maskq, w)))
    report("V1f w2-param fwd", timed(
        lambda s: loss_w2((h0 + s, w2_0 + s), x, maskq, w)), is_step=False)

    # ---- V2: dot directly on (i,j,a,b), epilogue on (n, i, a) ---------
    def loss_v2(theta_, x_, w_):
        h = theta_[: l * q].reshape(l, q)
        jfull = plm_mod._expand_full(theta_[l * q:], l, q)  # (i, j, a, b)
        x4 = x_.reshape(-1, l, q)
        logits = jax.lax.dot_general(
            x4, jfull,
            dimension_numbers=(((1, 2), (1, 3)), ((), ())),
        ) + h[None]  # (n, i, a)
        mx = jax.lax.stop_gradient(jnp.max(logits, axis=2))
        lse = mx + jnp.log(jnp.sum(jnp.exp(logits - mx[:, :, None]), axis=2))
        maskq2 = m[:, :, None] == jnp.arange(q, dtype=m.dtype)[None, None, :]
        picked = jnp.sum(jnp.where(maskq2, logits, 0), axis=2)
        nll = jnp.sum(w_[:, None] * (lse - picked))
        return nll + lam * jnp.sum(h * h) + lam * jnp.sum(theta_[l * q:] ** 2)

    gv2 = jax.value_and_grad(loss_v2)
    report("V2  (n,i,a) layout step", timed(lambda s: gv2(theta + s, x, w)))

    # ---- V3: V1 + gradient symmetrization (z-space optimizer cost) ----
    def zspace_eval(params, x_, maskq_, w_):
        fx, (gh, gw2) = gw2_fn(params, x_, maskq_, w_)
        # project onto the symmetric-zero-diag subspace
        g4 = gw2.reshape(l, q, q, l)
        gsym = 0.5 * (gw2 + g4.transpose(3, 2, 1, 0).reshape(l * q, q * l))
        return fx, gh, gsym

    report("V3  z-space eval (V1+sym)", timed(
        lambda s: zspace_eval((h0 + s, w2_0 + s), x, maskq, w)))


if __name__ == "__main__":
    main()
