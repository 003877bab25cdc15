"""Probe 2: find the plm step's true matmul ceiling and best formulation.

All operands pre-cast OUTSIDE the timed loop where loop-invariant; every
timed body ends in a full reduction of the real output (no DCE traps).

Timing is fetch-forced (``float(...)`` on the result): on the tunneled axon
backend ``block_until_ready`` can return before remote execution finishes,
and at REPS=30 the ~15-20 ms fixed dispatch+fetch overhead is ~30% of the
wall — use the per-eval deltas between REPS settings, or trust bench.py's
150-rep figures, for absolute rates.
"""
# NOTE (r5): this probe pins the pre-r5 internal API (2-D one-hot /
# (Lq, qL) coupling operands).  The r5 fused loop switched to 3-D one-hot
# and 4-D operands (see plm.py); run this script against the r4 tree
# (git log: "round 4" snapshot) to reproduce its published numbers.

import sys
import os
# run-by-path bootstrap: make the repo root importable regardless of
# PYTHONPATH (which carries the TPU plugin dir on this host)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

import jax
import jax.numpy as jnp

from pydca_tpu import read_msa, stats
from pydca_tpu import plm as plm_mod

PF02826 = "/root/reference/tests/tests_input/PF02826.faa"
REPS = 30


def timed(label, fn, *args):
    jitted = jax.jit(fn)
    float(jitted(*args))  # compile + run-to-host
    t0 = time.time()
    float(jitted(*args))  # fetch forces true completion (see module doc)
    dt = (time.time() - t0) / REPS
    print(f"{label:46s} {dt*1e3:9.3f} ms", flush=True)
    return dt


def loop(body):
    def fn(theta):
        def step(i, acc):
            return acc + body(theta + 0.0 * acc)

        return jax.lax.fori_loop(0, REPS, step, jnp.float32(0))

    return fn


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    msa = read_msa(PF02826, "protein")
    l, q = msa.seqs_len, msa.q
    m = jnp.asarray(msa.data, jnp.int32)
    w = stats.sequence_weights(m, 0.8, q)
    lam = jnp.float32(0.2 * (l - 1))
    n = m.shape[0]
    flops = 2.0 * n * (l * q) ** 2
    print(f"N={n} L={l} q={q}; 1 matmul = {flops/1e9:.1f} GFLOP; "
          f"bf16 ideal {flops/197e12*1e3:.3f} ms", flush=True)

    x32, maskq = plm_mod._prep_msa(m, l, q, jnp.float32)
    x16 = x32.astype(jnp.bfloat16)
    x16_3 = x16.reshape(n, l, q)
    x32_3 = x32.reshape(n, l, q)
    mask_nia = jnp.swapaxes(maskq, 1, 2)
    theta = plm_mod.init_params(m, w, l, q)
    rng = np.random.default_rng(0)
    w2_16 = jnp.asarray(rng.normal(0, 0.1, (l * q, q * l)), jnp.bfloat16)
    w2_32 = w2_16.astype(jnp.float32)
    jfull_16 = jnp.asarray(rng.normal(0, 0.1, (l, l, q, q)), jnp.bfloat16)

    # 1. pure matmul ceilings (operands constant and pre-cast; output summed)
    def mm(xo, wo, prec=None):
        out = jax.lax.dot_general(
            xo, wo, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        return jnp.sum(out)

    t = timed("dot f32xf32 DEFAULT", loop(lambda th: mm(x32 + 0 * th[0], w2_32)), theta)
    print(f"   -> {flops/t/1e12:.1f} TFLOP/s", flush=True)
    t = timed("dot bf16xbf16 precast", loop(lambda th: mm(x16 + 0 * th[:1].astype(jnp.bfloat16)[0], w2_16)), theta)
    print(f"   -> {flops/t/1e12:.1f} TFLOP/s", flush=True)

    def mm4(xo, wo):
        out = jax.lax.dot_general(
            xo, wo, dimension_numbers=(((1, 2), (1, 3)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jnp.sum(out)

    t = timed("dot4 bf16 (N,l,q)x(l,l,q,q)", loop(
        lambda th: mm4(x16_3 + 0 * th[:1].astype(jnp.bfloat16)[0], jfull_16)), theta)
    print(f"   -> {flops/t/1e12:.1f} TFLOP/s", flush=True)

    # 2. candidate production formulation: (N, i, a) logits, bf16 operands
    #    pre-cast x, expand in bf16 (j_flat cast once per eval)
    def loss_nia_bf16(t):
        h = t[: l * q].reshape(l, q)
        jf = plm_mod._expand_full(
            t[l * q :].astype(jnp.bfloat16), l, q
        )  # bf16 gather
        logits = jax.lax.dot_general(
            x16_3, jf, dimension_numbers=(((1, 2), (1, 3)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + h[None]
        mx = jax.lax.stop_gradient(jnp.max(logits, axis=2))
        lse = mx + jnp.log(jnp.sum(jnp.exp(logits - mx[:, :, None]), axis=2))
        picked = jnp.sum(jnp.where(mask_nia, logits, 0), axis=2)
        nll = jnp.sum(w[:, None] * (lse - picked))
        return nll + lam * jnp.sum(h * h) + lam * jnp.sum(t[l * q :] ** 2)

    def g(t, vg):
        f, gr = vg(t)
        return f + gr[0]

    vg_nia16 = jax.value_and_grad(loss_nia_bf16)
    t = timed("vg (N,i,a) bf16 operands", loop(lambda th: g(th, vg_nia16)), theta)
    print(f"   -> model MFU {4*0.5*flops/t/197e12*100:.1f}%", flush=True)

    # 3. same but f32 operands
    def loss_nia_f32(t):
        h = t[: l * q].reshape(l, q)
        jf = plm_mod._expand_full(t[l * q :], l, q)
        logits = jax.lax.dot_general(
            x32_3, jf, dimension_numbers=(((1, 2), (1, 3)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + h[None]
        mx = jax.lax.stop_gradient(jnp.max(logits, axis=2))
        lse = mx + jnp.log(jnp.sum(jnp.exp(logits - mx[:, :, None]), axis=2))
        picked = jnp.sum(jnp.where(mask_nia, logits, 0), axis=2)
        nll = jnp.sum(w[:, None] * (lse - picked))
        return nll + lam * jnp.sum(h * h) + lam * jnp.sum(t[l * q :] ** 2)

    vg_nia32 = jax.value_and_grad(loss_nia_f32)
    t = timed("vg (N,i,a) f32 operands", loop(lambda th: g(th, vg_nia32)), theta)
    print(f"   -> model MFU {4*0.5*flops/t/197e12*100:.1f}%", flush=True)

    # 4. matmul-only vg (no epilogue): upper bound of any formulation
    def loss_mm_only(t):
        jf = plm_mod._expand_full(t[l * q :].astype(jnp.bfloat16), l, q)
        out = jax.lax.dot_general(
            x16_3, jf, dimension_numbers=(((1, 2), (1, 3)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jnp.sum(out * w[:, None, None])

    vg_mm = jax.value_and_grad(loss_mm_only)
    t = timed("vg matmul-only bf16 (+expand)", loop(lambda th: g(th, vg_mm)), theta)
    print(f"   -> model MFU {4*0.5*flops/t/197e12*100:.1f}%", flush=True)

    # correctness of the candidate vs production loss
    f_ref = plm_mod._plm_loss_prepped(theta, x32, maskq, w, lam, lam, l, q)
    f_new = loss_nia_bf16(theta)
    print(f"rel loss diff bf16 candidate: {abs(float(f_new)-float(f_ref))/abs(float(f_ref)):.2e}",
          flush=True)


if __name__ == "__main__":
    main()
