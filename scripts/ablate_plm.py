"""Ablation timing of the plm value_and_grad step on PF02826 (real TPU).

Times each pipeline piece as a K-rep fori_loop inside one jit, so tunnel
dispatch latency doesn't pollute the numbers.
"""

import time

import jax
import jax.numpy as jnp

from pydca_tpu import read_msa, stats
from pydca_tpu import plm as plm_mod

PF02826 = "/root/reference/tests/tests_input/PF02826.faa"
REPS = 30


def timed(label, fn, *args):
    jitted = jax.jit(fn)
    jitted(*args).block_until_ready()
    t0 = time.time()
    jitted(*args).block_until_ready()
    dt = (time.time() - t0) / REPS
    print(f"{label:42s} {dt*1e3:8.3f} ms", flush=True)
    return dt


def main():
    msa = read_msa(PF02826, "protein")
    l, q = msa.seqs_len, msa.q
    m = jnp.asarray(msa.data, jnp.int32)
    w = stats.sequence_weights(m, 0.8, q)
    lam = jnp.float32(0.2 * (l - 1))
    x, maskq = plm_mod._prep_msa(m, l, q, jnp.float32)
    theta = plm_mod.init_params(m, w, l, q)
    n = m.shape[0]
    print(f"N={n} L={l} q={q} Lq={l*q}", flush=True)
    flops = 2.0 * n * (l * q) ** 2
    print(f"one matmul = {flops/1e9:.1f} GFLOP; bf16 ideal {flops/197e12*1e3:.3f} ms, f32 ideal {flops/98e12*1e3:.3f} ms", flush=True)

    def loop(body):
        def fn(theta):
            def step(i, acc):
                return acc + body(theta + 0.0 * acc)
            return jax.lax.fori_loop(0, REPS, step, jnp.float32(0))
        return fn

    # 1. expansion alone (fwd)
    def expand_only(t):
        jfull = plm_mod._expand_full(t[l * q:], l, q)
        return jnp.sum(jfull[0, 0])

    timed("expand_full fwd", loop(expand_only), theta)

    # 2. expansion + transpose to w2
    def expand_t(t):
        jfull = plm_mod._expand_full(t[l * q:], l, q)
        w2 = jfull.transpose(1, 3, 2, 0).reshape(l * q, q * l)
        return jnp.sum(w2[0])

    timed("expand + transpose", loop(expand_t), theta)

    # 3. matmul f32 (static w2)
    w2c = jnp.zeros((l * q, q * l), jnp.float32)

    def mm_f32(t):
        return jnp.sum(plm_mod._logits_mm(x, w2c + t[0], False)[:, 0])

    timed("logits matmul f32 (fwd)", loop(mm_f32), theta)

    def mm_bf16(t):
        return jnp.sum(plm_mod._logits_mm(x, w2c + t[0], True)[:, 0])

    timed("logits matmul bf16 (fwd)", loop(mm_bf16), theta)

    # 4. full loss fwd, f32 and bf16
    def loss(t, mm):
        return plm_mod._plm_loss_prepped(t, x, maskq, w, lam, lam, l, q, mm)

    timed("full loss fwd f32", loop(lambda t: loss(t, False)), theta)
    timed("full loss fwd bf16", loop(lambda t: loss(t, True)), theta)

    # 5. value_and_grad, f32 and bf16
    vg32 = jax.value_and_grad(lambda t: loss(t, False))
    vg16 = jax.value_and_grad(lambda t: loss(t, True))
    timed("value_and_grad f32", loop(lambda t: vg32(t)[0] + vg32(t)[1][0]), theta)

    def g16(t):
        f, g = vg16(t)
        return f + g[0]

    def g32(t):
        f, g = vg32(t)
        return f + g[0]

    timed("value_and_grad f32 (single)", loop(g32), theta)
    timed("value_and_grad bf16 (single)", loop(g16), theta)


if __name__ == "__main__":
    main()
