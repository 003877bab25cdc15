"""Consolidated round-3 TPU probe: run as ONE process (tunnel-friendly).

Sections (each prints timings; select with argv[1] in
{all,ablate,stream,protein}):

1. ablate  — plm value_and_grad ablation on PF02826 (where do the 2 ms go)
2. stream  — 100k-sequence streaming fit: f32 vs bf16, block sizes
3. protein — synthetic L=1000 q=21: mf fused pipeline (20k^2 solve) + one
             plm grad step

No device->host fetch happens until after the first timing block, so the
tunnel's first-fetch penalty does not pollute any measurement
(block_until_ready is not a fetch).
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


def timed(label, fn, *args, reps=REPS):
    jitted = jax.jit(fn)
    jitted(*args).block_until_ready()
    t0 = time.time()
    jitted(*args).block_until_ready()
    dt = (time.time() - t0) / reps
    print(f"{label:44s} {dt*1e3:9.3f} ms", flush=True)
    return dt


def loop(body, reps=REPS):
    def fn(theta):
        def step(i, acc):
            return acc + body(theta + 0.0 * acc)

        return jax.lax.fori_loop(0, reps, step, jnp.float32(0))

    return fn


def section_ablate():
    print("== ablate (PF02826) ==", flush=True)
    msa = read_msa(PF02826, "protein")
    l, q = msa.seqs_len, msa.q
    m = jnp.asarray(msa.data, jnp.int32)
    w = stats.sequence_weights(m, 0.8, q)
    lam = jnp.float32(0.2 * (l - 1))
    x, maskq = plm_mod._prep_msa(m, l, q, jnp.float32)
    theta = plm_mod.init_params(m, w, l, q)
    n = m.shape[0]
    flops = 2.0 * n * (l * q) ** 2
    print(
        f"N={n} L={l} q={q} Lq={l*q}; one matmul {flops/1e9:.1f} GFLOP "
        f"(bf16 ideal {flops/197e12*1e3:.3f} ms, f32 ideal {flops/98e12*1e3:.3f} ms)",
        flush=True,
    )

    def expand_only(t):
        return jnp.sum(plm_mod._expand_full(t[l * q :], l, q)[0, 0])

    timed("expand_full fwd", loop(expand_only), theta)

    def expand_t(t):
        jfull = plm_mod._expand_full(t[l * q :], l, q)
        return jnp.sum(jfull.transpose(1, 3, 2, 0).reshape(l * q, q * l)[0])

    timed("expand + transpose", loop(expand_t), theta)

    w2c = jnp.zeros((l * q, q * l), jnp.float32)

    def mm(t, bf16):
        return jnp.sum(plm_mod._logits_mm(x, w2c + t[0], bf16)[:, 0])

    timed("logits matmul f32 (fwd)", loop(lambda t: mm(t, False)), theta)
    timed("logits matmul bf16 (fwd)", loop(lambda t: mm(t, True)), theta)

    def loss(t, bf):
        return plm_mod._plm_loss_prepped(t, x, maskq, w, lam, lam, l, q, bf)

    timed("full loss fwd f32", loop(lambda t: loss(t, False)), theta)
    timed("full loss fwd bf16", loop(lambda t: loss(t, True)), theta)

    vg32 = jax.value_and_grad(lambda t: loss(t, False))
    vg16 = jax.value_and_grad(lambda t: loss(t, True))

    def g(t, vg):
        f, gr = vg(t)
        return f + gr[0]

    t32 = timed("value_and_grad f32", loop(lambda t: g(t, vg32)), theta)
    t16 = timed("value_and_grad bf16", loop(lambda t: g(t, vg16)), theta)
    print(
        f"MFU bf16peak: f32 {4*0.5*flops/t32/197e12*100:.1f}%  "
        f"bf16 {4*0.5*flops/t16/197e12*100:.1f}%",
        flush=True,
    )

    # ---- A/B variants of the loss epilogue / expansion ----
    def loss_handlse(t, bf):
        """Hand-rolled stable lse (no scipy inf-guard passes)."""
        h = t[: l * q].reshape(l, q)
        jfull = plm_mod._expand_full(t[l * q :], l, q)
        w2 = jfull.transpose(1, 3, 2, 0).reshape(l * q, q * l)
        logits = plm_mod._logits_mm(x, w2, bf).reshape(-1, q, l) + h.T[None]
        mx = jnp.max(logits, axis=1)
        lse = mx + jnp.log(jnp.sum(jnp.exp(logits - mx[:, None, :]), axis=1))
        picked = jnp.sum(jnp.where(maskq, logits, 0), axis=1)
        nll = jnp.sum(w[:, None] * (lse - picked))
        return nll + lam * jnp.sum(h * h) + lam * jnp.sum(t[l * q :] ** 2)

    vgh = jax.value_and_grad(lambda t: loss_handlse(t, True))
    timed("vg bf16 hand-lse", loop(lambda t: g(t, vgh)), theta)

    def loss_nia(t, bf):
        """(N, i, a) logits via direct dot_general on jfull (no w2 copy)."""
        h = t[: l * q].reshape(l, q)
        jfull = plm_mod._expand_full(t[l * q :], l, q)
        x3 = x.reshape(-1, l, q)
        logits = jax.lax.dot_general(
            x3.astype(jnp.bfloat16 if bf else x3.dtype),
            jfull.astype(jnp.bfloat16 if bf else jfull.dtype),
            dimension_numbers=(((1, 2), (1, 3)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + h[None]  # (N, i, a)
        mx = jnp.max(logits, axis=2)
        lse = mx + jnp.log(jnp.sum(jnp.exp(logits - mx[:, :, None]), axis=2))
        mask_nia = jnp.swapaxes(maskq, 1, 2)
        picked = jnp.sum(jnp.where(mask_nia, logits, 0), axis=2)
        nll = jnp.sum(w[:, None] * (lse - picked))
        return nll + lam * jnp.sum(h * h) + lam * jnp.sum(t[l * q :] ** 2)

    vgn = jax.value_and_grad(lambda t: loss_nia(t, True))
    timed("vg bf16 (N,i,a) no-w2-copy", loop(lambda t: g(t, vgn)), theta)

    # sanity: all variants agree
    f0 = loss(theta, False)
    for name, fv in [("hand-lse", loss_handlse(theta, False)),
                     ("nia", loss_nia(theta, False))]:
        rel = abs(float(fv) - float(f0)) / abs(float(f0))
        print(f"variant {name}: rel loss diff {rel:.2e}", flush=True)


def section_stream():
    print("== stream (100k synthetic RNA) ==", flush=True)
    from pydca_tpu.plm import fit_plm

    n, l, q = 100_000, 120, 5
    rng = np.random.default_rng(0)
    base = rng.integers(0, q, size=(64, l))
    msa = base[rng.integers(0, 64, size=n)]
    flip = rng.random((n, l)) < 0.15
    msa = np.where(flip, rng.integers(0, q, size=(n, l)), msa).astype(np.int32)
    m = jnp.asarray(msa)
    t0 = time.time()
    w = stats.sequence_weights(m, 0.8, q)
    w.block_until_ready()
    print(f"weights: {time.time()-t0:.2f}s", flush=True)
    lam = jnp.float32(0.2 * (l - 1))
    for bf16 in (False, True):
        for block in (16384, 32768):
            t0 = time.time()
            r = fit_plm(
                m, w, lam, lam, l, q,
                max_iterations=10, seq_block=block, mm_bf16=bf16,
            )
            r.x.block_until_ready()
            cold = time.time() - t0
            t0 = time.time()
            r = fit_plm(
                m, w, lam, lam, l, q,
                max_iterations=10, seq_block=block, mm_bf16=bf16,
            )
            r.x.block_until_ready()
            warm = time.time() - t0
            thr = 10 * n / warm / 1e6
            print(
                f"stream block={block} bf16={bf16}: cold {cold:6.2f}s "
                f"warm {warm:6.2f}s -> {thr:.3f} M seq-updates/s",
                flush=True,
            )


def section_protein():
    print("== protein scale (L=1000, q=21) ==", flush=True)
    from pydca_tpu.meanfield import _mf_fused_pipeline
    from pydca_tpu.ops import linalg

    n, l, q = 4096, 1000, 21
    rng = np.random.default_rng(1)
    base = rng.integers(0, q, size=(128, l))
    msa = base[rng.integers(0, 128, size=n)]
    flip = rng.random((n, l)) < 0.2
    msa = np.where(flip, rng.integers(0, q, size=(n, l)), msa).astype(np.int32)
    m = jnp.asarray(msa)

    t0 = time.time()
    out = _mf_fused_pipeline(m, l, q, 0.8, 0.5, jnp.float32)
    jax.block_until_ready(out)
    cold = time.time() - t0
    t0 = time.time()
    out = _mf_fused_pipeline(m, l, q, 0.8, 0.5, jnp.float32)
    jax.block_until_ready(out)
    warm = time.time() - t0
    d = l * (q - 1)
    print(
        f"mf fused pipeline N={n}: cold {cold:.2f}s warm {warm:.2f}s "
        f"(C is {d}x{d})",
        flush=True,
    )

    # isolated 20000^2 SPD inverse (substantiates the ops/linalg claim)
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (d, 256), jnp.float32)
    c = a @ a.T + d * jnp.eye(d, dtype=jnp.float32)
    inv = linalg.spd_inverse(c)
    inv.block_until_ready()
    t0 = time.time()
    inv = linalg.spd_inverse(c + 1.0)
    inv.block_until_ready()
    print(f"spd_inverse {d}x{d} warm: {time.time()-t0:.3f}s", flush=True)

    # one plm grad step at protein scale (streaming block)
    from pydca_tpu.plm import fit_plm

    w = stats.sequence_weights(m, 0.8, q)
    lam = jnp.float32(0.2 * (l - 1))
    t0 = time.time()
    r = fit_plm(m, w, lam, lam, l, q, max_iterations=2, seq_block=512)
    r.x.block_until_ready()
    print(f"plm 2 iters (seq_block=512): {time.time()-t0:.2f}s", flush=True)
    mem = jax.devices()[0].memory_stats()
    if mem:
        print(
            f"device memory: peak {mem.get('peak_bytes_in_use', 0)/2**30:.2f} GiB "
            f"of {mem.get('bytes_limit', 0)/2**30:.2f} GiB",
            flush=True,
        )


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    if which in ("all", "ablate"):
        section_ablate()
    if which in ("all", "stream"):
        section_stream()
    if which in ("all", "protein"):
        section_protein()


if __name__ == "__main__":
    main()
