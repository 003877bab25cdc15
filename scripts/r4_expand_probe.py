"""Probe: where the plm step's non-matmul ~0.4 ms goes, and whether a
single-gather transposed expansion beats gather + transpose (VERDICT r3
item 7).

Pieces timed at PF02826 shapes (N=2030, L=195, q=21), fetch-forced, many
reps inside one jit:
  1. full value_and_grad step (baseline MFU reference)
  2. logits matmul alone (w2 fixed)
  3. expansion fwd alone: theta_j -> w2 (gather + transpose, current)
  4. expansion fwd alone: single lax.gather directly into (j,b,a,i)
  5. step with the single-gather expansion wired in
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
    """Time fn as a reps-fori_loop inside one jit; returns seconds/rep.

    The carry consumes a FULL sum of every output leaf — consuming only
    one element lets XLA dead-code-eliminate most of the op under test
    (observed: the logits matmul 'ran' in 0.087 ms).  The extra reduction
    pass costs ~0.05-0.1 ms/rep for 33-67 MB outputs; piece timings are
    therefore slight overestimates.
    """

    @jax.jit
    def run(shift, *a):
        def step(i, acc):
            out = fn(shift + 1e-30 * acc, *a)
            leaves = jax.tree_util.tree_leaves(out)
            return acc + sum(
                jnp.sum(leaf.astype(jnp.float32)) * 1e-30 for leaf in leaves
            )

        return jax.lax.fori_loop(0, reps, step, jnp.float32(0))

    float(run(jnp.float32(0), *args))
    best = 1e9
    for t in range(trials):
        t0 = time.time()
        float(run(jnp.float32(1e-12 * (t + 1)), *args))
        best = min(best, (time.time() - t0) / reps)
    return best


def expand_single_gather(j_flat, l, q):
    """(P, q, q) couplings -> (L*q, q*L) w2 via ONE lax.gather.

    Builds a (2P, q, q) source holding both block orientations, then one
    gather with offset_dims=(1, 2) writes the (j, b, a, i) tensor
    directly — no separate (L, L, q, q) -> transpose round-trip.
    """
    p = l * (l - 1) // 2
    blocks = j_flat.reshape(p, q, q)
    # orientation sources: for i<j w2[(j,b),(a,i)] = J[a,b] -> window [b,a]
    # needs J^T; for i>j it's J_pair(j,i)[b,a] -> window [b,a] = J itself
    src = jnp.concatenate([jnp.swapaxes(blocks, 1, 2), blocks], axis=0)
    pidx = stats.pair_index_matrix(l)  # symmetric (l, l)
    ii = np.arange(l)[:, None]
    jj = np.arange(l)[None, :]
    # row index into src for out batch dims (j, i): element [j_out, i_out]
    idx = np.where(ii < jj, pidx, pidx + p)  # [i_out, j_out]? careful below
    # out[j, b, a, i]: batch dims in order are (j, i) -> indices (l_j, l_i)
    # indices[jb, ib] selects pair (ib, jb): orientation by ib < jb
    sel = np.where(jj < ii, pidx, pidx + p)  # indices[j, i]: i<j -> +p? see note
    # For out[j,:,:,i] with i<j (lower output triangle in (j,i) terms):
    #   w2[(j,b),(a,i)] with i<j = J_(i,j)[a,b] -> window[b,a] of J^T -> src[:p]
    # with i>j: = J_(j,i)[b,a] -> window[b,a] of J -> src[p:]
    sel = np.where(ii > jj, pidx, pidx + p)  # sel[j_out=row dim? ...]
    # indices array dims = (j, i); ii is axis 0 = j, jj axis 1 = i
    # i < j  <=>  jj < ii  -> src[:p] (transposed block)
    sel = np.where(jj < ii, pidx, pidx + p).astype(np.int32)
    gathered = jax.lax.gather(
        src,
        jnp.asarray(sel)[:, :, None],
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2),
            collapsed_slice_dims=(0,),
            start_index_map=(0,),
        ),
        slice_sizes=(1, q, q),
    )  # (l, q, q, l) = (j, b, a, i)
    diag = (np.arange(l)[:, None] == np.arange(l)[None, :])
    mask = jnp.asarray(diag)[:, None, None, :]
    gathered = jnp.where(mask, jnp.zeros((), gathered.dtype), gathered)
    return gathered.reshape(l * q, q * l)


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

    # sanity: single-gather == current expansion
    w2_cur = plm_mod._expand_full(theta[l * q:], l, q).transpose(1, 3, 2, 0).reshape(l * q, q * l)
    w2_new = expand_single_gather(theta[l * q:], l, q)
    err = float(jnp.max(jnp.abs(w2_cur - w2_new)))
    print(f"single-gather max abs err vs current: {err:.3e}", flush=True)

    grad_fn = jax.value_and_grad(plm_mod._plm_loss_prepped)
    dt = timed(
        lambda s: grad_fn(theta + s, x, maskq, w, lam, lam, l, q, False),
        reps=300,
    )
    print(f"1. full step: {dt*1e3:.3f} ms  ({flops/dt/1e12:.1f} model TF/s)", flush=True)

    w2c = w2_cur
    dt = timed(lambda s: plm_mod._logits_mm(x, w2c + s, False), reps=300)
    print(f"2. fwd matmul alone: {dt*1e3:.3f} ms", flush=True)

    tj = theta[l * q:]
    dt = timed(
        lambda s: plm_mod._expand_full(tj + s, l, q).transpose(1, 3, 2, 0).reshape(l * q, q * l),
        reps=300,
    )
    print(f"3. expansion fwd (gather+transpose): {dt*1e3:.3f} ms", flush=True)

    dt = timed(lambda s: expand_single_gather(tj + s, l, q), reps=300)
    print(f"4. expansion fwd (single gather): {dt*1e3:.3f} ms", flush=True)

    # 5. step with single-gather expansion (fwd only replaced; AD through
    # the gather gives a scatter-add backward, so for the full step probe
    # we keep a custom pairing: fwd new, bwd = current custom bwd shape)
    def loss_new(theta_, x_, maskq_, w_, lh, lj):
        h = theta_[: l * q].reshape(l, q)
        w2 = expand_single_gather(theta_[l * q:], l, q)
        logits = plm_mod._logits_mm(x_, w2, False).reshape(-1, q, l) + h.T[None]
        lse = plm_mod._lse_q(logits)
        picked = jnp.sum(jnp.where(maskq_, logits, 0), axis=1)
        nll = jnp.sum(w_[:, None] * (lse - picked))
        return nll + lh * jnp.sum(h * h) + lj * jnp.sum(theta_[l * q:] ** 2)

    grad_new = jax.value_and_grad(loss_new)
    dt = timed(lambda s: grad_new(theta + s, x, maskq, w, lam, lam), reps=300)
    print(f"5. full step, single-gather fwd (AD bwd): {dt*1e3:.3f} ms  ({flops/dt/1e12:.1f} model TF/s)", flush=True)


if __name__ == "__main__":
    main()
