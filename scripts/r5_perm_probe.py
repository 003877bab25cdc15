"""r5: primitive-level timings for the coupling expansion / pullback redesign.

The compact<->w2 conversions are built from three primitive classes:
row-gathers on (l*l, q*q) views, axis permutations (XLA transpose vs
MXU identity-contraction), and small-block (q,q) swaps.  Time each on
PF02826 shapes (l=195, q=21) to pick the fastest composition.
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from pydca_tpu import stats

L, Q = 195, 21
P = L * (L - 1) // 2
D = P * Q * Q


def timed(fn, *args, reps=200, trials=3):
    @jax.jit
    def run(shift, *a):
        def step(i, acc):
            out = fn(args[0] + shift + 1e-30 * acc, *a[1:])
            leaves = jax.tree_util.tree_leaves(out)
            return acc + sum(
                jnp.vdot(l_.reshape(-1), l_.reshape(-1)).astype(jnp.float32) * 1e-30
                for l_ in leaves
            )
        return jax.lax.fori_loop(0, reps, step, jnp.float32(0))

    float(run(jnp.float32(0), *args))
    best = 1e9
    for t in range(trials):
        t0 = time.time()
        float(run(jnp.float32(1e-12 * (t + 1)), *args))
        best = min(best, (time.time() - t0) / reps)
    return best * 1e3


def main():
    rng = np.random.default_rng(0)
    jflat = jnp.asarray(rng.normal(size=(P, Q, Q)), jnp.float32)
    w4 = jnp.asarray(rng.normal(size=(L, Q, Q, L)), jnp.float32)
    jg = jnp.asarray(rng.normal(size=(L, L, Q, Q)), jnp.float32)
    pidx = np.asarray(stats.pair_index_matrix(L))  # (L, L) sym, diag junk
    iu, ju = np.triu_indices(L, k=1)

    mb = 4 * L * L * Q * Q / 2**20
    print(f"full tensor = {mb:.0f} MiB; pass @ 800GB/s = {mb/2**10/800*1e3:.3f} ms")

    # --- row gathers ---------------------------------------------------
    idx_full = jnp.asarray(pidx.reshape(-1))
    t = timed(lambda j: j.reshape(-1, Q * Q)[idx_full], jflat)
    print(f"G1 row-gather (P,441)->(L*L,441): {t:.3f} ms")

    idx_tri = jnp.asarray(iu * L + ju)
    t = timed(lambda x: x.reshape(L * L, Q * Q)[idx_tri], jg)
    print(f"G2 row-gather (L*L,441)->(P,441): {t:.3f} ms")

    # --- permutations --------------------------------------------------
    t = timed(lambda x: x.transpose(1, 3, 2, 0), jg)  # (l,l,q,q)->(l,q,q,l)
    print(f"T1 XLA transpose (i,j,a,b)->(j,b,a,i): {t:.3f} ms")

    t = timed(lambda x: x.transpose(3, 2, 1, 0), w4)  # mirror
    print(f"T2 XLA transpose (j,b,a,i)->(i,a,b,j) [mirror]: {t:.3f} ms")

    t = timed(lambda x: x.swapaxes(-1, -2), jg)
    print(f"T3 XLA small swap (l,l,q,q) last two: {t:.3f} ms")

    t = timed(lambda x: x.swapaxes(-1, -2), jflat)
    print(f"T4 XLA small swap (P,q,q): {t:.3f} ms")

    eye = jnp.eye(L, dtype=jnp.float32)

    # rotate axis 1 of (l, l, q, q) [j,i,b,a] to the end -> (j, b, a, i)
    def mxu_rot(x, i_mat):
        return jax.lax.dot_general(
            x, i_mat, dimension_numbers=(((1,), (0,)), ((), ()))
        )
    t = timed(mxu_rot, jg, eye)
    print(f"M1 MXU rotate (j,i,b,a)->(j,b,a,i'): {t:.3f} ms")

    # rotate LAST axis of (l,q,q,l) to the front -> (i', j, b, a)
    def mxu_rot2(x, i_mat):
        return jax.lax.dot_general(
            i_mat, x, dimension_numbers=(((1,), (3,)), ((), ()))
        )
    t = timed(mxu_rot2, w4, eye)
    print(f"M2 MXU rotate (j,b,a,i)->(i',j,b,a): {t:.3f} ms")

    # --- flat takes -----------------------------------------------------
    # single-gather expansion: out[j,b,a,i] from flat storage (ref: bad)
    jj, bb, aa, ii = np.meshgrid(
        np.arange(L), np.arange(Q), np.arange(Q), np.arange(L), indexing="ij"
    )
    upper = ii < jj
    pidx_b = pidx[np.minimum(ii, jj), np.maximum(ii, jj)]
    flat_idx = np.where(
        ii == jj,
        P * Q * Q,
        np.where(upper, pidx_b * Q * Q + aa * Q + bb, pidx_b * Q * Q + bb * Q + aa),
    ).reshape(-1)
    flat_idx = jnp.asarray(flat_idx, jnp.int32)
    t = timed(
        lambda j: jnp.concatenate([j.reshape(-1), jnp.zeros(1, j.dtype)])[flat_idx],
        jflat,
    )
    print(f"F1 flat take -> (j,b,a,i): {t:.3f} ms")

    # --- composed candidates -------------------------------------------
    # current production expansion fwd (gather + where + transpose)
    from pydca_tpu import plm as plm_mod
    t = timed(
        lambda j: plm_mod._expand_full(j.reshape(-1), L, Q).transpose(1, 3, 2, 0),
        jflat,
    )
    print(f"C0 current expand fwd (incl. transpose to w2): {t:.3f} ms")

    # E4: both-orientation storage -> one gather -> MXU rotate
    o_idx = np.where(
        np.arange(L)[:, None] > np.arange(L)[None, :],  # j > i -> upper pair
        pidx * 2 + 1,  # transposed orientation slot
        pidx * 2,
    )
    o_idx = np.where(np.eye(L, dtype=bool), 2 * P, o_idx)
    o_idx = jnp.asarray(o_idx.reshape(-1), jnp.int32)

    def e4(j):
        both = jnp.stack([j, j.swapaxes(-1, -2)], axis=1)  # (P, 2, q, q)
        both = jnp.concatenate(
            [both.reshape(2 * P, Q * Q), jnp.zeros((1, Q * Q), j.dtype)]
        )
        g = both[o_idx].reshape(L, L, Q, Q)  # [j, i, b, a] (orientation baked)
        return mxu_rot(g, eye)  # (j, b, a, i)

    t = timed(e4, jflat)
    print(f"C1 E4 expand fwd (swap+gather+MXUrot): {t:.3f} ms")

    # verify E4 == C0
    ref = plm_mod._expand_full(jflat.reshape(-1), L, Q).transpose(1, 3, 2, 0)
    got = e4(jflat)
    err = float(jnp.max(jnp.abs(ref - got)))
    print(f"   E4 max err vs current: {err:.2e}")

    # P3 pullback: MXU rotate + two row gathers + small swap
    idx_ij = jnp.asarray(iu * L + ju)
    idx_ji = jnp.asarray(ju * L + iu)

    def p3(gw2):
        rot = mxu_rot2(gw2, eye)  # (i, j, b, a)
        rows = rot.reshape(L * L, Q * Q)
        d_ba = rows[idx_ij].reshape(P, Q, Q)  # [p, b, a]
        d_ab = rows[idx_ji].reshape(P, Q, Q)  # [p, b, a] of the (j,i) block
        return d_ba.swapaxes(-1, -2) + d_ab

    t = timed(p3, w4)
    print(f"C2 P3 pullback (MXUrot+2 gathers+swap): {t:.3f} ms")

    # current pullback from raw w2 cotangent (chunked-path formulation)
    def p0(gw2):
        gj4 = gw2.reshape(L, Q, Q, L).transpose(3, 0, 2, 1)
        cr = gj4.reshape(L * L, Q, Q)
        return cr[idx_ij] + cr[idx_ji].swapaxes(-1, -2)

    t = timed(p0, w4)
    print(f"C3 current pullback (transpose+2 gathers): {t:.3f} ms")

    # verify p3 == p0
    errp = float(jnp.max(jnp.abs(p0(w4) - p3(w4))))
    print(f"   P3 max err vs current: {errp:.2e}")


if __name__ == "__main__":
    main()
