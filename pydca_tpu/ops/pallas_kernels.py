"""Pallas TPU kernels for the hot counting ops.

Two kernels cover the reference's two heaviest loops:

- :func:`identity_counts` — the O(N^2 L) all-pairs sequence-identity count
  behind reweighting (``pydca/plmdca/plmdca_numerics.cpp:611-671``): takes
  the int8 (N, L) codes and builds one-hot planes IN-KERNEL (q bf16 MXU
  dots per tile pair), with the threshold-compare and row-sum fused into
  the epilogue — neither the (N, L*q) one-hot nor the (N, N) count matrix
  ever exists in HBM.
- :func:`weighted_gram` — the weighted one-hot co-occurrence accumulation
  behind fi/fij/the correlation matrix
  (``pydca/meanfield_dca/msa_numerics.py:182-229``): a tiled
  ``X^T diag(w) X`` with fp32 accumulation in VMEM.

Both run in interpret mode on CPU (used by tests).  :mod:`pydca_tpu.stats`
dispatches to :func:`identity_counts` on TPU for deep alignments (measured on
v5e: 1.6x at N=12.6k, 3.3x at N=50k vs the blocked-XLA path; XLA wins below
~10k rows).  :func:`weighted_gram` is kept as a reference kernel only — a
single XLA ``dot_general`` at HIGHEST precision ties or beats it at every
bundled-dataset size, so stats.py uses the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["identity_counts", "weighted_gram"]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ------------------------------------------------------------ identity counts
def _make_identity_codes_kernel(q: int):
    def kernel(thr_ref, ci_ref, cj_ref, valid_ref, out_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        # (BI, Lpad) int8 codes (pad value -1 matches nothing); widen to
        # int32 in-register — Mosaic on v5e has no int8 vector compare
        ci = ci_ref[:].astype(jnp.int32)
        cj = cj_ref[:].astype(jnp.int32)
        # One-hot is built IN-KERNEL, one state plane at a time: q bf16
        # (BI, Lpad) x (Lpad, BJ) MXU dots accumulate the match counts, so
        # the (N, L*q) one-hot operand never exists anywhere — HBM traffic
        # is the int8 codes alone (q-fold less), and the arithmetic runs at
        # the MXU's native bf16 rate instead of an emulated int8 path.
        # Products are 0/1 and counts <= L, so bf16 x bf16 -> f32 is exact.
        acc = jnp.zeros((ci.shape[0], cj.shape[0]), jnp.float32)
        for s in range(q):
            xi = (ci == s).astype(jnp.bfloat16)
            xj = (cj == s).astype(jnp.bfloat16)
            acc = acc + jax.lax.dot_general(
                xi,
                xj,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        ind = (acc > thr_ref[0, 0]).astype(jnp.int32)
        # valid_ref: (1, BJ) 0/1 column mask — invalid (pad) rows never
        # count as neighbors of anyone
        sim = jnp.sum(ind * valid_ref[:], axis=1, keepdims=True)
        out_ref[:] = out_ref[:] + sim

    return kernel


def identity_counts(
    codes: jax.Array,
    thr: float,
    q: int,
    *,
    valid: jax.Array | None = None,
    block: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """#{j : identity(i, j) > thr} for every row i, from int codes.

    ``codes``: (N, L) integer alignment with states in [0, q).  The one-hot
    expansion happens inside the kernel (see ``_make_identity_codes_kernel``)
    — at N=10^6, L=1000, q=21 the explicit one-hot would be ~21 GB, past
    HBM, while the codes are 1 GB (SURVEY "O(N^2) weighting at 100k+ ...
    never materialized"; reference loop ``plmdca_numerics.cpp:611-671``).
    ``valid``: optional (N,) bool mask — rows with ``valid = False``
    (multi-host shard padding) are excluded from every neighbor count.
    Returns (N,) int32.

    ``block``: 1024 measured fastest on v5e (108 G pairs/s at N=100k,
    L=120, q=5 — 46x the r3 one-hot int8 kernel whose emulated int8
    compare path managed 2.3 G pairs/s); 2048 exceeds the 16 MB scoped
    VMEM (the f32 accumulator tile alone is block^2 * 4 bytes).  The row
    block scales DOWN with sequence length (r4 ADVICE): per-tile VMEM
    grows with Lpad (two int8 code tiles widened to int32 plus the
    per-plane bf16 operands ~ 14 * block * Lpad bytes, plus the 4 * block^2
    f32 accumulator), so a protein-length alignment halves the block until
    the budget fits — validated on-chip at L=1000, N=2x10^5, q=21
    (the BENCH ``weights_200k_protein`` line).
    """
    n, l = codes.shape
    lpad = _round_up(l, 128)
    bi = min(block, _round_up(n, 32))
    # VMEM tile budget: leave headroom under the 16 MiB scoped window
    budget = 12 << 20
    while bi > 128 and 14 * bi * lpad + 4 * bi * bi > budget:
        bi //= 2
    npad = _round_up(n, bi)
    x = jnp.pad(
        codes.astype(jnp.int8),
        ((0, npad - n), (0, lpad - l)),
        constant_values=-1,
    )
    if valid is None:
        v = jnp.ones((n,), jnp.int32)
    else:
        v = valid.astype(jnp.int32)
    v = jnp.pad(v, (0, npad - n)).reshape(1, npad)
    grid = (npad // bi, npad // bi)
    thr_arr = jnp.array([[thr]], jnp.float32)
    out = pl.pallas_call(
        _make_identity_codes_kernel(q),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (bi, lpad), lambda i, j: (i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (bi, lpad), lambda i, j: (j, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, bi), lambda i, j: (0, j), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (bi, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((npad, 1), jnp.int32),
        interpret=interpret,
    )(thr_arr, x, x, v)
    return out[:n, 0]


# --------------------------------------------------------------- weighted gram
def _gram_kernel(xw_ref, x_ref, out_ref):
    nblk = pl.program_id(2)

    @pl.when(nblk == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] = out_ref[:] + jax.lax.dot_general(
        xw_ref[:],
        x_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        # fp32-true accumulation (3-pass bf16 on the MXU): frequency sums feed
        # the covariance inverse, where 1e-3 bf16 noise is visible.
        precision=jax.lax.Precision.HIGHEST,
    )


def weighted_gram(
    onehot: jax.Array,
    weights: jax.Array,
    *,
    block_n: int = 512,
    block_k: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """``X^T diag(w) X`` over a float32 one-hot alignment; returns (K, K).

    Normalization by Meff is left to the caller.
    """
    n, k = onehot.shape
    bn = min(block_n, _round_up(n, 8))
    bk = min(block_k, _round_up(k, 128))
    npad = _round_up(n, bn)
    kpad = _round_up(k, bk)
    x = jnp.pad(onehot.astype(jnp.float32), ((0, npad - n), (0, kpad - k)))
    xw = x * jnp.pad(weights.astype(jnp.float32), (0, npad - n))[:, None]
    grid = (kpad // bk, kpad // bk, npad // bn)
    out = pl.pallas_call(
        _gram_kernel,
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (bn, bk), lambda i, j, nb: (nb, i), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (bn, bk), lambda i, j, nb: (nb, j), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (bk, bk), lambda i, j, nb: (i, j), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((kpad, kpad), jnp.float32),
        interpret=interpret,
    )(xw, x)
    return out[:k, :k]
