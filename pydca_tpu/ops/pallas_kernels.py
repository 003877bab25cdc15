"""Pallas TPU kernels for the hot counting ops.

Two kernels cover the reference's two heaviest loops:

- :func:`identity_counts` — the O(N^2 L) all-pairs sequence-identity count
  behind reweighting (``pydca/plmdca/plmdca_numerics.cpp:611-671``): an int8
  one-hot Gram matmul on the MXU with the threshold-compare and row-sum fused
  into the epilogue, so the (N, N) count matrix never leaves VMEM.
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
def _identity_kernel(thr_ref, xi_ref, xj_ref, valid_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    counts = jax.lax.dot_general(
        xi_ref[:],
        xj_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (BI, BJ)
    ind = (counts.astype(jnp.float32) > thr_ref[0, 0]).astype(jnp.int32)
    # valid_ref: (1, BJ) 0/1 column mask — invalid (pad) rows never count
    # as neighbors of anyone
    sim = jnp.sum(ind * valid_ref[:], axis=1, keepdims=True)
    out_ref[:] = out_ref[:] + sim


def identity_counts(
    onehot: jax.Array,
    thr: float,
    *,
    valid: jax.Array | None = None,
    block: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """#{j : identity(i, j) > thr} for every row i.

    ``onehot``: (N, K) int8 one-hot alignment (K = L*q); zero-padded rows
    contribute no matches.  ``valid``: optional (N,) bool mask — rows with
    ``valid = False`` (multi-host shard padding) are excluded from every
    neighbor count.  Returns (N,) int32.
    """
    n, k = onehot.shape
    bi = min(block, _round_up(n, 32))
    npad = _round_up(n, bi)
    kpad = _round_up(k, 128)
    x = jnp.pad(onehot, ((0, npad - n), (0, kpad - k)))
    if valid is None:
        v = jnp.ones((n,), jnp.int32)
    else:
        v = valid.astype(jnp.int32)
    v = jnp.pad(v, (0, npad - n)).reshape(1, npad)
    grid = (npad // bi, npad // bi)
    thr_arr = jnp.array([[thr]], jnp.float32)
    out = pl.pallas_call(
        _identity_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (bi, kpad), lambda i, j: (i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (bi, kpad), lambda i, j: (j, 0), memory_space=pltpu.VMEM
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
