"""MXU-friendly dense linear algebra for the mean-field solve.

The mean-field engine needs the full inverse of the SPD correlation matrix
``C`` (couplings = -C^{-1}; reference inverts with LU,
``pydca/meanfield_dca/msa_numerics.py:321-342``).  At protein scale
(L=1000 -> C is 20000 x 20000) XLA's triangular solve with a wide
right-hand side is both slow (sequential substitution structure) and
memory-hungry (O(D * rhs) staged temporaries).  Instead we compute

    C^{-1} = L^{-T} L^{-1} = W^T W,   W = L^{-1},

where the triangular inverse W is built by divide and conquer:

    [A 0; B C]^{-1} = [A^{-1} 0; -C^{-1} B A^{-1}, C^{-1}]

so all O(n^3) work lands in large matmuls on the MXU; only the
``block``-sized base cases use a substitution solve.  The final SYRK
``W^T W`` is a single big matmul.  Total ~4/3 n^3 FLOPs of matmul versus
~2 n^3 of substitution-structured triangular solves.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["tri_inv_lower", "spd_inverse"]

_BASE_BLOCK = 1024


def tri_inv_lower(m: jax.Array, block: int = _BASE_BLOCK) -> jax.Array:
    """Inverse of a lower-triangular matrix via matmul-rich divide & conquer."""
    n = m.shape[0]
    # n < 256 cannot produce a valid lane-aligned split (k would leave a
    # sub-128 or negative remainder for custom block < 256): solve directly.
    if n <= block or n < 256:
        return jax.scipy.linalg.solve_triangular(
            m, jnp.eye(n, dtype=m.dtype), lower=True
        )
    # Split at a lane-aligned midpoint so every matmul operand tiles cleanly.
    k = min(max(((n // 2) + 127) // 128 * 128, 128), n - 128)
    a_inv = tri_inv_lower(m[:k, :k], block)
    c_inv = tri_inv_lower(m[k:, k:], block)
    b21 = -c_inv @ (m[k:, :k] @ a_inv)
    top = jnp.concatenate([a_inv, jnp.zeros((k, n - k), m.dtype)], axis=1)
    bot = jnp.concatenate([b21, c_inv], axis=1)
    return jnp.concatenate([top, bot], axis=0)


@functools.partial(jax.jit, static_argnames=("block",))
def spd_inverse(c: jax.Array, block: int = _BASE_BLOCK) -> jax.Array:
    """Inverse of a symmetric positive-definite matrix, ``C^{-1} = W^T W``.

    Cholesky on the full matrix (XLA's blocked kernel), triangular inverse by
    divide & conquer, then one SYRK.  Peak temporary memory is ~3 matrices
    (factor, W, result), versus the O(D * D) staged solve temporaries of a
    wide ``cho_solve``.
    """
    chol = jnp.linalg.cholesky(c)
    w = tri_inv_lower(chol, block)
    inv = w.T @ w
    # Symmetrize to remove accumulation-order asymmetry.
    return 0.5 * (inv + inv.T)
