"""Pairwise local sequence alignment (Smith-Waterman-Gotoh).

The reference delegates to Biopython ``pairwise2.align.localds``
(``pydca/sequence_backmapper/sequence_backmapper.py:219-228``) — a pure-Python
O(len^2) dynamic program run against *every* MSA sequence during template
search (``sequence_backmapper.py:231-286``), the hot loop of `trim_by_refseq`.

Here the search phase is a JAX kernel: score-only affine-gap local alignment
batched over all N templates at once.  The horizontal-gap recurrence is a
running-max prefix scan, so each DP row is fully vectorized over (template,
column) and the whole search is L_ref scan steps on the VPU.  The single
ref-vs-template traceback runs on the host in NumPy.

Gap cost model (pairwise2 ``localds`` semantics): a gap of length k costs
``open + (k-1)*extend`` (both negative).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["local_align", "batch_local_align_scores"]

_NEG = -1.0e9


def local_align(
    a: np.ndarray, b: np.ndarray, submat: np.ndarray, gap_open: float, gap_extend: float
) -> Tuple[float, int, int, List[Tuple[int, int]]]:
    """Best local alignment of int-encoded sequences ``a`` and ``b``.

    Returns ``(score, a_start, b_start, path)`` where ``path`` is the list of
    per-column operations ``(da, db)`` with ``da, db in {0, 1}`` indicating
    whether the alignment column consumes a residue of ``a`` and/or ``b``
    (1,1 = match/mismatch; 1,0 = gap in b; 0,1 = gap in a), and
    ``a_start``/``b_start`` are the 0-based indices of the first aligned
    residues.
    """
    la, lb = len(a), len(b)
    H = np.zeros((la + 1, lb + 1))
    Ix = np.full((la + 1, lb + 1), _NEG)  # gap in b (vertical, consumes a)
    Iy = np.full((la + 1, lb + 1), _NEG)  # gap in a (horizontal, consumes b)
    sub = submat[np.asarray(a)[:, None], np.asarray(b)[None, :]]

    for i in range(1, la + 1):
        Ix[i, 1:] = np.maximum(H[i - 1, 1:] + gap_open, Ix[i - 1, 1:] + gap_extend)
        diag = np.maximum(np.maximum(H[i - 1, :-1], Ix[i - 1, :-1]), Iy[i - 1, :-1])
        h_row = np.maximum(0.0, diag + sub[i - 1])
        # horizontal prefix-scan: Iy[i,j] = max_k<j H[i,k] + open + (j-1-k)ext
        # H[i, j] depends on row i-1 only, so compute H first, then Iy.
        H[i, 1:] = h_row
        u = H[i, :-1] - np.arange(lb) * gap_extend
        Iy[i, 1:] = gap_open + np.arange(lb) * gap_extend + np.maximum.accumulate(u)

    score = H.max()
    i, j = np.unravel_index(np.argmax(H), H.shape)
    end_i, end_j = int(i), int(j)
    path: List[Tuple[int, int]] = []
    # traceback through H/Ix/Iy until H hits 0
    state = "H"
    while i > 0 and j > 0:
        if state == "H":
            if H[i, j] <= 0:
                break
            diag_best = max(H[i - 1, j - 1], Ix[i - 1, j - 1], Iy[i - 1, j - 1])
            path.append((1, 1))
            if Ix[i - 1, j - 1] == diag_best and H[i - 1, j - 1] != diag_best:
                state = "Ix"
            elif (
                Iy[i - 1, j - 1] == diag_best
                and H[i - 1, j - 1] != diag_best
                and Ix[i - 1, j - 1] != diag_best
            ):
                state = "Iy"
            else:
                state = "H"
            i, j = i - 1, j - 1
        elif state == "Ix":
            path.append((1, 0))
            if Ix[i, j] == H[i - 1, j] + gap_open:
                state = "H"
            i -= 1
        else:  # Iy
            path.append((0, 1))
            if Iy[i, j] == H[i, j - 1] + gap_open:
                state = "H"
            j -= 1
    path.reverse()
    a_start, b_start = int(i), int(j)
    return float(score), a_start, b_start, path


def aligned_strings(
    a_str: str, b_str: str, a_start: int, b_start: int, path
) -> Tuple[str, str]:
    """Render the aligned middle portions of both sequences with '-' gaps."""
    ai, bi = a_start, b_start
    sa, sb = [], []
    for da, db in path:
        sa.append(a_str[ai] if da else "-")
        sb.append(b_str[bi] if db else "-")
        ai += da
        bi += db
    return "".join(sa), "".join(sb)


# ------------------------------------------------------------- batched search
@functools.partial(jax.jit, static_argnames=())
def _batch_scores_impl(ref, temps, submat_ext, gap_open, gap_extend):
    n, w = temps.shape
    ext_j = jnp.arange(w, dtype=jnp.float32) * gap_extend

    def row_step(carry, ai):
        h_prev, ix_prev, iy_prev, best = carry
        sub_row = submat_ext[ai][temps]  # (N, W)
        ix = jnp.maximum(h_prev + gap_open, ix_prev + gap_extend)
        diag_all = jnp.maximum(jnp.maximum(h_prev, ix_prev), iy_prev)
        diag = jnp.pad(diag_all[:, :-1], ((0, 0), (1, 0)), constant_values=0.0)
        h = jnp.maximum(0.0, diag + sub_row)
        # Iy via prefix cummax: max_k<=j-1 (h[k] + open + (j-1-k) ext)
        u = h - ext_j
        cm = jax.lax.cummax(u, axis=1)
        iy = jnp.pad(
            gap_open + ext_j[:-1][None, :] + cm[:, :-1] - 0.0,
            ((0, 0), (1, 0)),
            constant_values=_NEG,
        )
        # note: iy[j] = open + (j-1)*ext + cummax(u)[j-1]; ext_j[:-1] == (j-1)*ext
        best = jnp.maximum(best, jnp.max(h, axis=1))
        return (h, ix, iy, best), None

    init = (
        jnp.zeros((n, w), jnp.float32),
        jnp.full((n, w), _NEG, jnp.float32),
        jnp.full((n, w), _NEG, jnp.float32),
        jnp.zeros((n,), jnp.float32),
    )
    (_, _, _, best), _ = jax.lax.scan(row_step, init, ref)
    return best


def batch_local_align_scores(
    ref: np.ndarray,
    templates_padded: np.ndarray,
    submat: np.ndarray,
    gap_open: float,
    gap_extend: float,
    pad_value: int,
) -> np.ndarray:
    """Score-only local alignment of ``ref`` against N padded templates.

    ``templates_padded`` is (N, W) int with ``pad_value`` marking padding;
    padded positions score -inf so no optimal local path touches them.
    Replaces the reference's per-sequence Biopython ``localds(score_only=True)``
    loop (``sequence_backmapper.py:261-271``).
    """
    q = submat.shape[0]
    submat_ext = np.full((q + 1, q + 1), _NEG, dtype=np.float32)
    submat_ext[:q, :q] = submat
    temps = np.where(templates_padded == pad_value, q, templates_padded)
    scores = _batch_scores_impl(
        jnp.asarray(ref, jnp.int32),
        jnp.asarray(temps, jnp.int32),
        jnp.asarray(submat_ext),
        jnp.float32(gap_open),
        jnp.float32(gap_extend),
    )
    return np.asarray(scores)
