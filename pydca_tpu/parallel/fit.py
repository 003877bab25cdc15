"""Distributed DCA entry points: multi-host init + sequence-sharded fits.

The reference scales with OpenMP threads on one node
(``pydca/plmdca_main.py:77-78``); here the same work shards over a TPU
mesh.  Everything below is thin: data placement + the existing jitted
pipelines — GSPMD inserts the ``psum`` collectives over the ``data`` axis
(the pseudolikelihood and every frequency count are plain sums over
sequences), so the compute code is identical on 1 or N chips.

Multi-host usage (one process per host, e.g. on a pod slice)::

    from pydca_tpu.parallel import init_distributed, fit_plm_sharded
    init_distributed()              # jax.distributed.initialize()
    result = fit_plm_sharded(msa.data, seqid=0.8)

Single-host multi-chip needs no init: ``fit_plm_sharded`` builds the mesh
over the local devices.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import jax.numpy as jnp

from .. import stats
from ..ops.lbfgs import LBFGSResult
from .mesh import Mesh, make_mesh, shard_msa

logger = logging.getLogger(__name__)

__all__ = ["init_distributed", "fit_plm_sharded", "sequence_weights_sharded"]


def init_distributed(**kwargs) -> None:
    """``jax.distributed.initialize`` with logging; idempotent-safe wrapper.

    On TPU pods the coordinator/process ids come from the environment, so a
    bare call is enough; kwargs pass through for manual setups
    (coordinator_address=..., num_processes=..., process_id=...).
    """
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as exc:  # already initialized
        logger.info("jax.distributed already initialized: %s", exc)
    logger.info(
        "distributed runtime: process %d/%d, %d local / %d global devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )


def sequence_weights_sharded(
    mesh: Mesh, msa, seqid: float, q: int
) -> jax.Array:
    """Reweighting with the (N, L) alignment data-parallel over the mesh.

    The identity-count Gram contracts over the replicated L*q axis; each
    device computes its row block against the full alignment (an
    all-gather of the one-hot, inserted by GSPMD), then counts stay local.
    """
    with jax.set_mesh(mesh):
        msa_sharded, _ = shard_msa(mesh, msa)
        n = msa.shape[0]
        # padded rows are all-gap duplicates; restrict to the true N
        w = stats.sequence_weights(msa_sharded[:n], seqid, q)
        return w


def fit_plm_sharded(
    msa,
    *,
    biomolecule_q: Optional[int] = None,
    seqid: float = 0.8,
    lambda_h: Optional[float] = None,
    lambda_j: Optional[float] = None,
    max_iterations: int = 100,
    mesh: Optional[Mesh] = None,
    weights: Optional[jax.Array] = None,
    **fit_kwargs,
) -> LBFGSResult:
    """Sequence-sharded plmDCA fit over a device mesh.

    ``msa``: (N, L) int array; ``biomolecule_q``: number of states
    (default: ``max(msa) + 1``).  Weights are computed on the unsharded
    alignment unless given.  Remaining kwargs pass to
    :func:`pydca_tpu.plm.fit_plm` (checkpointing, chunking, ...).
    """
    from ..plm import fit_plm

    if mesh is None:
        mesh = make_mesh()
    import numpy as np

    msa = np.asarray(msa)
    n, l = msa.shape
    q = int(biomolecule_q) if biomolecule_q else int(msa.max()) + 1
    lam_h = jnp.float32(0.2 * (l - 1) if lambda_h is None else lambda_h)
    lam_j = jnp.float32(0.2 * (l - 1) if lambda_j is None else lambda_j)
    with jax.set_mesh(mesh):
        if weights is None:
            weights = stats.sequence_weights(jnp.asarray(msa, jnp.int32), seqid, q)
        msa_s, w_s = shard_msa(mesh, msa.astype(np.int32), weights)
        return fit_plm(
            msa_s, w_s, lam_h, lam_j, l, q,
            max_iterations=max_iterations, **fit_kwargs,
        )
