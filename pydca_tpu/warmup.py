"""Pre-warm the persistent XLA compilation cache for given problem shapes.

The CLI model is one command per process (reference: ``pydca/mfdca_main.py:299``
runs in seconds because Numba caches its JIT output on disk); here the first
process on a new shape pays the full XLA compile (~15-90 s measured on the
tunneled v5e).  :func:`pydca_tpu.runtime.enable_compilation_cache` makes every
*subsequent* process load compiled executables in milliseconds — this module
fills that cache ahead of time.

Everything below uses AOT ``jit(...).lower(shapes).compile()``: the programs
are traced with the exact shapes/static-arguments the engines use and
compiled into the persistent cache WITHOUT executing (no device data, no
result fetch), so warming a large protein family costs compile time only.

CLI: ``mfdca warmup <biomolecule> <msa>`` / ``plmdca warmup <biomolecule>
<msa> [--max_iterations ...]`` — reading the MSA pins the exact post-dedup
(N, L, q) the real run will trace with.
"""

from __future__ import annotations

import logging
import time
from typing import Optional

logger = logging.getLogger(__name__)

__all__ = ["warmup_meanfield", "warmup_plm"]


def _warn_if_multichip() -> None:
    """Warmup currently compiles the single-device programs.

    With >1 visible device the CLIs default to ``--mesh auto`` and take
    the GSPMD-sharded code paths, whose executables have different cache
    keys — the single-device warm would not be hit.  Make that loud
    instead of silent: warn and point at ``--mesh single``.
    """
    import jax

    try:
        n = jax.device_count()
    except Exception:  # pragma: no cover
        return
    if n > 1:
        logger.warning(
            "%d devices visible: warmup compiles the SINGLE-device "
            "programs, but the CLIs default to --mesh auto (sharded "
            "programs, different cache entries). Run the subsequent "
            "command with --mesh single to use this warm cache, or skip "
            "warmup for multi-chip runs.",
            n,
        )


def _weights_warmup(n: int, l: int, q: int, seqid: float):
    """Compile the standalone sequence-weights program (plm engine stage 1).

    Mirrors the dispatch in :func:`pydca_tpu.stats.sequence_weights`: the
    Pallas kernel above the N crossover on TPU, the blocked-XLA scan below.
    """
    import jax
    import jax.numpy as jnp

    from . import stats

    msa_spec = jax.ShapeDtypeStruct((n, l), jnp.int32)
    thr = float(seqid) * l
    if stats.USE_PALLAS and stats._on_tpu() and n >= stats.PALLAS_MIN_N:
        stats._pallas_counts.lower(msa_spec, thr, q).compile()
    else:
        blk = min(2048, max(8, n))
        stats._sequence_weights_impl.lower(
            msa_spec, jnp.float32(thr), q, blk
        ).compile()


def warmup_meanfield(
    n: int,
    l: int,
    q: int,
    *,
    seqid: float = 0.8,
    pseudocount: float = 0.5,
) -> float:
    """Compile the fused mfDCA pipeline for an (N, L, q) problem; returns
    seconds spent.  The next ``mfdca`` process on the same shapes starts
    cache-warm."""
    import jax.numpy as jnp
    import jax

    from .meanfield import _mf_fused_pipeline

    _warn_if_multichip()
    t0 = time.perf_counter()
    msa_spec = jax.ShapeDtypeStruct((n, l), jnp.int32)
    _mf_fused_pipeline.lower(
        msa_spec, l, q, float(seqid), float(pseudocount), jnp.float32
    ).compile()
    # the CLI also computes weights standalone (metadata Meff header)
    _weights_warmup(n, l, q, seqid)
    dt = time.perf_counter() - t0
    logger.info("mfDCA warmup (N=%d, L=%d, q=%d): %.1f s compile", n, l, q, dt)
    return dt


def warmup_plm(
    n: int,
    l: int,
    q: int,
    *,
    seqid: float = 0.8,
    max_iterations: int = 100,
    chunk_size: Optional[int] = 50,
    m: int = 5,
    seq_block: Optional[int] = None,
    mm_bf16: Optional[bool] = None,
    param_space: str = "auto",
) -> float:
    """Compile the plmDCA programs (weights, L-BFGS init, every chunk-size
    step program the fit will invoke) for an (N, L, q) problem; returns
    seconds spent.  Mirrors :func:`pydca_tpu.plm.fit_plm`'s program
    structure, including the auto-streaming threshold."""
    import jax
    import jax.numpy as jnp

    from . import stats
    from .plm import (
        _plm_lbfgs_state0,
        _plm_lbfgs_steps,
        _resolve_param_space,
        default_mm_bf16,
    )

    if mm_bf16 is None:
        mm_bf16 = default_mm_bf16()
    w2space = _resolve_param_space(param_space, l, q, m, mm_bf16)
    _warn_if_multichip()
    t0 = time.perf_counter()
    _weights_warmup(n, l, q, seqid)

    # auto-streaming threshold mirrors PlmDCA.__init__
    if seq_block is None and 4 * n * l * q > (1 << 30):
        seq_block = max(1024, int((1 << 30) / (4 * l * q)))
    chunked = seq_block is not None
    if chunked:
        nb = -(-n // int(seq_block))
        msa_spec = jax.ShapeDtypeStruct((nb, int(seq_block), l), jnp.int32)
        w_spec = jax.ShapeDtypeStruct((nb, int(seq_block)), jnp.float32)
    else:
        msa_spec = jax.ShapeDtypeStruct((n, l), jnp.int32)
        w_spec = jax.ShapeDtypeStruct((n,), jnp.float32)
    pidx_spec = jax.ShapeDtypeStruct((l, l), jnp.int32)
    lam = jnp.float32(0.2 * (l - 1))

    state_spec = jax.eval_shape(
        lambda msa, w, pidx: _plm_lbfgs_state0(
            msa, w, pidx, lam, lam, l, q, m, chunked, mm_bf16, w2space
        ),
        msa_spec,
        w_spec,
        pidx_spec,
    )
    _plm_lbfgs_state0.lower(
        msa_spec, w_spec, pidx_spec, lam, lam, l, q, m, chunked, mm_bf16,
        w2space,
    ).compile()

    # every distinct num_steps the chunked driver loop will request
    todos = set()
    rem = int(max_iterations)
    step = rem if chunk_size is None else int(chunk_size)
    while rem > 0:
        todo = min(step, rem)
        todos.add(todo)
        rem -= todo
    for todo in sorted(todos):
        _plm_lbfgs_steps.lower(
            state_spec, msa_spec, w_spec, pidx_spec, lam, lam, l, q, todo,
            chunked, mm_bf16, w2space,
        ).compile()
    dt = time.perf_counter() - t0
    logger.info(
        "plmDCA warmup (N=%d, L=%d, q=%d, %d iters%s): %.1f s compile",
        n, l, q, max_iterations,
        f", seq_block={seq_block}" if chunked else "",
        dt,
    )
    return dt
