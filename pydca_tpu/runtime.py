"""Process-level runtime knobs for the CLI entry points.

The CLI model is one command per process (as in the reference), which makes
XLA compile time a first-run tax on every invocation — the streaming plm
program at N=10^5 compiles for minutes.  The persistent compilation cache
amortizes that across processes; subsequent identical-shape runs load the
compiled executable in milliseconds.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

__all__ = ["enable_compilation_cache"]

_DEFAULT_CACHE_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "pydca_tpu", "xla"
)


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Point JAX's persistent compilation cache at a per-user directory.

    Override the location with ``PYDCA_TPU_CACHE_DIR``; set it to the empty
    string to disable.  Safe to call multiple times or before/after jax
    import; failures are logged, never raised.
    """
    env = os.environ.get("PYDCA_TPU_CACHE_DIR")
    if env == "":
        return
    path = cache_dir or env or _DEFAULT_CACHE_DIR
    try:
        import jax

        # TPU only: XLA:CPU persists AOT executables keyed on compile-host
        # machine features and warns of possible SIGILL when they differ
        # from the execution host, so CPU runs are better off recompiling.
        if jax.default_backend() not in ("tpu", "axon"):
            return
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache even small programs: a CLI process compiles a handful of
        # sub-second scoring/extraction jits whose compiles otherwise
        # recur every invocation (cache-warm process walls are the metric)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as exc:  # pragma: no cover - config-name drift
        logger.warning("could not enable the XLA compilation cache: %s", exc)
