"""Per-stage timing and device profiling.

The reference's only instrumentation is the L-BFGS progress callback printing
``fx, xnorm, gnorm, step`` per iteration under ``--verbose``
(``pydca/plmdca/plmdcaBackend.cpp:130-146``).  This module adds the
observability layer SURVEY.md section 5 specifies for the new framework:
wall-clock stage timers with a run summary (iterations/s, sequences/s), and
an optional ``jax.profiler`` trace context for TPU timeline capture.

Usage::

    timers = StageTimers()
    with timers.stage("weights"):
        w = stats.sequence_weights(...)
        sync(w)
    logger.info("%s", timers.summary())

    with device_trace("/tmp/dca-trace"):   # no-op if profiler unavailable
        fit_plm(...)

End timed regions with :func:`sync`, not ``block_until_ready``: on
remote/tunneled device backends ``block_until_ready`` can return once the
work is *enqueued* server-side rather than executed (observed on the axon
TPU tunnel: warm repeat calls "completing" in 0.1 ms that take 50+ ms when
their value is fetched).  ``sync`` fetches one element of every array leaf
to the host, which cannot complete before the producing computation has.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict, Iterator, List, Optional, Tuple

logger = logging.getLogger(__name__)

__all__ = ["StageTimers", "device_trace", "sync"]


def sync(x):
    """Force completion of ``x`` *visible to the host*; returns ``x``.

    Fetches one element of every array leaf via a SINGLE ``jax.device_get``
    call — O(scalar) transfer per leaf, never the whole array, and one
    host<->device round-trip regardless of leaf count (on the tunneled
    backend each round-trip is ms-scale, so fetching leaves sequentially
    would inflate multi-output timed regions).  Unlike ``block_until_ready``
    this cannot return before the producing remote execution has finished
    (see module docstring), so it is the correct terminator for a timed
    region on any backend.
    """
    import jax

    probes = [
        leaf.ravel()[0]
        for leaf in jax.tree_util.tree_leaves(x)
        if hasattr(leaf, "ravel") and getattr(leaf, "size", 0)
    ]
    if probes:
        jax.device_get(probes)
    return x


class StageTimers:
    """Ordered wall-clock timers keyed by stage name.

    Re-entering a stage accumulates (so per-chunk optimizer calls sum into
    one row).  ``rates`` attaches work counts to stages, and ``summary``
    renders one line per stage with the derived rate.
    """

    def __init__(self) -> None:
        self._elapsed: Dict[str, float] = {}
        self._order: List[str] = []
        self._counts: Dict[str, Tuple[float, str]] = {}

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            if name not in self._elapsed:
                self._order.append(name)
                self._elapsed[name] = 0.0
            self._elapsed[name] += dt

    def add_rate(self, name: str, count: float, unit: str) -> None:
        """Attach a work count to a stage, e.g. ``add_rate("fit", 100, "iters")``."""
        self._counts[name] = (count, unit)

    def elapsed(self, name: str) -> float:
        return self._elapsed.get(name, 0.0)

    @property
    def total(self) -> float:
        return sum(self._elapsed.values())

    def summary(self) -> str:
        if not self._order:
            return "no stages timed"
        width = max(len(n) for n in self._order)
        lines = []
        for name in self._order:
            dt = self._elapsed[name]
            line = f"{name:<{width}}  {dt:9.3f}s"
            if name in self._counts and dt > 0:
                count, unit = self._counts[name]
                line += f"  ({count / dt:,.1f} {unit}/s)"
            lines.append(line)
        lines.append(f"{'total':<{width}}  {self.total:9.3f}s")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]) -> Iterator[None]:
    """``jax.profiler.trace`` context; a no-op when ``log_dir`` is falsy or
    the profiler is unavailable (e.g. tunneled device backends)."""
    if not log_dir:
        yield
        return
    try:
        import jax.profiler as _profiler

        ctx = _profiler.trace(log_dir)
    except Exception as exc:  # pragma: no cover - backend-dependent
        logger.warning("device trace unavailable: %s", exc)
        yield
        return
    with ctx:
        yield
