"""Jittable L-BFGS with backtracking line search, as compiled TPU control flow.

Replaces the reference's vendored float32 libLBFGS
(``pydca/plmdca/lbfgs/lib/lbfgs.cpp``, driven from ``plmdcaBackend.cpp:68-75``)
with a pure-JAX implementation: the two-loop recursion runs on fixed-size
``(m, D)`` history buffers, the whole optimization is one ``lax.while_loop``
under ``jit``, and every objective evaluation is the caller's traced function
(for plmDCA: one large MXU matmul plus AD).

Semantics mirrored from libLBFGS / the reference driver:
- convergence when ``||g|| / max(1, ||x||) <= epsilon``  (lbfgs.cpp progress check),
- first-iteration step ``1 / ||d||``, unit step afterwards,
- line search capped at ``max_linesearch`` evaluations with the Armijo
  sufficient-decrease coefficient ``ftol`` (plmdcaBackend.cpp:68-75: m=5,
  epsilon=1e-3, ftol=1e-4, max_linesearch=5),
- a failed line search terminates the optimization but keeps the best point,
  matching pydca's treatment of ``LBFGSERR_ROUNDING_ERROR`` as completion
  (plmdcaBackend.cpp:82-90).

History updates with non-positive curvature ``s.y`` are skipped (standard
cautious update; MoreThuente's curvature condition enforces this implicitly in
the reference).
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "LBFGSResult",
    "LBFGSState",
    "lbfgs_init",
    "lbfgs_steps",
    "lbfgs_minimize",
    "result_from_state",
]


class LBFGSResult(NamedTuple):
    x: jax.Array
    fx: jax.Array
    gnorm: jax.Array
    num_iters: jax.Array
    converged: jax.Array  # True when gradient criterion met
    linesearch_failed: jax.Array


class LBFGSState(NamedTuple):
    """Explicit, serializable optimizer state (a pytree of arrays).

    Exposing the state lets callers run the optimization as a sequence of
    short device programs (host-chunked), checkpoint/resume long runs, and
    log per-chunk progress — the aux subsystems the reference lacks entirely
    (SURVEY.md section 5: checkpoint/resume "none").
    """

    x: jax.Array
    f: jax.Array
    g: jax.Array
    s_hist: jax.Array  # (m, D)
    y_hist: jax.Array  # (m, D)
    rho: jax.Array  # (m,)
    k: jax.Array  # iteration counter
    done: jax.Array
    converged: jax.Array
    ls_failed: jax.Array




def _two_loop(g, s_hist, y_hist, rho, k, m):
    """Two-loop recursion over a circular history buffer.

    Invalid slots carry rho == 0 and contribute nothing (alpha = beta = 0).
    """
    q = g

    def bwd(idx, carry):
        q, alphas = carry
        # iterate newest -> oldest: slot (k - 1 - idx) mod m
        slot = jnp.mod(k - 1 - idx, m)
        a = rho[slot] * jnp.vdot(s_hist[slot], q)
        q = q - a * y_hist[slot]
        return q, alphas.at[slot].set(a)

    q, alphas = jax.lax.fori_loop(0, m, bwd, (q, jnp.zeros(m, g.dtype)))

    # H0 scaling gamma = s.y / y.y from the newest valid pair
    newest = jnp.mod(k - 1, m)
    sy = jnp.vdot(s_hist[newest], y_hist[newest])
    yy = jnp.vdot(y_hist[newest], y_hist[newest])
    gamma = jnp.where((k > 0) & (yy > 0), sy / jnp.maximum(yy, 1e-30), 1.0)
    r = gamma * q

    def fwd(idx, r):
        # iterate oldest -> newest: slot (k - m + idx) mod m
        slot = jnp.mod(k - m + idx, m)
        b = rho[slot] * jnp.vdot(y_hist[slot], r)
        r = r + s_hist[slot] * (alphas[slot] - b)
        return r

    r = jax.lax.fori_loop(0, m, fwd, r)
    return -r


def lbfgs_init(
    fun: Callable[[jax.Array], Tuple[jax.Array, jax.Array]],
    x0: jax.Array,
    *,
    m: int = 5,
    epsilon: float = 1e-3,
) -> LBFGSState:
    """Evaluate ``fun`` at ``x0`` and build the initial optimizer state."""
    dtype = x0.dtype
    d = x0.shape[0]
    f0, g0 = fun(x0)
    init = LBFGSState(
        x=x0,
        f=f0,
        g=g0,
        s_hist=jnp.zeros((m, d), dtype),
        y_hist=jnp.zeros((m, d), dtype),
        rho=jnp.zeros(m, dtype),
        k=jnp.array(0, jnp.int32),
        done=jnp.array(False),
        converged=jnp.array(False),
        ls_failed=jnp.array(False),
    )
    # immediate convergence check (libLBFGS does this before iterating)
    gnorm0 = jnp.linalg.norm(g0)
    xnorm0 = jnp.maximum(jnp.linalg.norm(x0), 1.0)
    return init._replace(
        converged=gnorm0 / xnorm0 <= epsilon, done=gnorm0 / xnorm0 <= epsilon
    )


def lbfgs_steps(
    fun: Callable[[jax.Array], Tuple[jax.Array, jax.Array]],
    state: LBFGSState,
    num_steps: int,
    *,
    epsilon: float = 1e-3,
    ftol: float = 1e-4,
    max_linesearch: int = 5,
    step_shrink: float = 0.5,
) -> LBFGSState:
    """Advance the optimizer by up to ``num_steps`` L-BFGS iterations.

    One traced ``lax.while_loop``; call repeatedly from the host to chunk a
    long optimization into short device programs (progress logging,
    checkpointing, robustness to preempted/long-running device calls).
    """
    m = state.s_hist.shape[0]
    dtype = state.x.dtype
    k_start = state.k

    def cond(st: LBFGSState):
        return jnp.logical_and(~st.done, st.k < k_start + num_steps)

    def body(st: LBFGSState):
        direction = _two_loop(st.g, st.s_hist, st.y_hist, st.rho, st.k, m)
        dnorm = jnp.linalg.norm(direction)
        dg0 = jnp.vdot(st.g, direction)
        # fall back to steepest descent if not a descent direction
        bad_dir = dg0 >= 0
        direction = jnp.where(bad_dir, -st.g, direction)
        dg0 = jnp.where(bad_dir, -jnp.vdot(st.g, st.g), dg0)
        dnorm = jnp.where(bad_dir, jnp.linalg.norm(st.g), dnorm)

        step0 = jnp.where(st.k == 0, 1.0 / jnp.maximum(dnorm, 1e-30), 1.0).astype(dtype)

        # ---------------- backtracking line search (Armijo, <= max_linesearch evals)
        def ls_cond(ls):
            step, fx, gx, xnew, accepted, trials = ls
            return jnp.logical_and(~accepted, trials < max_linesearch)

        def ls_body(ls):
            step, _, _, _, _, trials = ls
            xnew = st.x + step * direction
            fnew, gnew = fun(xnew)
            ok = fnew <= st.f + ftol * step * dg0
            # quadratic interpolation on rejection (clipped to [0.1, 0.5]*step;
            # MoreThuente does cubic — quadratic keeps the same contraction
            # guarantees at a fraction of the bookkeeping)
            denom = fnew - st.f - dg0 * step
            quad = -0.5 * dg0 * step * step / jnp.where(denom == 0, 1.0, denom)
            shrunk = jnp.clip(quad, 0.1 * step, step_shrink * step)
            shrunk = jnp.where(jnp.isfinite(shrunk), shrunk, step_shrink * step)
            next_step = jnp.where(ok, step, shrunk)
            return (next_step, fnew, gnew, xnew, ok, trials + 1)

        step, fnew, gnew, xnew, accepted, trials = jax.lax.while_loop(
            ls_cond,
            ls_body,
            (
                step0,
                st.f,
                st.g,
                st.x,
                jnp.array(False),
                jnp.array(0, jnp.int32),
            ),
        )

        def on_fail(st):
            return st._replace(done=True, ls_failed=True)

        def on_success(st):
            s = xnew - st.x
            y = gnew - st.g
            sy = jnp.vdot(s, y)
            slot = jnp.mod(st.k, m)
            do_update = sy > 1e-10
            s_hist = jnp.where(do_update, st.s_hist.at[slot].set(s), st.s_hist)
            y_hist = jnp.where(do_update, st.y_hist.at[slot].set(y), st.y_hist)
            rho = jnp.where(
                do_update, st.rho.at[slot].set(1.0 / sy), st.rho
            )
            gnorm = jnp.linalg.norm(gnew)
            xnorm = jnp.maximum(jnp.linalg.norm(xnew), 1.0)
            conv = gnorm / xnorm <= epsilon
            return LBFGSState(
                x=xnew,
                f=fnew,
                g=gnew,
                s_hist=s_hist,
                y_hist=y_hist,
                rho=rho,
                k=st.k + 1,
                done=conv,
                converged=conv,
                ls_failed=st.ls_failed,
            )

        return jax.lax.cond(accepted, on_success, on_fail, st)

    return jax.lax.while_loop(cond, body, state)


def result_from_state(state: LBFGSState) -> LBFGSResult:
    return LBFGSResult(
        x=state.x,
        fx=state.f,
        gnorm=jnp.linalg.norm(state.g),
        num_iters=state.k,
        converged=state.converged,
        linesearch_failed=state.ls_failed,
    )


def lbfgs_minimize(
    fun: Callable[[jax.Array], Tuple[jax.Array, jax.Array]],
    x0: jax.Array,
    *,
    m: int = 5,
    max_iterations: int = 100,
    epsilon: float = 1e-3,
    ftol: float = 1e-4,
    max_linesearch: int = 5,
    step_shrink: float = 0.5,
) -> LBFGSResult:
    """Minimize ``fun`` (returning ``(value, grad)``) from ``x0``.

    Single-program form: init + one ``lax.while_loop`` over all iterations.
    ``max_iterations`` counts outer L-BFGS iterations as in the reference's
    knob (``plmdca.py:72``).  For host-chunked execution use
    :func:`lbfgs_init` / :func:`lbfgs_steps`.
    """
    state = lbfgs_init(fun, x0, m=m, epsilon=epsilon)
    state = lbfgs_steps(
        fun,
        state,
        max_iterations,
        epsilon=epsilon,
        ftol=ftol,
        max_linesearch=max_linesearch,
        step_shrink=step_shrink,
    )
    return result_from_state(state)
