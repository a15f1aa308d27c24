"""Bounded quasi-Newton optimization of likelihood functions.

The reference uses its own bounded BFGS (`ming2`, src/tools.c:6595) with
finite-difference gradients.  Here gradients are exact via `jax.grad`; the
outer loop is host-side L-BFGS-B (scipy) driving a jitted value-and-grad —
the same host-loop/device-eval structure as the reference, but each
objective evaluation is one fused XLA program.  A fully on-device
optax-L-BFGS path is provided for benchmark loops where host round-trips
dominate.

Parity target is the optimum (same lnL/MLEs), not the trajectory
(SURVEY.md section 7).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class FitResult:
    x: np.ndarray
    lnL: float
    n_eval: int
    converged: bool
    message: str = ""


import os

_RUB_PATH = os.environ.get("PAML_TPU_RUB")   # optimizer trace file (rub)


def set_rub(path: str | None) -> None:
    """Write an optimizer-iteration trace to `path` (the reference's rub
    file, written by ming2's fout argument; Forestry codeml.c:756)."""
    global _RUB_PATH
    _RUB_PATH = path


def maximize(neg_fn: Callable, x0: np.ndarray,
             bounds: list[tuple[float, float]] | None = None,
             tol: float = 1e-9, maxiter: int = 2000,
             multi_start: list[np.ndarray] | None = None) -> FitResult:
    """Maximize a log-likelihood: minimize `neg_fn` (jax scalar function).

    `bounds` as (lo, hi) per parameter (reference bound conventions, e.g.
    branch lengths in [~1e-6, 50], omega in [1e-7, 99]; src/codeml.c:2859).
    """
    from scipy.optimize import minimize

    vg = jax.jit(jax.value_and_grad(neg_fn))
    n_eval = [0]
    rub = open(_RUB_PATH, "a") if _RUB_PATH else None

    def fun(x):
        v, g = vg(jnp.asarray(x))
        n_eval[0] += 1
        v = float(v)
        g = np.asarray(g, dtype=np.float64)
        if not np.isfinite(v):
            v = 1e100
            g = np.where(np.isfinite(g), g, 0.0)
        if rub is not None:
            rub.write(f"{n_eval[0]:6d} {-v:16.6f} "
                      f"{float(np.abs(g).max()):12.5g}\n")
        return v, g

    starts = [np.asarray(x0, dtype=np.float64)]
    if multi_start:
        starts += [np.asarray(s, dtype=np.float64) for s in multi_start]

    opts = {"maxiter": maxiter, "ftol": 1e-14, "gtol": 1e-9,
            "maxcor": 30, "maxls": 50}
    best = None
    for s in starts:
        res = minimize(fun, s, jac=True, method="L-BFGS-B", bounds=bounds,
                       options=opts)
        # restart from the optimum: resets the L-BFGS memory, which
        # reliably escapes line-search stalls on ridged surfaces (the
        # reference gets the same effect from ming2's periodic Hessian
        # resets); stop when a restart no longer improves.
        for _ in range(8):
            res2 = minimize(fun, res.x, jac=True, method="L-BFGS-B",
                            bounds=bounds, options=opts)
            if res2.fun < res.fun - 1e-10 * max(1.0, abs(res.fun)):
                res = res2
            else:
                if res2.fun < res.fun:
                    res = res2
                break
        if best is None or res.fun < best.fun:
            best = res
    if rub is not None:
        rub.close()
    return FitResult(x=np.asarray(best.x), lnL=-float(best.fun),
                     n_eval=n_eval[0], converged=bool(best.success),
                     message=str(best.message))


def maximize_jax(neg_fn: Callable, x0: jnp.ndarray, maxiter: int = 500,
                 tol: float = 1e-10):
    """On-device L-BFGS (optax) — whole optimization under one jit.

    Unbounded: callers must supply transformed (unconstrained) parameters.
    Used by benchmark loops; the scipy path is the parity workhorse.
    """
    import optax

    opt = optax.lbfgs()

    def cond(state):
        _, opt_state, g, it = state
        return (it < maxiter) & (optax.tree.norm(g) > tol)

    def body(state):
        x, opt_state, _, it = state
        val, g = jax.value_and_grad(neg_fn)(x)
        updates, opt_state = opt.update(
            g, opt_state, x, value=val, grad=g, value_fn=neg_fn)
        x = optax.apply_updates(x, updates)
        return x, opt_state, g, it + 1

    @jax.jit
    def run(x0):
        g0 = jax.grad(neg_fn)(x0)
        state = (x0, opt.init(x0), g0, jnp.asarray(0))
        x, _, _, it = jax.lax.while_loop(cond, body, state)
        return x, neg_fn(x), it

    x, v, it = run(x0)
    return x, -v, int(it)


def maximize_jax_bounded(neg_fn: Callable, x0, bounds, maxiter: int = 500,
                         tol: float = 1e-9, dtype=jnp.float32):
    """Whole-fit-on-device bounded optimization: box bounds mapped to an
    unconstrained chart via a scaled sigmoid, then optax L-BFGS under one
    jit (no host round-trip per objective evaluation — the reference's
    ming2 and our scipy path both pay one per eval; on TPU that
    round-trip dominates once an eval is ~ms).

    Returns (x, lnL, n_iter).  For parity-grade optima use the scipy
    path (`maximize`); this path is the wall-time-to-convergence engine.
    """
    lo = jnp.asarray([b[0] for b in bounds], dtype)
    hi = jnp.asarray([b[1] for b in bounds], dtype)
    span = hi - lo
    x0 = jnp.clip(jnp.asarray(x0, dtype), lo + 1e-6 * span,
                  hi - 1e-6 * span)
    y0 = jax.scipy.special.logit((x0 - lo) / span)

    def to_x(y):
        return lo + span * jax.nn.sigmoid(y)

    def neg_y(y):
        return neg_fn(to_x(y))

    y, v, it = _lbfgs_run(neg_y, y0, maxiter, tol)
    return np.asarray(to_x(y)), float(-v), int(it)


def _lbfgs_run(neg_fn, y0, maxiter, tol):
    import optax

    opt = optax.lbfgs()

    def cond(state):
        _, _, g, it = state
        return (it < maxiter) & (optax.tree.norm(g) > tol)

    def body(state):
        y, opt_state, _, it = state
        val, g = jax.value_and_grad(neg_fn)(y)
        updates, opt_state = opt.update(
            g, opt_state, y, value=val, grad=g, value_fn=neg_fn)
        y = optax.apply_updates(y, updates)
        return y, opt_state, g, it + 1

    @jax.jit
    def run(y0):
        g0 = jax.grad(neg_fn)(y0)
        state = (y0, opt.init(y0), g0, jnp.asarray(0))
        y, _, _, it = jax.lax.while_loop(cond, body, state)
        return y, neg_fn(y), it

    return run(y0)


# --- parameter transforms --------------------------------------------------

def simplex_encode(p: jnp.ndarray) -> jnp.ndarray:
    """Proportions p (sum 1, len k) -> unconstrained (len k-1), via log-ratio
    against the last class (replaces the reference's f_and_x transform,
    src/tools.c:1339; same feasible set, different chart)."""
    return jnp.log(p[:-1]) - jnp.log(p[-1])


def simplex_decode(x: jnp.ndarray) -> jnp.ndarray:
    z = jnp.concatenate([x, jnp.zeros((1,), x.dtype)])
    z = z - jax.scipy.special.logsumexp(z)
    return jnp.exp(z)
