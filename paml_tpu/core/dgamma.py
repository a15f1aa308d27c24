"""Discrete-gamma (and discrete-beta) rate heterogeneity, differentiable.

Re-implements the reference's `DiscreteGamma` (src/tools.c:2600) and
`DiscreteBeta` (:2563) in JAX.  The gamma/beta quantile functions are
computed by Newton iteration on the regularized incomplete functions, which
keeps the whole discretization differentiable w.r.t. alpha — the reference
instead uses `QuantileChi2` (src/tools.c:2503) and finite differences.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import betainc, gammainc, gammaln


def gammaincinv(a: jnp.ndarray, p: jnp.ndarray, n_iter: int = 40) -> jnp.ndarray:
    """Inverse regularized lower incomplete gamma: x with P(a, x) = p.

    Wilson-Hilferty starting point + guarded Newton.  Differentiable
    (iterates through the Newton loop; converged to machine precision the
    final-step derivative equals the implicit derivative).
    """
    a = jnp.asarray(a)
    p = jnp.asarray(p)
    # Wilson-Hilferty approximation for chi2 quantile
    z = jnp.sqrt(2.0) * jax.scipy.special.erfinv(2.0 * p - 1.0)
    g = 2.0 / (9.0 * a)
    x0 = a * (1.0 - g + z * jnp.sqrt(g)) ** 3
    x0 = jnp.maximum(x0, 1e-10)
    lg = gammaln(a)

    def body(_, x):
        f = gammainc(a, x) - p
        # pdf of Gamma(a, 1)
        logpdf = (a - 1.0) * jnp.log(x) - x - lg
        step = f / jnp.maximum(jnp.exp(logpdf), 1e-300)
        xn = x - step
        # guard: keep positive, damp huge steps
        xn = jnp.where(xn <= 0, x / 2.0, xn)
        xn = jnp.where(jnp.isfinite(xn), xn, x)
        return xn

    return jax.lax.fori_loop(0, n_iter, body, x0, unroll=4)


def discrete_gamma(alpha: jnp.ndarray, K: int, beta: jnp.ndarray | None = None,
                   use_median: bool = False):
    """K equal-probability gamma rate categories.

    Returns (rates [K], freqs [K]).  Matches the reference convention
    (src/tools.c:2600): mean method by default; median method rescales
    category medians so the overall mean is alpha/beta.
    """
    alpha = jnp.asarray(alpha)
    beta = alpha if beta is None else jnp.asarray(beta)
    mean = alpha / beta
    if K == 1:
        return jnp.ones((1,), alpha.dtype) * mean, jnp.ones((1,), alpha.dtype)
    if use_median:
        q = (2.0 * jnp.arange(K) + 1.0) / (2.0 * K)
        r = gammaincinv(alpha, q) / beta
        r = r * (mean * K / jnp.sum(r))
        return r, jnp.full((K,), 1.0 / K, alpha.dtype)
    # mean method: cut points at quantiles i/K, category means via the
    # incomplete gamma of shape alpha+1
    q = jnp.arange(1, K) / K
    cuts = gammaincinv(alpha, q) / beta                  # [K-1]
    F = gammainc(alpha + 1.0, cuts * beta)               # [K-1]
    Fpad = jnp.concatenate([jnp.zeros((1,), F.dtype), F, jnp.ones((1,), F.dtype)])
    r = (Fpad[1:] - Fpad[:-1]) * mean * K
    return r, jnp.full((K,), 1.0 / K, alpha.dtype)


def betaincinv(p_: jnp.ndarray, q_: jnp.ndarray, y: jnp.ndarray,
               n_iter: int = 60) -> jnp.ndarray:
    """Inverse regularized incomplete beta via bisection + Newton polish."""
    p_ = jnp.asarray(p_, jnp.result_type(p_, 0.5))
    q_ = jnp.asarray(q_, p_.dtype)
    y = jnp.asarray(y, p_.dtype)

    lo = jnp.zeros_like(y) + 1e-12
    hi = jnp.ones_like(y) - 1e-12

    def bis(_, lh):
        lo, hi = lh
        mid = 0.5 * (lo + hi)
        f = betainc(p_, q_, mid)
        lo = jnp.where(f < y, mid, lo)
        hi = jnp.where(f < y, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, n_iter, bis, (lo, hi))
    x = 0.5 * (lo + hi)
    lnB = gammaln(p_) + gammaln(q_) - gammaln(p_ + q_)

    def newton(_, x):
        f = betainc(p_, q_, x) - y
        logpdf = (p_ - 1) * jnp.log(x) + (q_ - 1) * jnp.log1p(-x) - lnB
        xn = x - f / jnp.maximum(jnp.exp(logpdf), 1e-300)
        xn = jnp.clip(xn, 1e-12, 1 - 1e-12)
        return jnp.where(jnp.isfinite(xn), xn, x)

    return jax.lax.fori_loop(0, 5, newton, x)


def discrete_beta(p: jnp.ndarray, q: jnp.ndarray, K: int,
                  use_median: bool = True):
    """K equal-probability beta(p, q) categories (reference:
    src/tools.c:2563).  NSsites M7/M8 use the *median* method
    (reference DiscreteNSsites, src/codeml.c:2846)."""
    p = jnp.asarray(p)
    q = jnp.asarray(q, p.dtype)
    mean = p / (p + q)
    if use_median:
        ys = (jnp.arange(K) + 0.5) / K
        x = betaincinv(p, q, ys)
        x = x * (mean * K / jnp.sum(x))
        return x, jnp.full((K,), 1.0 / K, p.dtype)
    ys = jnp.arange(1, K) / K
    cuts = betaincinv(p, q, ys)
    F = betainc(p + 1.0, q, cuts)
    Fpad = jnp.concatenate([jnp.zeros((1,), F.dtype), F, jnp.ones((1,), F.dtype)])
    x = (Fpad[1:] - Fpad[:-1]) * mean * K
    return x, jnp.full((K,), 1.0 / K, p.dtype)
