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
from jax.scipy.special import gammainc, gammaln


def betainc(a, b, x, n_iter: int = 200):
    """Regularized incomplete beta I_x(a, b) via the standard continued
    fraction (modified Lentz), implemented in JAX so that gradients w.r.t.
    a and b exist (jax.scipy.special.betainc does not define them; the
    reference uses the same CF in CDFBeta, src/tools.c:3065 region).
    """
    a = jnp.asarray(a, jnp.result_type(a, b, x, 0.5))
    b = jnp.asarray(b, a.dtype)
    x = jnp.asarray(x, a.dtype)
    use_sym = x > (a + 1.0) / (a + b + 2.0)
    aa = jnp.where(use_sym, b, a)
    bb = jnp.where(use_sym, a, b)
    xx = jnp.where(use_sym, 1.0 - x, x)
    xx = jnp.clip(xx, 0.0, 1.0 - 1e-16)

    lnfront = (aa * jnp.log(jnp.maximum(xx, 1e-300))
               + bb * jnp.log1p(-xx)
               - jnp.log(aa)
               - (gammaln(aa) + gammaln(bb) - gammaln(aa + bb)))

    tiny = 1e-30
    qab, qap, qam = aa + bb, aa + 1.0, aa - 1.0
    c0 = jnp.ones_like(xx)
    d0 = 1.0 - qab * xx / qap
    d0 = 1.0 / jnp.where(jnp.abs(d0) < tiny, tiny, d0)
    h0 = d0

    def body(m, carry):
        c, d, h = carry
        m = m.astype(xx.dtype)
        aa_num = m * (bb - m) * xx / ((qam + 2.0 * m) * (aa + 2.0 * m))
        d = 1.0 + aa_num * d
        d = 1.0 / jnp.where(jnp.abs(d) < tiny, tiny, d)
        c = 1.0 + aa_num / jnp.where(jnp.abs(c) < tiny, tiny, c)
        h = h * d * c
        aa_num = -(aa + m) * (qab + m) * xx / ((aa + 2.0 * m) * (qap + 2.0 * m))
        d = 1.0 + aa_num * d
        d = 1.0 / jnp.where(jnp.abs(d) < tiny, tiny, d)
        c = 1.0 + aa_num / jnp.where(jnp.abs(c) < tiny, tiny, c)
        h = h * d * c
        return c, d, h

    _, _, h = jax.lax.fori_loop(1, n_iter, body, (c0, d0, h0))
    res = jnp.exp(lnfront) * h
    out = jnp.where(use_sym, 1.0 - res, res)
    return jnp.clip(out, 0.0, 1.0)


def gammaincinv(a: jnp.ndarray, p: jnp.ndarray, n_iter: int = 40) -> jnp.ndarray:
    """Inverse regularized lower incomplete gamma: x with P(a, x) = p.

    Wilson-Hilferty starting point + guarded Newton.  Differentiable
    (iterates through the Newton loop; converged to machine precision the
    final-step derivative equals the implicit derivative).
    """
    a = jnp.asarray(a)
    p = jnp.asarray(p)
    lg = gammaln(a)
    # two initial guesses: Wilson-Hilferty (good for moderate/large a) and
    # the small-x expansion  P(a,x) ~ x^a / Gamma(a+1)  (good for small a
    # where the WH cube is garbage); pick whichever inverts better.
    z = jnp.sqrt(2.0) * jax.scipy.special.erfinv(2.0 * p - 1.0)
    g = 2.0 / (9.0 * a)
    x_wh = jnp.maximum(a * (1.0 - g + z * jnp.sqrt(g)) ** 3, 1e-300)
    x_sm = jnp.exp((jnp.log(p) + gammaln(a + 1.0)) / a)
    err_wh = jnp.abs(gammainc(a, x_wh) - p)
    err_sm = jnp.abs(gammainc(a, x_sm) - p)
    x0 = jnp.where(err_sm < err_wh, x_sm, x_wh)
    # Newton on log CDF in log-space (monotone and well-scaled in the deep
    # lower tail where plain Newton on the CDF oscillates):
    #   h(y) = log P(a, e^y) - log p;  h'(y) = pdf(x) * x / P(a, x)
    y0 = jnp.log(jnp.maximum(x0, 1e-300))
    logp = jnp.log(p)

    def body(_, y):
        x = jnp.exp(y)
        F = jnp.maximum(gammainc(a, x), 1e-300)
        log_pdfx = a * y - x - lg          # log(pdf(x) * x)
        step = (jnp.log(F) - logp) * F * jnp.exp(-log_pdfx)
        step = jnp.clip(step, -2.0, 2.0)
        yn = y - step
        return jnp.where(jnp.isfinite(yn), yn, y)

    y = jax.lax.fori_loop(0, n_iter, body, y0, unroll=4)

    # plain-Newton polish for the last digits
    def polish(_, y):
        x = jnp.exp(y)
        f = gammainc(a, x) - p
        log_dfdy = a * y - x - lg
        step = jnp.clip(f * jnp.exp(-log_dfdy), -1.0, 1.0)
        yn = y - step
        return jnp.where(jnp.isfinite(yn), yn, y)

    return jnp.exp(jax.lax.fori_loop(0, 4, polish, y, unroll=4))


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
    # tiny floor: at extreme alpha the low categories underflow to exactly
    # 0, which puts t=0 branch lengths into the P(t) kernel and breaks
    # second-order autodiff (Hessians for in.BV) via overflowing 1/m
    # adjoint chains; 1e-8 shifts lnL by < 1e-5 even at the alpha bound
    r = jnp.maximum(r, 1e-8)
    return r, jnp.full((K,), 1.0 / K, alpha.dtype)


@jax.custom_jvp
def betaincinv(p_: jnp.ndarray, q_: jnp.ndarray,
               y: jnp.ndarray) -> jnp.ndarray:
    """Inverse regularized incomplete beta via bisection + Newton polish.

    Gradients come from the inverse-function theorem (custom JVP below)
    instead of differentiating through the 65 solver iterations — the
    iteration adjoint divides by pdf values that overflow f32 when the
    beta is boundary-spiked (tiny p, q — exactly where M7/M8 optima sit),
    which produced non-finite f32 gradients on the chip."""
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

    lo, hi = jax.lax.fori_loop(0, 60, bis, (lo, hi))
    x = 0.5 * (lo + hi)
    lnB = gammaln(p_) + gammaln(q_) - gammaln(p_ + q_)

    def newton(_, x):
        f = betainc(p_, q_, x) - y
        logpdf = (p_ - 1) * jnp.log(x) + (q_ - 1) * jnp.log1p(-x) - lnB
        xn = x - f / jnp.maximum(jnp.exp(logpdf), 1e-300)
        xn = jnp.clip(xn, 1e-12, 1 - 1e-12)
        return jnp.where(jnp.isfinite(xn), xn, x)

    return jax.lax.fori_loop(0, 5, newton, x)


@betaincinv.defjvp
def _betaincinv_jvp(primals, tangents):
    """d I^-1(y; p, q) by the inverse-function theorem:
    dx = (dy - I_p dp - I_q dq) / pdf(x), with the pdf clamped so
    boundary-spiked betas give large-but-finite (then clipped) tangents
    rather than f32 overflow."""
    p_, q_, y = primals
    dp, dq, dy = tangents
    x = betaincinv(p_, q_, y)
    dt = x.dtype
    tiny = 1e-10 if dt == jnp.float32 else 1e-14
    cap = 1e8 if dt == jnp.float32 else 1e14
    xc = jnp.clip(x, tiny, 1.0 - tiny)
    lnB = gammaln(p_) + gammaln(q_) - gammaln(p_ + q_)
    logpdf = (p_ - 1) * jnp.log(xc) + (q_ - 1) * jnp.log1p(-xc) - lnB
    pdf = jnp.exp(jnp.clip(logpdf, -80.0, 80.0))
    one = jnp.ones_like(p_)
    dIdp = jax.jvp(lambda a: betainc(a, q_, xc), (p_,), (one,))[1]
    dIdq = jax.jvp(lambda b: betainc(p_, b, xc), (q_,), (one,))[1]
    # primal-side safeguards only (clamped pdf denominator, clipped
    # sensitivities) so the tangent map stays LINEAR in (dp, dq, dy) —
    # reverse mode transposes it automatically
    dIdp = jnp.clip(jnp.nan_to_num(dIdp), -cap, cap)
    dIdq = jnp.clip(jnp.nan_to_num(dIdq), -cap, cap)
    inv_pdf = 1.0 / jnp.maximum(pdf, 1.0 / cap)
    dx = (jnp.zeros_like(x) + dy - dIdp * dp - dIdq * dq) * inv_pdf
    return x, dx


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


def gauss_laguerre(n: int):
    """Gauss-Laguerre nodes/weights for integrals of exp(-x) f(x) on
    [0, inf) (reference: GaussLaguerreRule, src/tools.c:4387, hard-coded
    tables up to order 1024 — here computed via the Golub-Welsch
    eigenvalue method in numpy).  Returns (x [n], w [n])."""
    import numpy as np
    return np.polynomial.laguerre.laggauss(n)


def gamma_expectation_gl(f, alpha: float, beta: float | None = None,
                         n: int = 32):
    """E_{r ~ Gamma(alpha, beta)}[f(r)] by Gauss-Laguerre after the
    substitution x = beta*r weighted by the Gamma(alpha) density tail —
    the reference's continuous-gamma tail handling (basemlg)."""
    import numpy as np
    from scipy.special import gammaln
    beta = alpha if beta is None else beta
    x, w = gauss_laguerre(n)
    # integrand: f(x/beta) * x^{alpha-1} / Gamma(alpha), weight e^{-x}
    lg = gammaln(alpha)
    vals = np.array([f(xi / beta) for xi in x])
    return float((w * vals * np.exp((alpha - 1) * np.log(x) - lg)).sum())
