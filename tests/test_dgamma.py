import jax
import jax.numpy as jnp
import numpy as np
import scipy.special as sps
import scipy.stats

from paml_tpu.core.dgamma import (betaincinv, discrete_beta, discrete_gamma,
                                  gammaincinv)


def test_gammaincinv_matches_scipy():
    for a in [0.1, 0.5, 1.0, 2.7, 10.0]:
        for p in [0.01, 0.2, 0.5, 0.8, 0.99]:
            x = float(gammaincinv(jnp.asarray(a), jnp.asarray(p)))
            np.testing.assert_allclose(x, sps.gammaincinv(a, p), rtol=1e-10)


def test_betaincinv_matches_scipy():
    for (p, q) in [(0.5, 0.5), (2.0, 3.0), (0.2, 1.5)]:
        for y in [0.05, 0.3, 0.5, 0.9]:
            x = float(betaincinv(jnp.asarray(p), jnp.asarray(q), jnp.asarray(y)))
            np.testing.assert_allclose(x, sps.betaincinv(p, q, y), rtol=1e-8)


def _ref_discrete_gamma_mean(alpha, K):
    """Independent reimplementation of the reference algorithm
    (src/tools.c:2600) with scipy."""
    beta = alpha
    mean = alpha / beta
    cuts = sps.gammaincinv(alpha, np.arange(1, K) / K) / beta
    F = sps.gammainc(alpha + 1, cuts * beta)
    Fpad = np.concatenate([[0.0], F, [1.0]])
    return np.diff(Fpad) * mean * K


def test_discrete_gamma_mean_method():
    for alpha in [0.1, 0.3, 1.0, 2.5]:
        r, w = discrete_gamma(jnp.asarray(alpha), 5)
        np.testing.assert_allclose(np.asarray(r),
                                   _ref_discrete_gamma_mean(alpha, 5), rtol=1e-9)
        np.testing.assert_allclose(np.asarray(w), 0.2)
        np.testing.assert_allclose(np.asarray(r).mean(), 1.0, rtol=1e-9)


def test_discrete_gamma_median_method():
    alpha, K = 0.7, 4
    r, w = discrete_gamma(jnp.asarray(alpha), K, use_median=True)
    med = sps.gammaincinv(alpha, (2 * np.arange(K) + 1) / (2 * K)) / alpha
    med *= 1.0 * K / med.sum()
    np.testing.assert_allclose(np.asarray(r), med, rtol=1e-9)


def test_discrete_gamma_differentiable():
    g = jax.grad(lambda a: discrete_gamma(a, 5)[0][0])(jnp.asarray(0.5))
    eps = 1e-6
    fd = (_ref_discrete_gamma_mean(0.5 + eps, 5)[0]
          - _ref_discrete_gamma_mean(0.5 - eps, 5)[0]) / (2 * eps)
    np.testing.assert_allclose(float(g), fd, rtol=1e-5)


def test_discrete_beta_median():
    p, q, K = 0.8, 1.7, 10
    x, w = discrete_beta(jnp.asarray(p), jnp.asarray(q), K, use_median=True)
    med = sps.betaincinv(p, q, (np.arange(K) + 0.5) / K)
    med *= (p / (p + q)) * K / med.sum()
    np.testing.assert_allclose(np.asarray(x), med, rtol=1e-7)
