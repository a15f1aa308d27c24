import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg

from paml_tpu.core.pmat import pmat_expm, pmat_rev, pmat_tn93, tn93_alphas, tn93_rates
from paml_tpu.models import nuc


def rand_rev_Q(n, seed=0):
    rng = np.random.default_rng(seed)
    pi = rng.dirichlet(np.ones(n))
    S = rng.random((n, n))
    S = S + S.T
    Q = S * pi[None, :]
    np.fill_diagonal(Q, 0)
    np.fill_diagonal(Q, -Q.sum(1))
    mr = -(pi * np.diag(Q)).sum()
    return Q / mr, pi


def test_pmat_rev_matches_expm():
    Q, pi = rand_rev_Q(4, 1)
    ts = jnp.array([0.01, 0.1, 0.5, 2.0])
    P = pmat_rev(jnp.asarray(Q), jnp.asarray(pi), ts)
    for i, t in enumerate(np.asarray(ts)):
        np.testing.assert_allclose(np.asarray(P[i]), scipy.linalg.expm(Q * t),
                                   atol=1e-12)
    # rows sum to 1, detailed balance pi_i P_ij = pi_j P_ji
    np.testing.assert_allclose(np.asarray(P.sum(-1)), 1.0, atol=1e-12)
    PB = np.asarray(P[2])
    np.testing.assert_allclose(pi[:, None] * PB, (pi[:, None] * PB).T, atol=1e-12)


def test_pmat_rev_61state():
    Q, pi = rand_rev_Q(61, 2)
    t = jnp.array([0.3])
    P = pmat_rev(jnp.asarray(Q), jnp.asarray(pi), t)
    np.testing.assert_allclose(np.asarray(P[0]), scipy.linalg.expm(Q * 0.3),
                               atol=1e-10)


def test_pmat_rev_grad_degenerate():
    # JC69 Q has a triple eigenvalue; plain eigh autodiff would NaN here.
    pi = jnp.full(4, 0.25)

    def f(t):
        Q = jnp.full((4, 4), 1.0 / 3.0) - jnp.eye(4) * (1 + 1.0 / 3.0)
        return pmat_rev(Q, pi, jnp.array([t]))[0, 0, 0]

    g = jax.grad(f)(0.2)
    # analytic: P00 = 1/4 + 3/4 exp(-4/3 t); dP00/dt = -exp(-4/3 t)
    np.testing.assert_allclose(float(g), -np.exp(-4.0 / 3.0 * 0.2), atol=1e-9)
    assert np.isfinite(float(g))


def test_pmat_rev_grad_wrt_Q_matches_fd():
    Q, pi = rand_rev_Q(4, 3)
    Q = jnp.asarray(Q)
    pi_j = jnp.asarray(pi)
    t = jnp.array([0.37])

    def f(Q):
        return pmat_rev(Q, pi_j, t).sum() * 1.7

    g = jax.grad(f)(Q)
    eps = 1e-6
    for i, j in [(0, 1), (2, 3), (1, 1)]:
        E = np.zeros((4, 4))
        E[i, j] = eps
        fd = (float(f(Q + E)) - float(f(Q - E))) / (2 * eps)
        np.testing.assert_allclose(float(g[i, j]), fd, rtol=1e-5, atol=1e-7)


def test_tn93_closed_form_vs_spectral():
    pi = jnp.array([0.2, 0.3, 0.35, 0.15])
    a1, a2, b = 4.0, 2.5, 1.0
    ts = jnp.array([0.05, 0.4, 1.3])
    P = pmat_tn93(pi, a1, a2, b, ts)
    # build the equivalent normalized Q and use expm
    a1n, a2n, bn = tn93_rates(pi, jnp.asarray(a1), jnp.asarray(a2), jnp.asarray(b))
    pi_np = np.asarray(pi)
    Q = np.zeros((4, 4))
    rate = np.array([[0, a1n, bn, bn], [a1n, 0, bn, bn],
                     [bn, bn, 0, a2n], [bn, bn, a2n, 0]])
    Q = rate * pi_np[None, :]
    np.fill_diagonal(Q, -Q.sum(1))
    for i, t in enumerate(np.asarray(ts)):
        np.testing.assert_allclose(np.asarray(P[i]), scipy.linalg.expm(Q * t),
                                   atol=1e-12)


def test_k80_f84_conventions():
    # K80 with kappa: transition/transversion rate ratio
    pi = jnp.full(4, 0.25)
    a1, a2, b = tn93_alphas("K80", pi, jnp.array([5.0]))
    assert float(a1) == 5.0 and float(b) == 1.0
    # F84
    pi = jnp.array([0.2, 0.3, 0.35, 0.15])
    a1, a2, b = tn93_alphas("F84", pi, jnp.array([2.0]))
    np.testing.assert_allclose(float(a1), 1 + 2.0 / 0.5)
    np.testing.assert_allclose(float(a2), 1 + 2.0 / 0.5)


def test_unrest_stationary():
    rng = np.random.default_rng(7)
    r = jnp.asarray(rng.random(11) + 0.5)
    Q, pi = nuc.build_unrest_Q(r)
    Qn = np.asarray(Q)
    pin = np.asarray(pi)
    np.testing.assert_allclose(pin @ Qn, 0.0, atol=1e-10)
    np.testing.assert_allclose(-(pin * np.diag(Qn)).sum(), 1.0, atol=1e-10)
    P = pmat_expm(Q, jnp.array([0.2]))
    np.testing.assert_allclose(np.asarray(P[0]), scipy.linalg.expm(Qn * 0.2),
                               atol=1e-9)
