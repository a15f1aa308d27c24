"""Nucleotide substitution models (the baseml model family).

Model enum matches the reference (src/baseml.c:130): JC69 K80 F81 F84
HKY85 T92 TN93 REV UNREST REVu UNRESTu.  JC69..TN93 use the fused
closed-form TN93 kernel; REV/REVu use the batched spectral kernel; UNREST
uses expm.  Q is normalized to mean rate 1 (reference invariant, Appendix B
of SURVEY.md).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.pmat import pmat_expm, pmat_rev, pmat_tn93, tn93_alphas

NUC_MODELS = ["JC69", "K80", "F81", "F84", "HKY85", "T92", "TN93",
              "REV", "UNREST", "REVu", "UNRESTu"]

# number of rate parameters (excluding frequencies / branch lengths)
N_RATE_PARAMS = {"JC69": 0, "K80": 1, "F81": 0, "F84": 1, "HKY85": 1,
                 "T92": 1, "TN93": 2, "REV": 5, "UNREST": 11}

TN93_FAMILY = ("JC69", "K80", "F81", "F84", "HKY85", "T92", "TN93")


def model_pi(model: str, observed: np.ndarray) -> np.ndarray:
    """Equilibrium frequencies used by each model under nhomo=0
    (reference: baseml GetInitials / InitializeBaseAA)."""
    if model in ("JC69", "K80"):
        return np.full(4, 0.25)
    if model == "T92":
        gc = observed[1] + observed[3]          # piC + piG
        return np.array([(1 - gc) / 2, gc / 2, (1 - gc) / 2, gc / 2])
    return np.asarray(observed, dtype=np.float64)


def build_rev_Q(rates5: jnp.ndarray, pi: jnp.ndarray) -> jnp.ndarray:
    """GTR/REV Q with s_AG = 1 fixed; free exchangeabilities fill the
    upper-triangle pairs (T,C),(T,A),(T,G),(C,A),(C,G) in that order
    (reference: eigenQREVbase, src/treesub.c:2488)."""
    a, b, c, d, e = (rates5[i] for i in range(5))
    one = jnp.ones_like(a)
    zero = jnp.zeros_like(a)
    S = jnp.stack([
        jnp.stack([zero, a, b, c]),
        jnp.stack([a, zero, d, e]),
        jnp.stack([b, d, zero, one]),
        jnp.stack([c, e, one, zero]),
    ])
    return normalize_Q(S * pi[None, :], pi)


def build_unrest_Q(rates11: jnp.ndarray) -> jnp.ndarray:
    """UNREST: 11 free off-diagonal rates, Q[G][T] (last off-diagonal in
    row-major order) fixed at 1 (reference: QUNREST, src/treesub.c:2543).
    Normalized with the stationary distribution of Q itself."""
    vals = jnp.concatenate([rates11, jnp.ones((1,), rates11.dtype)])
    Q = jnp.zeros((4, 4), rates11.dtype)
    # fill off-diagonals row-major with vals; the 12th (G->T cell under the
    # reference's ordering) is the fixed reference rate 1
    idx = [(i, j) for i in range(4) for j in range(4) if i != j]
    for k, (i, j) in enumerate(idx):
        Q = Q.at[i, j].set(vals[k])
    Q = Q - jnp.diag(jnp.sum(Q, axis=1))
    # stationary pi of UNREST: left null vector of Q
    pi = stationary_of(Q)
    mr = -jnp.sum(pi * jnp.diag(Q))
    return Q / mr, pi


def stationary_of(Q: jnp.ndarray) -> jnp.ndarray:
    """Stationary distribution: solve pi Q = 0, sum(pi)=1 (reference:
    QtoPi, src/tools.c).  Uses a square solve (replace the last balance
    equation with the normalization) — unlike lstsq/SVD this differentiates
    cleanly even at symmetric parameter points."""
    n = Q.shape[0]
    A = Q.T.at[n - 1, :].set(1.0)
    b = jnp.zeros((n,), Q.dtype).at[n - 1].set(1.0)
    pi = jnp.linalg.solve(A, b)
    return jnp.maximum(pi, 1e-12)


def normalize_Q(Qoff: jnp.ndarray, pi: jnp.ndarray) -> jnp.ndarray:
    """Set diagonal and scale so that -sum_i pi_i Q_ii = 1."""
    Q = Qoff - jnp.diag(jnp.sum(Qoff, axis=1))
    mr = -jnp.sum(pi * jnp.diag(Q))
    return Q / mr


def build_stepmatrix_Q(rates: jnp.ndarray, pi: jnp.ndarray,
                       step: np.ndarray, symmetric: bool):
    """REVu/UNRESTu user-constrained matrices: `step[i,j]` gives the
    1-based free-rate index shared by cell (i,j), 0 meaning the reference
    rate 1 (reference: GetStepMatrix, src/baseml.c:912)."""
    vals = jnp.concatenate([jnp.ones((1,), rates.dtype), rates])
    S = vals[step]                       # [4,4] gather
    S = S.at[jnp.arange(4), jnp.arange(4)].set(0.0)
    if symmetric:
        return normalize_Q(S * pi[None, :], pi)
    Q = S - jnp.diag(jnp.sum(S, axis=1))
    pi_s = stationary_of(Q)
    mr = -jnp.sum(pi_s * jnp.diag(Q))
    return Q / mr, pi_s


def pmats_for_model(model: str, rate_params: jnp.ndarray, pi: jnp.ndarray,
                    ts: jnp.ndarray, step: np.ndarray | None = None):
    """Batched P(t) for every branch/class length in `ts` (any shape).

    Returns P with shape ts.shape + (4, 4), and the root frequencies
    actually implied by the model (same as pi except UNREST).
    """
    if model in TN93_FAMILY:
        a1, a2, b = tn93_alphas(model, pi, rate_params)
        return pmat_tn93(pi, a1, a2, b, ts), pi
    if model == "REV":
        Q = build_rev_Q(rate_params, pi)
        return pmat_rev(Q, pi, ts), pi
    if model == "REVu":
        Q = build_stepmatrix_Q(rate_params, pi, step, symmetric=True)
        return pmat_rev(Q, pi, ts), pi
    if model == "UNREST":
        Q, pi_s = build_unrest_Q(rate_params)
        return pmat_expm(Q, ts), pi_s
    if model == "UNRESTu":
        Q, pi_s = build_stepmatrix_Q(rate_params, pi, step, symmetric=False)
        return pmat_expm(Q, ts), pi_s
    raise ValueError(f"unknown model {model}")
