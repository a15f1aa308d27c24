"""Pairwise maximum-likelihood estimation (runmode = -2).

- Codon pairs: Goldman & Yang (1994) ML of (t, kappa, omega) per pair with
  dN/dS decomposition (reference: PairwiseCodon, src/codeml.c:4344; the
  dS/dN algebra follows eigenQcodon mode=2, :3355-3380).
- Amino-acid pairs: ML distance under an empirical model (reference:
  PairwiseAA, src/codeml.c:5034).
- Nucleotide pairwise distances (closed forms, for baseml's distance
  matrices; reference: SeqDivergence, src/treesub.c:1965).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core.optim import maximize
from ..core.pmat import pmat_rev
from ..io import seqio
from ..models import aa as aamod
from ..models import codon as codonmod


@dataclass
class MLPair:
    i: int
    j: int
    t: float
    kappa: float
    omega: float
    lnL: float
    S: float = 0.0
    N: float = 0.0
    dS: float = 0.0
    dN: float = 0.0


def _pair_patterns(data: seqio.PackedData, i: int, j: int):
    """Collapse the pair's site patterns; sites where either sequence is
    ambiguous are dropped (pairwise deletion, the reference behavior for
    unclean data: PairwiseCodon, src/codeml.c:4372)."""
    ok = ((data.tip_partials[i].sum(-1) == 1)
          & (data.tip_partials[j].sum(-1) == 1))
    si = data.tip_partials[i, ok].argmax(-1)
    sj = data.tip_partials[j, ok].argmax(-1)
    key = si * data.nstates + sj
    uniq, inv = np.unique(key, return_inverse=True)
    w = np.bincount(inv, weights=data.fpatt[ok], minlength=len(uniq))
    return (uniq // data.nstates).astype(np.int64), \
        (uniq % data.nstates).astype(np.int64), w


def pairwise_codon(data: seqio.PackedData, codonf: str = "F3x4",
                   icode: int = 0, kappa0: float = 2.0, omega0: float = 0.4,
                   fix_kappa: bool = False) -> list[MLPair]:
    graph = codonmod.codon_graph(icode)
    ls = data.ls

    out = []
    for i in range(data.ns):
        for j in range(i):
            # pair-specific codon frequencies (reference: PairwiseCodon
            # recomputes com.pi from the two sequences, src/codeml.c:4448)
            pm = (data.pos_masks[[i, j]]
                  if data.pos_masks is not None else None)
            fcodon, f3x4, f1x4 = codonmod.count_codon_freqs(
                data.tip_partials[[i, j]], data.fpatt, graph, pm)
            pi_np = codonmod.codon_pi(codonf, fcodon, f3x4, f1x4, graph)
            pf3x4 = codonmod.mg_pf3x4(codonf, f3x4, f1x4)
            pi = jnp.asarray(pi_np)
            logpi = jnp.log(jnp.maximum(pi, 1e-300))
            a, b, w = _pair_patterns(data, i, j)
            aj, bj, wj = jnp.asarray(a), jnp.asarray(b), jnp.asarray(w)

            def neg_lnl(x, aj=aj, bj=bj, wj=wj):
                t, kap, om = x[0], (jnp.asarray(kappa0) if fix_kappa
                                    else x[1]), x[-1]
                s = codonmod.mutation_part(graph, kap, pf3x4)
                Q = codonmod.build_Q(graph, s, om, pi)
                mr = codonmod.mean_rate(graph, s, om, pi)
                P = pmat_rev(Q / mr, pi, t[None])[0]
                lp = (logpi[aj]
                      + jnp.log(jnp.maximum(P[aj, bj], 1e-300)))
                return -jnp.sum(wj * lp)

            nparam = 2 if fix_kappa else 3
            x0 = ([0.5, omega0] if fix_kappa
                  else [0.5, kappa0, omega0])
            bounds = ([(4e-6, 50), (1e-4, 99)] if fix_kappa
                      else [(4e-6, 50), (1e-4, 999), (1e-4, 99)])
            res = maximize(neg_lnl, np.array(x0), bounds)
            t = float(res.x[0])
            kap = kappa0 if fix_kappa else float(res.x[1])
            om = float(res.x[-1])
            # dS/dN decomposition: flux at omega=1 (reference eigenQcodon
            # mode=2: rs0/ra0 site proportions; dS = t*rs/mr / (3 rs0))
            s = codonmod.mutation_part(graph, jnp.asarray(kap), pf3x4)
            rs, ra = codonmod.flux(graph, s, pi)
            rs, ra = float(rs), float(ra)
            mr = rs + om * ra
            p_s = rs / (rs + ra)
            S = p_s * 3 * ls
            N = (1 - p_s) * 3 * ls
            dS = t * (rs / mr) / (3 * p_s)
            dN = t * (om * ra / mr) / (3 * (1 - p_s))
            out.append(MLPair(i=i, j=j, t=t, kappa=kap, omega=om,
                              lnL=res.lnL, S=S, N=N, dS=dS, dN=dN))
    return out


def pairwise_aa(data: seqio.PackedData, aa_model: str = "Empirical_F",
                rate_file: str | None = None) -> list[MLPair]:
    S, pi_np = aamod.model_S_pi(aa_model, rate_file, data.base_freqs)
    Q = jnp.asarray(np.asarray(aamod.build_aa_Q(S, pi_np)))
    pi = jnp.asarray(pi_np)
    logpi = jnp.log(jnp.maximum(pi, 1e-300))
    out = []
    for i in range(data.ns):
        for j in range(i):
            a, b, w = _pair_patterns(data, i, j)
            aj, bj, wj = jnp.asarray(a), jnp.asarray(b), jnp.asarray(w)

            def neg_lnl(x, aj=aj, bj=bj, wj=wj):
                P = pmat_rev(Q, pi, x[0][None])[0]
                lp = logpi[aj] + jnp.log(jnp.maximum(P[aj, bj], 1e-300))
                return -jnp.sum(wj * lp)

            res = maximize(neg_lnl, np.array([0.3]), [(4e-6, 50)])
            out.append(MLPair(i=i, j=j, t=float(res.x[0]), kappa=0.0,
                              omega=0.0, lnL=res.lnL))
    return out


# --- closed-form nucleotide distances (reference: SeqDivergence) ----------

def nuc_distance(data: seqio.PackedData, i: int, j: int,
                 model: str = "K80", alpha: float = 0.0):
    """Pairwise nucleotide distance with optional gamma correction.

    Supported closed forms: JC69, K80, F81, F84, TN93 (reference:
    SeqDivergence, src/treesub.c:1965).  Returns (distance, kappa-ish)."""
    a_st = data.tip_partials[i].argmax(-1)
    b_st = data.tip_partials[j].argmax(-1)
    w = data.fpatt
    n = w.sum()
    F = np.zeros((4, 4))
    np.add.at(F, (a_st, b_st), w)
    F = (F + F.T) / (2 * n)
    P_ts = F[0, 1] + F[2, 3]      # T<->C + A<->G
    P_ts *= 2
    Pdiff = 1 - np.trace(F)
    Q_tv = Pdiff - P_ts
    pi4 = F.sum(1)

    def gam(x, power):
        """(1-x)^{-power} correction: log if alpha==0 else gamma."""
        if x <= 0:
            return np.inf
        if alpha <= 0:
            return -np.log(x)
        return alpha * (x ** (-1 / alpha) - 1)

    if model == "JC69":
        p = Pdiff
        d = 0.75 * gam(1 - 4 * p / 3, 1)
        return d, None
    if model == "K80":
        a = 1 - 2 * P_ts - Q_tv
        b = 1 - 2 * Q_tv
        d = 0.5 * gam(a, 1) + 0.25 * gam(b, 1)
        kap = (0.5 * gam(a, 1) - 0.25 * gam(b, 1)) / max(0.25 * gam(b, 1),
                                                         1e-10)
        return d, kap
    if model == "F81":
        E = 1 - float(pi4 @ pi4)
        d = E * gam(1 - Pdiff / E, 1)
        return d, None
    if model in ("F84", "HKY85", "TN93"):
        from .yn00 import distance_F84
        k, t, se, st = distance_F84(n, P_ts, Q_tv, pi4)
        return t, k
    raise ValueError(f"distance model {model}")


def distance_matrix(data: seqio.PackedData, model="K80", alpha=0.0):
    ns = data.ns
    D = np.zeros((ns, ns))
    for i in range(ns):
        for j in range(i):
            d, _ = nuc_distance(data, i, j, model, alpha)
            D[i, j] = D[j, i] = d
    return D
