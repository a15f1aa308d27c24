"""baseml: maximum likelihood for nucleotide alignments.

TPU-native counterpart of the reference program (src/baseml.c): same model
family and fitting capabilities, built as a single jitted objective
(pattern likelihoods + gamma mixture + closed-form/spectral P(t)) optimized
with exact autodiff gradients (replacing `ming2`'s finite differences,
src/tools.c:6595).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..core import pruning
from ..core.dgamma import discrete_gamma
from ..core.optim import FitResult, maximize
from ..core.topology import Topology, from_treenode
from ..io import seqio, treeio
from ..models import nuc

BLEN_MIN, BLEN_MAX = 4e-6, 50.0
KAPPA_MIN, KAPPA_MAX = 1e-4, 999.0
ALPHA_MIN, ALPHA_MAX = 0.005, 99.0


@dataclass
class BasemlSpec:
    model: str = "JC69"
    ncatG: int = 1               # >1 turns on discrete gamma
    fix_alpha: bool = True
    alpha: float = 0.0
    fix_kappa: bool = False
    kappa: float = 5.0
    cleandata: bool = False
    use_median: bool = False     # discrete-gamma median option
    getSE: bool = False
    step_matrix: np.ndarray | None = None   # REVu/UNRESTu constraints
    n_user_rates: int = 0


@dataclass
class BasemlResult:
    lnL: float
    blens: np.ndarray            # per-branch MLEs, indexed by branch node
    branch_nodes: np.ndarray
    rate_params: np.ndarray
    alpha: float | None
    pi: np.ndarray
    np: int
    topo: Topology = None
    SEs: np.ndarray | None = None
    fit: FitResult = None


def _n_rate_params(spec: BasemlSpec) -> int:
    if spec.model in ("REVu", "UNRESTu"):
        return spec.n_user_rates
    n = nuc.N_RATE_PARAMS[spec.model]
    if spec.fix_kappa and spec.model in ("K80", "F84", "HKY85", "T92"):
        n = 0
    return n


def make_objective(data: seqio.PackedData, topo: Topology, spec: BasemlSpec,
                   dtype=jnp.float64):
    """Build (neg_lnl(x), pack, unpack, x0, bounds)."""
    branch_nodes = topo.branch_nodes()
    nb = len(branch_nodes)
    nr = _n_rate_params(spec)
    est_alpha = spec.ncatG > 1 and not spec.fix_alpha
    n_par = nb + nr + (1 if est_alpha else 0)

    pi_np = nuc.model_pi(spec.model, data.base_freqs)
    pi = jnp.asarray(pi_np, dtype)
    tips = jnp.asarray(data.tip_partials, dtype)
    fpatt = jnp.asarray(data.fpatt, dtype)
    fixed_kappa = jnp.asarray(
        np.atleast_1d(spec.kappa).astype(np.float64), dtype)
    step = spec.step_matrix
    model = spec.model
    K = spec.ncatG
    use_median = spec.use_median
    nnode = topo.nnode
    bn = jnp.asarray(branch_nodes)

    def unpack(x):
        t = x[:nb]
        rates = x[nb:nb + nr] if nr else fixed_kappa
        alpha = x[nb + nr] if est_alpha else jnp.asarray(spec.alpha, dtype)
        return t, rates, alpha

    def neg_lnl(x):
        x = x.astype(dtype)
        t, rates, alpha = unpack(x)
        if K > 1:
            r, w = discrete_gamma(alpha, K, use_median=use_median)
        else:
            r = jnp.ones((1,), dtype)
            w = jnp.ones((1,), dtype)
        # branch x class lengths: [nnode, C]
        tfull = jnp.zeros((nnode,), dtype).at[bn].set(t)
        ts = tfull[:, None] * r[None, :]
        P, pi_root = nuc.pmats_for_model(model, rates, pi, ts, step)
        piC = jnp.broadcast_to(pi_root, (K, 4))
        val = pruning.lnL(P, tips, topo, piC, w, fpatt)
        return -val

    # initial values
    t0 = np.clip(topo.blen0[branch_nodes], 0.0, BLEN_MAX)
    if not (t0 > 0).any():
        t0 = np.full(nb, 0.1)
    t0 = np.maximum(t0, BLEN_MIN * 2)
    x0 = list(t0)
    bounds = [(BLEN_MIN, BLEN_MAX)] * nb
    if nr:
        if model == "TN93":
            x0 += [spec.kappa, spec.kappa]
        elif model in ("REV", "REVu"):
            x0 += [1.0] * (nr - 0)
            if model == "REV":
                x0[nb] = spec.kappa   # TC exchangeability starts near kappa
        elif model in ("UNREST", "UNRESTu"):
            x0 += [1.0] * nr
        else:
            x0 += [spec.kappa]
        bounds += [(KAPPA_MIN, KAPPA_MAX)] * nr
    if est_alpha:
        x0.append(spec.alpha if spec.alpha > 0 else 0.5)
        bounds.append((ALPHA_MIN, ALPHA_MAX))
    return neg_lnl, unpack, np.array(x0), bounds


def fit(seqfile: str, treefile: str, spec: BasemlSpec | None = None,
        tree_index: int = 0, dtype=jnp.float64) -> BasemlResult:
    spec = spec or BasemlSpec()
    aln = seqio.read_alignment(seqfile, seqio.BASE_SEQ)
    data = seqio.pack(aln, cleandata=spec.cleandata)
    trees = treeio.read_trees(treefile, data.names)
    topo = from_treenode(trees[tree_index], data.names)
    return fit_packed(data, topo, spec, dtype=dtype)


def fit_packed(data: seqio.PackedData, topo: Topology,
               spec: BasemlSpec, dtype=jnp.float64) -> BasemlResult:
    neg_lnl, unpack, x0, bounds = make_objective(data, topo, spec, dtype)
    res = maximize(neg_lnl, x0, bounds)
    t, rates, alpha = unpack(jnp.asarray(res.x))
    branch_nodes = topo.branch_nodes()
    ses = None
    if spec.getSE:
        H = jax.hessian(neg_lnl)(jnp.asarray(res.x))
        cov = np.linalg.inv(np.asarray(H))
        ses = np.sqrt(np.maximum(np.diag(cov), 0.0))
    return BasemlResult(
        lnL=res.lnL, blens=np.asarray(t), branch_nodes=branch_nodes,
        rate_params=np.asarray(rates),
        alpha=float(alpha) if (spec.ncatG > 1) else None,
        pi=nuc.model_pi(spec.model, data.base_freqs),
        np=len(res.x), topo=topo, SEs=ses, fit=res)
