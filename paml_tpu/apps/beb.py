"""NEB and BEB site posteriors for positive-selection inference.

NEB (naive empirical Bayes): site-class posteriors at the MLEs
(reference: lfunNSsites_rate, src/codeml.c:5241).

BEB (Bayes empirical Bayes, Yang, Wong & Nielsen 2005): integrates over a
grid prior on the NSsites distribution parameters, reusing per-omega site
likelihoods (reference: lfunNSsites_M2M8, src/codeml.c:6387, grid setup
get_grid_para_like_M2M8 :6234, get_pclassM_iw_M2M8 :6307, ternary
triangle grid GetIndexTernary, src/tools.c).  Supported: M2a and M8.

All grid mixing is vectorized: the 21 (M2a) / 20 (M8) per-omega pattern
likelihoods are computed with one pruning pass (omegas ride the class
axis), and the 10^4-point grid reduces with two einsums.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core import pruning
from ..core.dgamma import betainc
from ..core.topology import Topology
from ..io import seqio
from ..models import codon as codonmod


@dataclass
class SitePosteriors:
    method: str                  # "NEB" or "BEB"
    class_post: np.ndarray       # [K, H] P(class | pattern)
    class_omegas: np.ndarray     # [K] omega per class (NEB) or None
    mean_w: np.ndarray           # [H] posterior mean omega per pattern
    se_w: np.ndarray | None      # [H] posterior sd (BEB)
    p_positive: np.ndarray       # [H] P(omega > 1 | pattern)


def _per_omega_loglik(data: seqio.PackedData, topo: Topology, spec,
                      x_mle, omegas, qfactor, dtype=jnp.float64):
    """log f(x_h | w) for each w in `omegas`, with branch lengths, kappa
    and the mixture Q-scale frozen at the MLE.  Returns [K, H]."""
    graph = codonmod.codon_graph(spec.icode)
    fcodon, f3x4, f1x4 = codonmod.count_codon_freqs(
        data.tip_partials, data.fpatt, graph, data.pos_masks)
    pi_np = codonmod.codon_pi(spec.codonf, fcodon, f3x4, f1x4, graph)
    pf3x4 = codonmod.mg_pf3x4(spec.codonf, f3x4, f1x4)
    pi = jnp.asarray(pi_np, dtype)
    tips = jnp.asarray(data.tip_partials, dtype)
    branch_nodes = topo.branch_nodes()
    nb = len(branch_nodes)
    t = jnp.asarray(x_mle[:nb], dtype)
    nkappa = 0 if spec.fix_kappa else (5 if spec.hkyREV else 1)
    kappa = (jnp.asarray(x_mle[nb:nb + nkappa], dtype) if nkappa
             else jnp.asarray([spec.kappa], dtype))

    s = codonmod.mutation_part(graph, kappa if spec.hkyREV else kappa[0],
                               pf3x4, spec.hkyREV, dtype)
    omegas = jnp.asarray(omegas, dtype)
    Qs = jax.vmap(lambda w: codonmod.build_Q(graph, s, w, pi))(omegas)
    tfull = jnp.zeros((topo.nnode,), dtype).at[jnp.asarray(branch_nodes)].set(t)
    ts = tfull[:, None] * jnp.asarray(qfactor, dtype)        # [nnode, 1]
    ts = jnp.broadcast_to(ts, (topo.nnode, len(omegas)))
    from ..core.pmat import pmat_rev, pmat_rev_multi
    P = pmat_rev_multi(Qs, pi, ts)
    piC = jnp.broadcast_to(pi, (len(omegas), graph.n))
    lnf = pruning.class_site_lnf(P, tips, topo, piC)          # [K, H]
    return np.asarray(lnf), pi_np


def _mle_qfactor(spec, res, graph_pi):
    """Qfactor_NS at the MLE: 1 / (rs + ra * mean_omega)."""
    W = res.params["W"]
    freqs = res.params["freqs"]
    return float((W * freqs[None, :]).sum(1)[0])   # model 0 only


def neb(data: seqio.PackedData, topo: Topology, spec, res,
        dtype=jnp.float64) -> SitePosteriors:
    """NEB site-class posteriors at the MLEs (model 0 NSsites)."""
    from .codeml import make_codon_objective
    neg_lnl, unpack, classes_for, *_ = make_codon_objective(
        data, topo, spec, dtype)
    x = jnp.asarray(res.x)
    t, kappa, _ppi, theta = unpack(x)
    W, freqs, _ = classes_for(theta)
    omegas = np.asarray(W).reshape(-1)
    wbar = float((np.asarray(W) * np.asarray(freqs)[None, :]).sum(1)[0])

    graph = codonmod.codon_graph(spec.icode)
    fcodon, f3x4, f1x4 = codonmod.count_codon_freqs(
        data.tip_partials, data.fpatt, graph, data.pos_masks)
    pi_np = codonmod.codon_pi(spec.codonf, fcodon, f3x4, f1x4, graph)
    pf3x4 = codonmod.mg_pf3x4(spec.codonf, f3x4, f1x4)
    s = codonmod.mutation_part(
        graph, kappa if spec.hkyREV else kappa[0], pf3x4, spec.hkyREV, dtype)
    rs, ra = codonmod.flux(graph, s, jnp.asarray(pi_np, dtype))
    qf = 1.0 / (float(rs) + float(ra) * wbar)

    lnf, _ = _per_omega_loglik(data, topo, spec, res.x, omegas, qf, dtype)
    lw = np.log(np.maximum(np.asarray(freqs), 1e-300))[:, None]
    post = lnf + lw
    post = np.exp(post - post.max(0, keepdims=True))
    post /= post.sum(0, keepdims=True)
    mean_w = (post * omegas[:, None]).sum(0)
    p_pos = post[omegas > 1.0].sum(0)
    return SitePosteriors("NEB", post, omegas, mean_w, None, p_pos)


def _ternary_grid(n1d: int):
    """Centroids of the n1d^2 triangles of the ternary graph (reference:
    GetIndexTernary)."""
    idx = np.arange(n1d * n1d)
    ix = np.floor(np.sqrt(idx)).astype(int)
    iy = idx - ix * ix
    p0 = (1 + (iy // 2) * 3 + (iy % 2)) / (3.0 * n1d)
    p1 = (1 + (n1d - 1 - ix) * 3 + (iy % 2)) / (3.0 * n1d)
    return p0, p1


def beb(data: seqio.PackedData, topo: Topology, spec, res, n1d: int = 10,
        dtype=jnp.float64) -> SitePosteriors:
    """BEB for M2a (NSsites=2) or M8 (NSsites=8), model=0."""
    from .codeml import M2A, M8
    if spec.NSsites not in (M2A, M8):
        raise ValueError("BEB implemented for NSsites = 2 (M2a) and 8 (M8)")
    M2a = spec.NSsites == M2A
    H = data.npatt
    fpatt = data.fpatt

    # frozen Qfactor at the MLE
    W = res.params["W"]
    freqs = res.params["freqs"]
    wbar = float((W * freqs[None, :]).sum(1)[0])
    graph = codonmod.codon_graph(spec.icode)
    fcodon, f3x4, f1x4 = codonmod.count_codon_freqs(
        data.tip_partials, data.fpatt, graph, data.pos_masks)
    pi_np = codonmod.codon_pi(spec.codonf, fcodon, f3x4, f1x4, graph)
    pf3x4 = codonmod.mg_pf3x4(spec.codonf, f3x4, f1x4)
    nb = len(topo.branch_nodes())
    nkappa = 0 if spec.fix_kappa else (5 if spec.hkyREV else 1)
    kmle = res.x[nb:nb + nkappa] if nkappa else np.atleast_1d(spec.kappa)
    s = codonmod.mutation_part(
        graph, jnp.asarray(kmle if spec.hkyREV else kmle[0]),
        pf3x4, spec.hkyREV, dtype)
    rs, ra = codonmod.flux(graph, s, jnp.asarray(pi_np, dtype))
    qf = 1.0 / (float(rs) + float(ra) * wbar)

    # omega library rK (reference get_grid_para_like_M2M8)
    w0_grid = (np.arange(n1d) + 0.5) / n1d                    # U(0,1)
    ws_grid = 1.0 + (np.arange(n1d) + 0.5) * 10.0 / n1d       # U(1,11)
    if M2a:
        rK = np.concatenate([w0_grid, [1.0], ws_grid])        # 21
    else:
        rK = np.concatenate([w0_grid, ws_grid])               # 20
    lnf, _ = _per_omega_loglik(data, topo, spec, res.x, rK, qf, dtype)
    # scale per pattern
    mx = lnf.max(0)
    fhK = np.exp(lnf - mx[None, :])                           # [nw, H]

    # grid: dim=4 (p0/p1-ternary, w0, w2) for M2a; (p0, p, q, ws) for M8
    if M2a:
        p0t, p1t = _ternary_grid(n1d)                         # [n1d^2]
        # grid axes: (tern, w0, w2)
        G_t, G_w0, G_w2 = np.meshgrid(np.arange(n1d * n1d), np.arange(n1d),
                                      np.arange(n1d), indexing="ij")
        G_t, G_w0, G_w2 = G_t.ravel(), G_w0.ravel(), G_w2.ravel()
        pcl = np.stack([p0t[G_t], p1t[G_t], 1 - p0t[G_t] - p1t[G_t]], axis=1)
        iw = np.stack([G_w0, np.full_like(G_w0, n1d), n1d + 1 + G_w2], axis=1)
        nclassM = 3
    else:
        p0g = (np.arange(n1d) + 0.5) / n1d
        pg = (np.arange(n1d) + 0.5) * 2.0 / n1d               # U(0,2)
        qg = (np.arange(n1d) + 0.5) * 2.0 / n1d
        G0, G1, G2, G3 = np.meshgrid(np.arange(n1d), np.arange(n1d),
                                     np.arange(n1d), np.arange(n1d),
                                     indexing="ij")
        G0, G1, G2, G3 = (g.ravel() for g in (G0, G1, G2, G3))
        # class weights: p0 * beta-bin probs for k<n1d; 1-p0 for ws
        edges = np.arange(1, n1d) / n1d
        # CDFBeta at bin edges for each (p, q) pair
        import itertools
        cdf = np.zeros((n1d, n1d, n1d - 1))
        for i, j in itertools.product(range(n1d), range(n1d)):
            cdf[i, j] = np.asarray(betainc(pg[i], qg[j], jnp.asarray(edges)))
        cdf_full = np.concatenate(
            [np.zeros((n1d, n1d, 1)), cdf, np.ones((n1d, n1d, 1))], axis=2)
        binp = np.diff(cdf_full, axis=2)                      # [p, q, n1d]
        pcl = np.concatenate(
            [p0g[G0][:, None] * binp[G1, G2],                 # [ngrid, n1d]
             (1 - p0g[G0])[:, None]], axis=1)                 # + ws class
        iw = np.concatenate(
            [np.tile(np.arange(n1d), (len(G0), 1)), (n1d + G3)[:, None]],
            axis=1)
        nclassM = n1d + 1

    # marginal likelihood per grid point: fh[g,h] = sum_k pcl * fhK[iw]
    fh = np.einsum("gk,gkh->gh", pcl, fhK[iw])                # [ngrid, H]
    fh = np.maximum(fh, 1e-300)
    lnfXs = np.log(fh) @ fpatt
    wgt = np.exp(lnfXs - lnfXs.max())
    wgt /= wgt.sum()

    # posterior over omega categories per pattern:
    # P(w_cat r | h) = sum_g wgt_g * pcl[g,k(r)] fhK[r,h] / fh[g,h]
    nw = len(rK)
    post_w = np.zeros((nw, H))
    inv_fh = wgt[:, None] / fh                                # [ngrid, H]
    for k in range(nclassM):
        contrib = inv_fh * pcl[:, k][:, None]                 # [ngrid, H]
        np.add.at(post_w, iw[:, k],
                  0.0)  # ensure rows exist
        # accumulate by omega index
        for r in np.unique(iw[:, k]):
            sel = iw[:, k] == r
            post_w[r] += (contrib[sel] * fhK[r][None, :]).sum(0)
    post_w /= post_w.sum(0, keepdims=True)

    mean_w = (post_w * rK[:, None]).sum(0)
    var_w = (post_w * (rK[:, None] - mean_w[None, :]) ** 2).sum(0)
    p_pos = post_w[rK > 1.0].sum(0)

    if M2a:
        class_post = np.stack([post_w[:n1d].sum(0), post_w[n1d],
                               post_w[n1d + 1:].sum(0)])
    else:
        class_post = np.stack([post_w[:n1d].sum(0), post_w[n1d:].sum(0)])
    return SitePosteriors("BEB", class_post, rK, mean_w, np.sqrt(var_w),
                          p_pos)


def beb_branchsite_A(data: seqio.PackedData, topo: Topology, spec, res,
                     n1d: int = 10, dtype=jnp.float64):
    """BEB for branch-site model A (reference: lfunNSsites_ACD,
    src/codeml.c:6827; grid/prior setup get_grid_para_like_ACD :6629 and
    get_pclassM_iw_ACD :6767).

    Integral dimension 4 (p0, p1 on the ternary graph; w0 ~ U(0,1);
    w2 ~ U(1,11)), each on n1d bins.  f(x_h|w) is computed for the
    121 = n1d + 1 + n1d^2 + n1d (wback, wfore) sets under the branch
    model with branch lengths, kappa and the per-branch-type Qfactor
    frozen at the MLE (the reference's BayesEB = 2 scale rule).

    Returns dict with postSite [4, H] (classes 0, 1, 2a, 2b), pos_prob
    [H] (= P(class 2a or 2b | x_h), the 'Prob(w>1)' of the output),
    post_w0/post_w2 grid marginals and post_p0p1."""
    from ..core.pmat import pmat_rev_multi

    graph = codonmod.codon_graph(spec.icode)
    fcodon, f3x4, f1x4 = codonmod.count_codon_freqs(
        data.tip_partials, data.fpatt, graph, data.pos_masks)
    pi_np = codonmod.codon_pi(spec.codonf, fcodon, f3x4, f1x4, graph)
    pf3x4 = codonmod.mg_pf3x4(spec.codonf, f3x4, f1x4)
    pi = jnp.asarray(pi_np, dtype)
    tips = jnp.asarray(data.tip_partials, dtype)
    branch_nodes = topo.branch_nodes()
    nb = len(branch_nodes)
    x_mle = res.x
    t = jnp.asarray(x_mle[:nb], dtype)
    nkappa = 0 if spec.fix_kappa else (5 if spec.hkyREV else 1)
    kappa = (jnp.asarray(x_mle[nb:nb + nkappa], dtype) if nkappa
             else jnp.asarray([spec.kappa], dtype))
    s = codonmod.mutation_part(graph, kappa if spec.hkyREV else kappa[0],
                               pf3x4, spec.hkyREV, dtype)
    rs, ra = codonmod.flux(graph, s, pi)

    # per-branch-type Qfactor frozen at the MLE mixture
    W, freqs = res.params["W"], res.params["freqs"]      # [2, 4], [4]
    wbar = (W * freqs[None, :]).sum(1)                   # [2]
    qf = 1.0 / (float(rs) + float(ra) * wbar)            # [2]
    btype = topo.labels.astype(np.int64)
    qf_node = jnp.asarray(qf[np.clip(btype, 0, 1)], dtype)   # [nnode]

    # 21 distinct omegas: w0 bins (0..9), w1=1 (10), w2 bins (11..20)
    w0g = (np.arange(n1d) + 0.5) / n1d
    w2g = 1.0 + (np.arange(n1d) + 0.5) * 10.0 / n1d
    vals = np.concatenate([w0g, [1.0], w2g])             # [21]
    Qs = jax.vmap(lambda w: codonmod.build_Q(graph, s, w, pi))(
        jnp.asarray(vals, dtype))
    tfull = jnp.zeros((topo.nnode,), dtype).at[
        jnp.asarray(branch_nodes)].set(t)
    ts = (tfull * qf_node)[:, None]
    ts = jnp.broadcast_to(ts, (topo.nnode, len(vals)))
    P_all = pmat_rev_multi(Qs, pi, ts)                   # [nnode, 21, n, n]

    # 121 (wback, wfore) sets (order of the reference's fhK table)
    back_idx = np.concatenate([
        np.arange(n1d), [n1d],
        np.repeat(np.arange(n1d), n1d),                  # class 2a: w0_i
        np.full(n1d, n1d)])                              # class 2b: w1=1
    fore_idx = np.concatenate([
        np.arange(n1d), [n1d],
        n1d + 1 + np.tile(np.arange(n1d), n1d),          # class 2a: w2_j
        n1d + 1 + np.arange(n1d)])                       # class 2b: w2_j
    nsets = len(back_idx)                                # 121
    Pb = jnp.take(P_all, jnp.asarray(back_idx), axis=1)  # [nnode, 121, ...]
    Pf = jnp.take(P_all, jnp.asarray(fore_idx), axis=1)
    mask = jnp.asarray((btype >= 1))[:, None, None, None]
    P_sets = jnp.where(mask, Pf, Pb)
    piC = jnp.broadcast_to(pi, (nsets, graph.n))
    lnf = np.asarray(pruning.class_site_lnf(P_sets, tips, topo, piC))
    H = lnf.shape[1]
    mx = lnf.max(0)
    fhK = np.exp(lnf - mx[None, :])                      # [121, H]
    fpatt = np.asarray(data.fpatt, float)

    # grid: (ternary p0p1 [n1d^2], w0 [n1d], w2 [n1d]) -> ngrid = n1d^4
    p0t, p1t = _ternary_grid(n1d)
    G_t, G_w0, G_w2 = np.meshgrid(np.arange(n1d * n1d), np.arange(n1d),
                                  np.arange(n1d), indexing="ij")
    G_t, G_w0, G_w2 = G_t.ravel(), G_w0.ravel(), G_w2.ravel()
    p0, p1 = p0t[G_t], p1t[G_t]
    p2 = 1.0 - p0 - p1
    t01 = p0 + p1
    pclassM = np.stack([p0, p1, p2 * p0 / t01, p2 * p1 / t01],
                       axis=1)                           # [ngrid, 4]
    iw = np.stack([G_w0,
                   np.full_like(G_w0, n1d),
                   n1d + 1 + G_w0 * n1d + G_w2,
                   n1d + 1 + n1d * n1d + G_w2], axis=1)  # [ngrid, 4]
    ngrid = len(G_t)

    # marginal log f(X | grid) and posteriors, chunked over the grid
    lnfXs = np.empty(ngrid)
    chunk = max(1, 4_000_000 // max(H, 1))
    for g0 in range(0, ngrid, chunk):
        sl = slice(g0, min(g0 + chunk, ngrid))
        F = np.einsum("gk,gkh->gh", pclassM[sl], fhK[iw[sl]])
        lnfXs[sl] = np.log(np.maximum(F, 1e-300)) @ fpatt
    mxg = lnfXs.max()
    Wg = np.exp(lnfXs - mxg)
    fX = Wg.sum()
    Wg /= fX
    postSite = np.zeros((4, H))
    for g0 in range(0, ngrid, chunk):
        sl = slice(g0, min(g0 + chunk, ngrid))
        fhk_sel = fhK[iw[sl]]                            # [g, 4, H]
        F = np.einsum("gk,gkh->gh", pclassM[sl], fhk_sel)
        ratio = (pclassM[sl][:, :, None] * fhk_sel
                 / np.maximum(F, 1e-300)[:, None, :])
        postSite += np.einsum("g,gkh->kh", Wg[sl], ratio)
    post_w0 = np.bincount(G_w0, weights=Wg, minlength=n1d)
    post_w2 = np.bincount(G_w2, weights=Wg, minlength=n1d)
    post_p0p1 = np.bincount(G_t, weights=Wg, minlength=n1d * n1d)
    return dict(postSite=postSite, pos_prob=postSite[2] + postSite[3],
                w0_grid=w0g, w2_grid=w2g, post_w0=post_w0,
                post_w2=post_w2, post_p0p1=post_p0p1,
                lnfX=float(np.log(fX) + mxg))


def positive_sites(data: seqio.PackedData, sp: SitePosteriors,
                   cutoff: float = 0.5):
    """(site_index_1based, P(w>1), mean_w) for sites above cutoff, using the
    pattern->site expansion (reference rst output)."""
    out = []
    site_pat = data.site_pattern
    for site in range(len(site_pat)):
        h = site_pat[site]
        if sp.p_positive[h] > cutoff:
            out.append((site + 1, float(sp.p_positive[h]),
                        float(sp.mean_w[h])))
    return out
