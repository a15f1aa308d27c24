"""Felsenstein pruning on TPU: scan over a static postorder schedule.

Replaces the reference's recursive `ConditionalPNode` (src/codeml.c:3526,
src/baseml.c:1517) with a `lax.scan` over internal nodes.  Each step gathers
the child partials, contracts them against the per-branch transition
matrices with one batched einsum (MXU work), takes the product over
children, and rescales per (class, pattern) — an always-on version of the
reference's scaling-node machinery (`SetNodeScale`/`NodeScale`,
src/treesub.c:7177-7227), accumulated in log space.

Shapes:
  tips:  [ns, H, n]        tip partials (state-set indicators)
  P:     [nnode, C, n, n]  transition matrices, row i = from-parent state
  out:   per-class root partials [C, H, n] and log-scale [C, H]

Site-class mixtures (discrete gamma, NSsites) ride the C axis; the final
site log-likelihood is a logsumexp over classes (reference: `lfundG`,
src/treesub.c:7608, `fx_r` :7696).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .topology import Topology


def _schedule(topo: Topology) -> tuple[np.ndarray, np.ndarray]:
    nodes = topo.postorder                         # [ni]
    children = topo.children[nodes]                # [ni, K]
    return nodes.astype(np.int32), children.astype(np.int32)


def root_partials(P: jnp.ndarray, tips: jnp.ndarray, topo: Topology):
    """Compute per-class root partials and per-(class, pattern) log scale.

    P: [nnode, C, n, n]; tips: [ns, H, n] -> ([C, H, n], [C, H])
    """
    ns = topo.ns
    nint = topo.n_internal
    nnode = topo.nnode
    C, n = P.shape[1], P.shape[3]
    H = tips.shape[1]
    dtype = P.dtype
    nodes, children = _schedule(topo)
    tips = tips.astype(dtype)

    buf0 = jnp.zeros((nint, C, H, n), dtype)
    scale0 = jnp.zeros((C, H), dtype)

    def step(carry, sched):
        buf, logscale = carry
        node, kids = sched                      # node: scalar, kids: [K]
        valid = kids >= 0
        is_tip = (kids >= 0) & (kids < ns)
        tipvals = tips[jnp.clip(kids, 0, ns - 1)]               # [K, H, n]
        intvals = buf[jnp.clip(kids - ns, 0, nint - 1)]         # [K, C, H, n]
        part = jnp.where(is_tip[:, None, None, None],
                         tipvals[:, None, :, :], intvals)       # [K, C, H, n]
        Pk = P[jnp.clip(kids, 0, nnode - 1)]                    # [K, C, n, n]
        contrib = jnp.einsum("kchi,kcji->kchj", part, Pk)       # [K, C, H, n]
        contrib = jnp.where(valid[:, None, None, None], contrib, 1.0)
        # unrolled product over the (static, small) child axis: jnp.prod's
        # reduce_prod gradient divides by the inputs and NaNs on exact
        # zeros (which P = max(P, 0) clipping can produce in f32)
        prod = contrib[0]
        for k in range(1, contrib.shape[0]):
            prod = prod * contrib[k]                            # [C, H, n]
        m = jnp.max(prod, axis=-1, keepdims=True)
        msafe = jnp.where(m > 0, m, 1.0)
        prod = prod / msafe
        logscale = logscale + jnp.log(msafe[..., 0])
        buf = buf.at[node - ns].set(prod)
        return (buf, logscale), None

    (buf, logscale), _ = jax.lax.scan(
        step, (buf0, scale0), (jnp.asarray(nodes), jnp.asarray(children)))
    return buf[topo.root - ns], logscale


# ---------------------------------------------------------------------------
# memory-efficient gradient: analytic adjoint (inside/outside) custom VJP
# ---------------------------------------------------------------------------
#
# Differentiating through the upward scan would make JAX store the full
# partials buffer once per scan step (O(n_internal^2 * H * n) memory).  The
# pruning recursion has a classic analytic adjoint: with upward (inside)
# partials U and downward (outside) adjoints A,
#   dlnf/dP_c[j,k] = A_via[j] * U_c[k],   A_c = P_c^T A_via,
#   A_via = A_parent * prod_{siblings} (P_s U_s),
# so the backward pass is a single downward scan reusing the forward's
# stored buffers — O(n_internal * H * n) total.  (The same downward pass
# later powers marginal ancestral reconstruction, reference:
# AncestralMarginal, src/treesub.c:6288.)


def _forward_buffers(P, tips, topo: Topology):
    """Upward scan; returns (buf [nint,C,H,n] scaled partials,
    mbuf [nint,C,H] per-node scale factors)."""
    ns, nint, nnode = topo.ns, topo.n_internal, topo.nnode
    C, n = P.shape[1], P.shape[3]
    H = tips.shape[1]
    dtype = P.dtype
    nodes, children = _schedule(topo)
    tips = tips.astype(dtype)
    buf0 = jnp.zeros((nint, C, H, n), dtype)

    def step(buf, sched):
        node, kids = sched
        valid = kids >= 0
        is_tip = (kids >= 0) & (kids < ns)
        tipvals = tips[jnp.clip(kids, 0, ns - 1)]
        intvals = buf[jnp.clip(kids - ns, 0, nint - 1)]
        part = jnp.where(is_tip[:, None, None, None],
                         tipvals[:, None, :, :], intvals)
        Pk = P[jnp.clip(kids, 0, nnode - 1)]
        contrib = jnp.einsum("kchi,kcji->kchj", part, Pk)
        contrib = jnp.where(valid[:, None, None, None], contrib, 1.0)
        prod = contrib[0]
        for k in range(1, contrib.shape[0]):
            prod = prod * contrib[k]
        m = jnp.max(prod, axis=-1)                             # [C, H]
        msafe = jnp.where(m > 0, m, 1.0)
        prod = prod / msafe[..., None]
        buf = buf.at[node - ns].set(prod)
        return buf, msafe

    buf, ms = jax.lax.scan(step, buf0, (jnp.asarray(nodes),
                                        jnp.asarray(children)))
    return buf, ms            # ms ordered by postorder position


from functools import partial


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def class_site_lnf(P, tips, topo: Topology, pi):
    """Per-(class, pattern) log site likelihood [C, H].

    pi: [C, n] per-class root frequencies.  Gradients w.r.t. P and pi via
    the analytic adjoint; tips are treated as data (zero gradient).
    """
    buf, ms = _forward_buffers(P, tips, topo)
    rootp = buf[topo.root - topo.ns]                            # [C, H, n]
    F = jnp.einsum("chn,cn->ch", rootp, pi)
    F = jnp.maximum(F, jnp.finfo(F.dtype).tiny)
    return jnp.log(F) + jnp.sum(jnp.log(ms), axis=0)


def _lnf_fwd(P, tips, topo, pi):
    buf, ms = _forward_buffers(P, tips, topo)
    rootp = buf[topo.root - topo.ns]
    F = jnp.einsum("chn,cn->ch", rootp, pi)
    F = jnp.maximum(F, jnp.finfo(F.dtype).tiny)
    lnf = jnp.log(F) + jnp.sum(jnp.log(ms), axis=0)
    return lnf, (P, tips, buf, ms, F, pi)


def _lnf_bwd(topo, res, gbar):
    P, tips, buf, ms, F, pi = res
    ns, nint, nnode = topo.ns, topo.n_internal, topo.nnode
    C, n = P.shape[1], P.shape[3]
    H = tips.shape[1]
    dtype = P.dtype
    nodes, children = _schedule(topo)
    tips = tips.astype(dtype)
    rootp = buf[topo.root - topo.ns]

    # adjoint at the root (hat space): A_root = gbar * pi / F
    A0 = gbar[:, :, None] * pi[:, None, :] / F[:, :, None]       # [C, H, n]
    Abuf0 = jnp.zeros((nint, C, H, n), dtype).at[topo.root - ns].set(A0)
    dP0 = jnp.zeros_like(P)

    # reverse the postorder: parents before children
    order = np.arange(len(nodes))[::-1].copy()
    sched = (jnp.asarray(nodes[order]), jnp.asarray(children[order]),
             jnp.asarray(order))

    ms_all = ms                                                # [nint, C, H]

    def step(carry, sch):
        Abuf, dP = carry
        node, kids, post_idx = sch
        valid = kids >= 0
        is_tip = (kids >= 0) & (kids < ns)
        tipvals = tips[jnp.clip(kids, 0, ns - 1)]
        intvals = buf[jnp.clip(kids - ns, 0, nint - 1)]
        U = jnp.where(is_tip[:, None, None, None],
                      tipvals[:, None, :, :], intvals)          # [K,C,H,n]
        Pk = P[jnp.clip(kids, 0, nnode - 1)]                    # [K,C,n,n]
        c = jnp.einsum("kchi,kcji->kchj", U, Pk)                # [K,C,H,n]
        c = jnp.where(valid[:, None, None, None], c, 1.0)
        K = c.shape[0]
        # leave-one-out products over the child axis
        pre = [jnp.ones_like(c[0])]
        for k in range(1, K):
            pre.append(pre[-1] * c[k - 1])
        suf = [jnp.ones_like(c[0])]
        for k in range(K - 2, -1, -1):
            suf.insert(0, suf[0] * c[k + 1])
        loo = jnp.stack([pre[k] * suf[k] for k in range(K)])    # [K,C,H,n]
        Ap = Abuf[node - ns]                                    # [C,H,n]
        minv = 1.0 / ms_all[post_idx]                           # [C,H]
        G = Ap[None] * loo * minv[None, :, :, None]             # [K,C,H,n]
        G = jnp.where(valid[:, None, None, None], G, 0.0)
        # cap the adjoint chain: at absurd line-search trial points the
        # partials underflow and 1/m overflows; keep everything finite so
        # the optimizer can backtrack (gradients at such points are
        # garbage either way)
        cap = 1e12
        G = jnp.clip(jnp.nan_to_num(G, nan=0.0, posinf=cap, neginf=-cap),
                     -cap, cap)
        dPk = jnp.einsum("kchj,kchi->kcji", G, U)               # [K,C,n,n]
        dP = dP.at[jnp.clip(kids, 0, nnode - 1)].add(
            jnp.where(valid[:, None, None, None], dPk, 0.0))
        Ak = jnp.einsum("kchj,kcjn->kchn", G, Pk)               # [K,C,H,n]
        int_kid = (kids >= ns)
        Abuf = Abuf.at[jnp.clip(kids - ns, 0, nint - 1)].add(
            jnp.where(int_kid[:, None, None, None], Ak, 0.0))
        return (Abuf, dP), None

    (Abuf, dP), _ = jax.lax.scan(step, (Abuf0, dP0), sched)
    dpi = jnp.einsum("ch,chn->cn", gbar / F, rootp)
    # at pathological parameter points (line-search trial steps far outside
    # the plausible region) partials can underflow to exact zero and the
    # 1/m adjoint chain overflows; keep gradients finite so the optimizer
    # can backtrack instead of aborting
    big = 1e30
    dP = jnp.nan_to_num(dP, nan=0.0, posinf=big, neginf=-big)
    dpi = jnp.nan_to_num(dpi, nan=0.0, posinf=big, neginf=-big)
    return dP, jnp.zeros_like(tips), dpi


class_site_lnf.defvjp(_lnf_fwd, _lnf_bwd)


def site_loglik(P: jnp.ndarray, tips: jnp.ndarray, topo: Topology,
                pi: jnp.ndarray, class_w: jnp.ndarray) -> jnp.ndarray:
    """Per-pattern log-likelihood, mixing site classes.

    pi: [C, n] root frequencies per class; class_w: [C] mixture weights.
    Returns [H].
    """
    lnf_ch = class_site_lnf(P, tips, topo, pi)                  # [C, H]
    lnf_c = lnf_ch + jnp.log(class_w)[:, None]
    return jax.scipy.special.logsumexp(lnf_c, axis=0)           # [H]


def lnL(P, tips, topo, pi, class_w, fpatt) -> jnp.ndarray:
    """Total log-likelihood: sum_h fpatt[h] * ln f_h (reference: `lfun`,
    src/treesub.c:7764)."""
    lnf = site_loglik(P, tips, topo, pi, class_w)
    return jnp.sum(fpatt * lnf)


def site_class_posterior(P, tips, topo, pi, class_w) -> jnp.ndarray:
    """Posterior P(class | pattern): [C, H] (NEB machinery; reference:
    lfunRates src/treesub.c:7314, lfunNSsites_rate src/codeml.c:5241)."""
    lnf_c = class_site_lnf(P, tips, topo, pi) + jnp.log(class_w)[:, None]
    return jnp.exp(lnf_c - jax.scipy.special.logsumexp(lnf_c, axis=0, keepdims=True))
