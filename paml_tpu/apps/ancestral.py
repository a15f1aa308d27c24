"""Ancestral sequence reconstruction and site-rate estimation
(RateAncestor outputs; reference rst file).

- Marginal reconstruction (empirical Bayes): per-node state posteriors
  from inside (upward) x outside (downward) partials (reference:
  AncestralMarginal, src/treesub.c:6288; ProbSitePattern :6064).
- Joint reconstruction: Pupko et al. (2000) max-product dynamic program
  (reference: AncestralJointPPSG2000, src/treesub.c:6964), vectorized
  over site patterns.
- Site rates: posterior mean rate per site under discrete-gamma
  (reference: lfunRates, src/treesub.c:7314).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core import pruning
from ..core.topology import Topology


def inside_outside(P, tips, topo: Topology, pi):
    """Per-node state posteriors, [n_internal, C, H, n] normalized over n.

    P: [nnode, C, n, n]; pi: [C, n].
    Uses the same upward scan as the likelihood and the downward (outside)
    recursion of the adjoint pass.
    """
    ns, nint, nnode = topo.ns, topo.n_internal, topo.nnode
    C, n = P.shape[1], P.shape[3]
    H = tips.shape[1]
    dtype = P.dtype
    tips = jnp.asarray(tips).astype(dtype)
    buf, ms = pruning._forward_buffers(P, tips, topo)
    rootp = buf[topo.root - ns]
    F = jnp.maximum(jnp.einsum("chn,cn->ch", rootp, pi),
                    jnp.finfo(dtype).tiny)

    nodes = topo.postorder.astype(np.int32)
    children = topo.children[nodes].astype(np.int32)
    order = np.arange(len(nodes))[::-1].copy()
    sched = (jnp.asarray(nodes[order]), jnp.asarray(children[order]),
             jnp.asarray(order))

    W0 = jnp.zeros((nint, C, H, n), dtype).at[topo.root - ns].set(
        jnp.broadcast_to(pi[:, None, :], (C, H, n)))

    def step(Wbuf, sch):
        node, kids, post_idx = sch
        valid = kids >= 0
        is_tip = (kids >= 0) & (kids < ns)
        tipvals = tips[jnp.clip(kids, 0, ns - 1)]
        intvals = buf[jnp.clip(kids - ns, 0, nint - 1)]
        U = jnp.where(is_tip[:, None, None, None],
                      tipvals[:, None, :, :], intvals)
        Pk = P[jnp.clip(kids, 0, nnode - 1)]
        c = jnp.einsum("kchi,kcji->kchj", U, Pk)
        c = jnp.where(valid[:, None, None, None], c, 1.0)
        K = c.shape[0]
        pre = [jnp.ones_like(c[0])]
        for k in range(1, K):
            pre.append(pre[-1] * c[k - 1])
        suf = [jnp.ones_like(c[0])]
        for k in range(K - 2, -1, -1):
            suf.insert(0, suf[0] * c[k + 1])
        loo = jnp.stack([pre[k] * suf[k] for k in range(K)])
        Wp = Wbuf[node - ns]
        G = Wp[None] * loo                                   # [K,C,H,n]
        Wk = jnp.einsum("kchj,kcjn->kchn", G, Pk)
        # normalize to dodge under/overflow (posteriors renormalize later)
        mx = jnp.max(Wk, axis=-1, keepdims=True)
        Wk = Wk / jnp.where(mx > 0, mx, 1.0)
        int_kid = (kids >= ns)
        Wbuf = Wbuf.at[jnp.clip(kids - ns, 0, nint - 1)].add(
            jnp.where(int_kid[:, None, None, None], Wk, 0.0))
        return Wbuf, None

    Wbuf, _ = jax.lax.scan(step, W0, sched)
    post = buf * Wbuf                                        # [nint,C,H,n]
    post = post / jnp.maximum(post.sum(-1, keepdims=True),
                              jnp.finfo(dtype).tiny)
    return post


def marginal_reconstruction(P, tips, topo: Topology, pi, class_w, fpatt):
    """Best state and probability per (internal node, pattern), mixing
    site classes by their posterior weights.

    Returns (best [nint, H] int, prob [nint, H], post [nint, H, n])."""
    post_c = inside_outside(P, tips, topo, pi)               # [nint,C,H,n]
    cls_post = pruning.site_class_posterior(P, tips, topo, pi, class_w)
    post = jnp.einsum("ichn,ch->ihn", post_c, cls_post)
    best = jnp.argmax(post, axis=-1)
    prob = jnp.take_along_axis(post, best[..., None], axis=-1)[..., 0]
    return np.asarray(best), np.asarray(prob), np.asarray(post)


def joint_reconstruction(P, tips, topo: Topology, pi):
    """Pupko et al. (2000) joint ML reconstruction (single-class models).

    P: [nnode, 1, n, n] (class axis 1 collapsed).  Returns
    (states [nint, H] int, lnP [H] joint log-probability)."""
    ns, nint, nnode = topo.ns, topo.n_internal, topo.nnode
    P1 = P[:, 0]
    n = P1.shape[-1]
    H = tips.shape[1]
    dtype = P1.dtype
    logP = jnp.log(jnp.maximum(P1, 1e-300))                  # [nnode,n,n]
    log_tips = jnp.log(jnp.maximum(tips.astype(dtype), 1e-300))

    nodes = topo.postorder.astype(np.int32)
    children = topo.children[nodes].astype(np.int32)

    # upward: L_i[j] = best log-prob of subtree i given parent state j
    # for tips: L_tip[j] = max_s (logP[tip][j,s] + log_tip[s]); ptr
    Lbuf0 = jnp.zeros((nint, H, n), dtype)
    ptr0 = jnp.zeros((nint, H, n), jnp.int32)   # best own-state given parent

    def step(carry, sched):
        Lbuf, _ = carry
        node, kids = sched
        valid = kids >= 0
        is_tip = (kids >= 0) & (kids < ns)
        tipL = log_tips[jnp.clip(kids, 0, ns - 1)]           # [K,H,n]
        intL = Lbuf[jnp.clip(kids - ns, 0, nint - 1)]        # [K,H,n]
        Lc = jnp.where(is_tip[:, None, None], tipL, intL)    # [K,H,n]
        Pk = logP[jnp.clip(kids, 0, nnode - 1)]              # [K,n,n]
        # for child k: M_k[h,j] = max_s (Pk[j,s] + Lc[k,h,s])
        scores = Pk[:, None, :, :] + Lc[:, :, None, :]       # [K,H,j,s]
        scores = jnp.where(valid[:, None, None, None], scores, 0.0)
        Mk = jnp.max(scores, axis=-1)                        # [K,H,j]
        arg = jnp.argmax(scores, axis=-1).astype(jnp.int32)  # [K,H,j]
        Lsum = jnp.sum(jnp.where(valid[:, None, None], Mk, 0.0), axis=0)
        Lbuf = Lbuf.at[node - ns].set(Lsum)
        return (Lbuf, None), arg

    (Lbuf, _), args = jax.lax.scan(
        step, (Lbuf0, None), (jnp.asarray(nodes), jnp.asarray(children)))
    # args: [ni, K, H, n] per internal node (in postorder order)

    # root: best state = argmax_s (log pi + L_root-ish).  The root's own L
    # was computed "given parent"; recompute directly:
    # best root state = argmax_s [log pi_s + sum_children max-paths].
    # We reconstruct via one more pass: root children scores at state s.
    root = topo.root
    kids = [c for c in topo.children[root] if c >= 0]
    logpi = jnp.log(jnp.maximum(pi[0] if pi.ndim == 2 else pi, 1e-300))
    total = jnp.broadcast_to(logpi[None, :], (H, n))
    for c in kids:
        Lc = (log_tips[c] if c < ns else Lbuf[c - ns])
        sc = logP[c][None, :, :] + Lc[:, None, :]
        total = total + jnp.max(sc, axis=-1)
    root_state = jnp.argmax(total, axis=-1).astype(jnp.int32)  # [H]
    lnP = jnp.max(total, axis=-1)

    # downward traceback
    post_index = {int(nodes[i]): i for i in range(len(nodes))}
    states = np.zeros((nint, H), dtype=np.int32)
    args_np = np.asarray(args)
    states[root - ns] = np.asarray(root_state)

    def walk(node):
        pi_idx = post_index[node]
        kids = [c for c in topo.children[node] if c >= 0]
        parent_state = states[node - ns]
        for k, c in enumerate(kids):
            if c >= ns:
                states[c - ns] = np.take_along_axis(
                    args_np[pi_idx, k], parent_state[:, None], axis=1)[:, 0]
                walk(int(c))

    walk(int(root))
    return states, np.asarray(lnP)


def site_rates(P, tips, topo: Topology, pi, class_w, rates):
    """Posterior mean rate per pattern under the rate mixture (reference:
    lfunRates, src/treesub.c:7314)."""
    cls_post = pruning.site_class_posterior(P, tips, topo, pi, class_w)
    return np.asarray(jnp.einsum("ch,c->h", cls_post, jnp.asarray(rates)))
