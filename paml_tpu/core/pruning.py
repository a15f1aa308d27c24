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
        prod = jnp.prod(contrib, axis=0)                        # [C, H, n]
        m = jnp.max(prod, axis=-1, keepdims=True)
        msafe = jnp.where(m > 0, m, 1.0)
        prod = prod / msafe
        logscale = logscale + jnp.log(msafe[..., 0])
        buf = buf.at[node - ns].set(prod)
        return (buf, logscale), None

    (buf, logscale), _ = jax.lax.scan(
        step, (buf0, scale0), (jnp.asarray(nodes), jnp.asarray(children)))
    return buf[topo.root - ns], logscale


def site_loglik(P: jnp.ndarray, tips: jnp.ndarray, topo: Topology,
                pi: jnp.ndarray, class_w: jnp.ndarray) -> jnp.ndarray:
    """Per-pattern log-likelihood, mixing site classes.

    pi: [C, n] root frequencies per class; class_w: [C] mixture weights.
    Returns [H].
    """
    rootp, logscale = root_partials(P, tips, topo)              # [C,H,n],[C,H]
    f = jnp.einsum("chn,cn->ch", rootp, pi)                     # [C, H]
    f = jnp.maximum(f, 1e-300)
    lnf_c = jnp.log(f) + logscale + jnp.log(class_w)[:, None]   # [C, H]
    return jax.scipy.special.logsumexp(lnf_c, axis=0)           # [H]


def lnL(P, tips, topo, pi, class_w, fpatt) -> jnp.ndarray:
    """Total log-likelihood: sum_h fpatt[h] * ln f_h (reference: `lfun`,
    src/treesub.c:7764)."""
    lnf = site_loglik(P, tips, topo, pi, class_w)
    return jnp.sum(fpatt * lnf)


def site_class_posterior(P, tips, topo, pi, class_w) -> jnp.ndarray:
    """Posterior P(class | pattern): [C, H] (NEB machinery; reference:
    lfunRates src/treesub.c:7314, lfunNSsites_rate src/codeml.c:5241)."""
    rootp, logscale = root_partials(P, tips, topo)
    f = jnp.maximum(jnp.einsum("chn,cn->ch", rootp, pi), 1e-300)
    lnf_c = jnp.log(f) + logscale + jnp.log(class_w)[:, None]
    return jnp.exp(lnf_c - jax.scipy.special.logsumexp(lnf_c, axis=0, keepdims=True))
