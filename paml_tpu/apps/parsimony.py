"""Parsimony engine: Fitch scores, informative sites (reference: MPScore /
UpPass / DownPass, src/treesub.c:5417-5642; MPInformSites :1813).

State sets are bitmasks; the up-pass is vectorized over all site patterns
at once (uint8/uint32 bit ops), so an MP score for a topology is a few
array ops rather than a per-site recursion.
"""
from __future__ import annotations

import numpy as np

from ..core.topology import Topology
from ..io import seqio


def _tip_bitmasks(data: seqio.PackedData) -> np.ndarray:
    """[ns, H] uint32 bitmask of compatible states per tip/pattern."""
    bits = (data.tip_partials > 0).astype(np.uint32)
    weights = (1 << np.arange(data.nstates, dtype=np.uint32))
    return (bits * weights[None, None, :]).sum(-1).astype(np.uint32)


def mp_score(topo: Topology, data: seqio.PackedData) -> float:
    """Fitch parsimony score (weighted by pattern counts)."""
    masks = _tip_bitmasks(data)
    H = data.npatt
    buf = np.zeros((topo.nnode, H), dtype=np.uint32)
    buf[:topo.ns] = masks
    changes = np.zeros(H, dtype=np.int64)
    for node in topo.postorder:
        kids = [c for c in topo.children[node] if c >= 0]
        acc = buf[kids[0]]
        for c in kids[1:]:
            inter = acc & buf[c]
            nz = inter != 0
            changes += (~nz).astype(np.int64)
            acc = np.where(nz, inter, acc | buf[c])
        buf[node] = acc
    return float((changes * data.fpatt).sum())


def informative_sites(data: seqio.PackedData) -> np.ndarray:
    """Boolean per pattern: parsimony-informative (>= 2 states each seen in
    >= 2 sequences; reference MPInformSites, src/treesub.c:1813)."""
    resolved = data.tip_partials.sum(-1) == 1
    states = data.tip_partials.argmax(-1)
    H = data.npatt
    out = np.zeros(H, dtype=bool)
    for h in range(H):
        vals, counts = np.unique(states[resolved[:, h], h],
                                 return_counts=True)
        out[h] = (counts >= 2).sum() >= 2
    return out


def site_change_counts(topo: Topology, data: seqio.PackedData) -> np.ndarray:
    """Minimum change count per pattern (Fitch)."""
    masks = _tip_bitmasks(data)
    H = data.npatt
    buf = np.zeros((topo.nnode, H), dtype=np.uint32)
    buf[:topo.ns] = masks
    changes = np.zeros(H, dtype=np.int64)
    for node in topo.postorder:
        kids = [c for c in topo.children[node] if c >= 0]
        acc = buf[kids[0]]
        for c in kids[1:]:
            inter = acc & buf[c]
            nz = inter != 0
            changes += (~nz).astype(np.int64)
            acc = np.where(nz, inter, acc | buf[c])
        buf[node] = acc
    return changes
