"""Fused Pallas TPU kernel for Felsenstein pruning.

One kernel evaluates the whole tree for a tile of site patterns with every
partial kept in VMEM — the per-level einsum pipeline in `pruning.py` writes
each level's [C, n, H] partial back to HBM, so a deep tree is HBM-bandwidth
bound; here the only HBM traffic is the tip data in and the per-(class,
pattern) log-likelihood out.  This is the TPU-native replacement for the
reference's hot loop `ConditionalPNode` (src/codeml.c:3526-3575,
src/baseml.c:1517) fused with its scaling machinery (`NodeScale`,
src/treesub.c:7200).

Design
------
* The tree schedule (DFS postorder, slot-allocated contribution buffers)
  is computed on the host and **statically unrolled** into the kernel:
  Mosaic sees straight-line code of [N, N] x [N, Ht] matmuls (MXU) and
  elementwise product/rescale (VPU), with N = n states padded to a
  sublane multiple and Ht the pattern tile riding the 128-lane axis.
* Contribution buffers are reused through a host-side liveness scan
  ("register allocation"): a DFS postorder needs only O(tree depth)
  simultaneously-live child contributions, so VMEM holds `nslots`
  [C, N, Ht] buffers instead of one per node.
* The backward pass is the same analytic inside/outside adjoint as
  `pruning.py` (one downward sweep), implemented as a second kernel that
  first **recomputes** the upward sweep in VMEM (storing every internal
  node's scaled partial in a [nint, C, N, Ht] scratch) and then walks the
  tree root-to-tips accumulating dP and dpi across pattern tiles in
  revisited output blocks.  Rematerializing costs ~nnode extra matmuls
  but keeps the forward kernel write-only (no residual round-trip to
  HBM).
* Tips enter either as integer state codes [ns, H] (clean data; one-hot
  built in-register) or as (multi-)hot partials [ns, H, n] (ambiguity
  sets, reference: CharaMap sums, src/codeml.c:3560-3567).

The kernel is numerically identical in structure to the level path
(per-node max-rescale, log-space scale accumulation); parity is asserted
by tests/test_pallas_pruning.py in interpreter mode on CPU and by the
bench on hardware.
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from .topology import Topology

try:  # pallas is TPU-oriented; keep import soft for exotic builds
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

_VMEM_BUDGET = 96 * 1024 * 1024   # bytes; v5e has 128 MiB VMEM/core
_GRAD_CAP = 1e12                  # match pruning.py adjoint clipping
_BIG = 1e30

# ---------------------------------------------------------------------------
# kernel matmul precision
#
# Mosaic lowers an f32 `jnp.dot` with default precision to a SINGLE bf16
# MXU pass (measured: bit-identical results and identical runtime to
# explicitly casting the operands to bf16), and rejects Precision.HIGH.
# For likelihoods that must match the reference to ~1e-4 lnL units a lone
# bf16 pass is too coarse, so the kernels default to a manual 3-pass
# bf16x3 product (the same decomposition XLA uses for Precision.HIGH:
# a ~= hi + lo with hi = bf16(a); a*b ~= hi*hi + hi*lo + lo*hi), which is
# f32-faithful to ~2^-22 relative.  Modes: "bf16" (1 pass, fastest),
# "3pass" (default), "6pass" (Precision.HIGHEST).
# ---------------------------------------------------------------------------

import os as _os

_MM_MODES = ("bf16", "3pass", "6pass")
_MM_MODE = _os.environ.get("PAML_TPU_MM", "3pass")
if _MM_MODE not in _MM_MODES:       # fail fast on typos (ADVICE r3)
    raise ValueError(f"PAML_TPU_MM={_MM_MODE!r}; expected one of "
                     f"{_MM_MODES}")
# The backward (adjoint) kernel defaults to single-pass bf16: the VALUE
# the optimizer line-searches on comes from the forward kernel (3pass,
# f32-faithful), while search DIRECTIONS tolerate ~1e-3 relative gradient
# noise — L-BFGS re-derives curvature from value differences and the CLI
# polishes in f64 on the host.  Cuts the adjoint's 3x matmul volume to
# 1x.  Override with PAML_TPU_BWD_MM=3pass for f32-faithful gradients.
_BWD_MM = _os.environ.get("PAML_TPU_BWD_MM", "bf16")
if _BWD_MM not in _MM_MODES:
    raise ValueError(f"PAML_TPU_BWD_MM={_BWD_MM!r}; expected one of "
                     f"{_MM_MODES}")


def set_mm_mode(mode: str) -> None:
    """Set the Pallas-kernel matmul mode: "bf16" | "3pass" | "6pass".

    The mode is baked into kernels at trace time, so call this BEFORE the
    first jit compilation (or clear caches with jax.clear_caches());
    changing it afterwards does not recompile already-jitted functions."""
    global _MM_MODE
    assert mode in _MM_MODES
    _MM_MODE = mode
    try:                    # drop stale traces so the new mode takes effect
        jax.clear_caches()
    except Exception:  # pragma: no cover
        pass


def _bf16_split(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def mm_dot_general(a, b, dimension_numbers, exact=False, mode=None):
    """dot_general at the configured kernel matmul precision.

    exact=True (interpreter mode on CPU, where f32 dots are native) skips
    the bf16 emulation passes.  mode overrides the global _MM_MODE (the
    backward kernel passes _BWD_MM)."""
    mode = _MM_MODE if mode is None else mode
    if exact:
        return jax.lax.dot_general(a, b, dimension_numbers,
                                   preferred_element_type=jnp.float32)
    if mode == "6pass":
        return jax.lax.dot_general(
            a, b, dimension_numbers, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
    if mode == "bf16":
        return jax.lax.dot_general(
            a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
            dimension_numbers, preferred_element_type=jnp.float32)
    ah, al = _bf16_split(a)
    bh, bl = _bf16_split(b)

    def d(x, y):
        return jax.lax.dot_general(x, y, dimension_numbers,
                                   preferred_element_type=jnp.float32)
    return d(ah, bh) + d(ah, bl) + d(al, bh)


# ---------------------------------------------------------------------------
# host-side schedule
# ---------------------------------------------------------------------------


class _Plan:
    """Static kernel schedule for one topology."""

    def __init__(self, topo: Topology):
        ns, root = topo.ns, int(topo.root)
        kids_of: dict[int, tuple[int, ...]] = {}
        order: list[int] = []
        # iterative DFS postorder over ALL nodes (tips included)
        stack: list[tuple[int, bool]] = [(root, False)]
        while stack:
            v, done = stack.pop()
            if done:
                order.append(v)
                continue
            stack.append((v, True))
            kids = tuple(int(c) for c in topo.children[v] if c >= 0) \
                if v >= ns else ()
            kids_of[v] = kids
            for c in reversed(kids):
                stack.append((c, False))
        # slot allocation: contribution c_v lives from v's step until the
        # parent's step; greedy reuse bounds slots by ~tree depth
        slot: dict[int, int] = {}
        free: list[int] = []
        nslots = 0
        for v in order:
            for k in kids_of.get(v, ()):
                free.append(slot[k])
            if v != root:
                if free:
                    slot[v] = free.pop()
                else:
                    slot[v] = nslots
                    nslots += 1
        self.topo = topo
        self.order = order            # DFS postorder, root last
        self.kids_of = kids_of
        self.slot = slot
        self.nslots = max(nslots, 1)
        self.root = root
        self.ns = ns
        # A_v (adjoint) reuses c_v's slot (identical liveness interval,
        # reversed); the root gets the extra slot nslots
        self.root_aslot = self.nslots
        # sparse scaling: rescale only every k-th internal level along
        # any root-ward path (the reference scales every ~15 tip
        # descendants, SetNodeScale treesub.c:7177; scaling EVERY node is
        # pure VPU overhead — max+div over [C, N, Ht] plus a log — and
        # f32 partials shrink far too slowly to underflow within a few
        # levels).  unscaled-depth recurrence guarantees every path
        # rescales at least every k internal nodes.  The root always
        # scales (its logm feeds the final log-likelihood directly).
        k_scale = int(_os.environ.get("PAML_TPU_SCALE_EVERY", "4"))
        self.all_internal = {v for v in order if v >= ns}
        self.scale_set: set[int] = set()
        ud: dict[int, int] = {}
        for v in order:
            if v < ns:
                ud[v] = 0
                continue
            d = 1 + max(ud[k] for k in kids_of[v])
            if d >= k_scale or v == root:
                self.scale_set.add(v)
                ud[v] = 0
            else:
                ud[v] = d


def _plan(topo: Topology) -> _Plan:
    p = getattr(topo, "_pallas_plan", None)
    if p is None:
        p = _Plan(topo)
        topo._pallas_plan = p
    return p


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def choose_tile(topo: Topology, C: int, N: int, H: int,
                state_tips: bool) -> int | None:
    """Largest pattern tile whose working set fits VMEM, or None."""
    plan = _plan(topo)
    ns, nint, nnode = topo.ns, topo.n_internal, topo.nnode
    for Ht in (512, 256, 128):
        P_b = nnode * C * N * N * 4
        tips_b = 2 * (ns * Ht * 4 if state_tips else ns * N * Ht * 4)
        io_b = 2 * C * Ht * 4                   # lnf / gbar blocks
        fwd = P_b + tips_b + io_b + plan.nslots * C * N * Ht * 4
        bwd = (P_b + tips_b + 2 * io_b + nnode * C * N * N * 4 + C * N * 4
               + nint * C * N * Ht * 4
               + (plan.nslots + 1) * C * N * Ht * 4)
        if max(fwd, bwd) <= _VMEM_BUDGET:
            return Ht
    return None


# ---------------------------------------------------------------------------
# kernels (statically unrolled over the tree schedule)
# ---------------------------------------------------------------------------


def _onehot_rows(states_row, N, Ht, dtype):
    rows = jax.lax.broadcasted_iota(jnp.int32, (N, Ht), 0)
    return (rows == states_row[None, :]).astype(dtype)


def _dot(a, b, exact=False, mode=None):  # [N, N] @ [N, Ht]
    return mm_dot_general(a, b, (((1,), (0,)), ((), ())), exact, mode)


# --- class packing -----------------------------------------------------
# A [64, 64] x [64, Ht] matmul fills only (64/128)^2 of the 128x128 MXU.
# Packing `gs = 128 // N` classes into one block-diagonal
# [gs*N, gs*N] x [gs*N, Ht] matmul raises the fill to ~1 at the cost of
# gs x physical MACs (the zero off-diagonal blocks) — net ~gs x faster
# when MXU-bound.  The zero blocks contribute exact zeros, so results are
# bitwise per-class-equivalent up to contraction-order of added zeros.


# PAML_TPU_PACK=0 disables class packing (A/B measured on the bench
# workload, C=3: runtime within ~2% either way — the kernels are not
# MXU-fill-bound at these shapes — while packed backward compiles take
# ~70% longer; packing stays on for the higher-C NSsites shapes and
# because the persistent compile cache amortizes the one-time cost)
_PACK = _os.environ.get("PAML_TPU_PACK", "1") != "0"


def _class_group(N: int, C: int) -> int:
    if not _PACK:
        return 1
    return max(1, min(128 // N, C))


def _blockdiag(blocks):
    K = len(blocks)
    N = blocks[0].shape[0]
    z = jnp.zeros((N, N), blocks[0].dtype)
    rows = [jnp.concatenate([b if j == i else z for j in range(K)], axis=1)
            for i, b in enumerate(blocks)]
    return jnp.concatenate(rows, axis=0)


def _dot_classes(P_of, s_of, C, N, exact, dims=(((1,), (0,)), ((), ())),
                 mode=None):
    """stack([P_of(c) @ s_of(c) for c]) with block-diagonal class packing.

    dims (((1,),(0,))...) is P @ s; (((0,),(0,))...) is P^T @ s (both are
    block-diagonal-safe: the transpose of a block-diagonal matrix is
    block-diagonal)."""
    gs = _class_group(N, C)
    if gs == 1:
        return jnp.stack([mm_dot_general(P_of(c), s_of(c), dims, exact,
                                         mode)
                          for c in range(C)])
    outs = [None] * C
    c = 0
    while c < C:
        g = min(gs, C - c)
        if g == 1:
            outs[c] = mm_dot_general(P_of(c), s_of(c), dims, exact, mode)
        else:
            P2 = _blockdiag([P_of(c + i) for i in range(g)])
            s2 = jnp.concatenate([s_of(c + i) for i in range(g)], axis=0)
            cv = mm_dot_general(P2, s2, dims, exact, mode)
            for i in range(g):
                outs[c + i] = cv[i * N:(i + 1) * N]
        c += g
    return jnp.stack(outs)


def _outer_classes(G_of, s_of, C, N, exact, mode=None):
    """stack([G_of(c) @ s_of(c)^T for c]) ([N,Ht]x[N,Ht] -> [N,N],
    contraction over patterns) with row-stacked class packing: one
    [g*N, Ht] x [g*N, Ht] -> [g*N, g*N] matmul whose diagonal blocks are
    the per-class outer products."""
    gs = _class_group(N, C)
    dims = (((1,), (1,)), ((), ()))
    if gs == 1:
        return jnp.stack([mm_dot_general(G_of(c), s_of(c), dims, exact,
                                         mode)
                          for c in range(C)])
    outs = [None] * C
    c = 0
    while c < C:
        g = min(gs, C - c)
        if g == 1:
            outs[c] = mm_dot_general(G_of(c), s_of(c), dims, exact, mode)
        else:
            G2 = jnp.concatenate([G_of(c + i) for i in range(g)], axis=0)
            s2 = jnp.concatenate([s_of(c + i) for i in range(g)], axis=0)
            full = mm_dot_general(G2, s2, dims, exact, mode)  # [gN, gN]
            for i in range(g):
                outs[c + i] = full[i * N:(i + 1) * N, i * N:(i + 1) * N]
        c += g
    return jnp.stack(outs)


def _upward(plan: _Plan, C, N, Ht, read_tip, P_at, cbuf, sbuf=None,
            exact=False, mode=None, scale_set=None):
    """Shared unrolled upward sweep.

    read_tip(v) -> [N, Ht] or [C, N, Ht] tip partial; P_at(v, c) -> [N, N].
    Writes contributions into cbuf; optionally stores internal scaled
    partials into sbuf.  Returns (s_root [C, N, Ht], logm [C, Ht])."""
    topo = plan.topo
    ns, root = plan.ns, plan.root
    if scale_set is None:
        scale_set = plan.scale_set
    logm = jnp.zeros((C, Ht), jnp.float32)
    s_root = None
    for v in plan.order:
        if v < ns:
            s = read_tip(v)
            shared = s.ndim == 2          # same partial for every class
        else:
            kids = plan.kids_of[v]
            prod = cbuf[plan.slot[kids[0]]]
            for k in kids[1:]:
                prod = prod * cbuf[plan.slot[k]]
            if v in scale_set:
                m = jnp.max(prod, axis=1)                  # [C, Ht]
                msafe = jnp.where(m > 0, m, 1.0)
                s = prod / msafe[:, None, :]
                logm = logm + jnp.log(msafe)
            else:                    # sparse scaling: pass through
                s = prod
            shared = False
            if sbuf is not None:
                sbuf[v - ns] = s
        if v == root:
            s_root = s
            break
        cv = _dot_classes(lambda cc: P_at(v, cc),
                          (lambda cc: s) if shared else (lambda cc: s[cc]),
                          C, N, exact, mode=mode)
        cbuf[plan.slot[v]] = cv
    return s_root, logm


def _fwd_kernel_body(plan: _Plan, C, N, Ht, state_tips, exact,
                     tips_ref, P_ref, pi_ref, lnf_ref, cbuf):
    dtype = jnp.float32

    def read_tip(v):
        if state_tips:
            return _onehot_rows(tips_ref[v], N, Ht, dtype)
        return tips_ref[v]

    s_root, logm = _upward(plan, C, N, Ht, read_tip,
                           lambda v, c: P_ref[v, c], cbuf, exact=exact)
    pi = pi_ref[...]
    F = jnp.sum(pi[:, :, None] * s_root, axis=1)            # [C, Ht]
    F = jnp.maximum(F, jnp.finfo(dtype).tiny)
    lnf_ref[...] = jnp.log(F) + logm


def _bwd_kernel_body(plan: _Plan, C, N, Ht, state_tips, exact,
                     tips_ref, P_ref, pi_ref, gbar_ref,
                     dP_ref, dpi_ref, sbuf, abuf):
    """Recompute the upward sweep, then one downward adjoint sweep.

    dP/dpi are revisited output blocks accumulated across pattern tiles."""
    topo = plan.topo
    ns, root = plan.ns, plan.root
    dtype = jnp.float32

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dP_ref[...] = jnp.zeros_like(dP_ref)
        dpi_ref[...] = jnp.zeros_like(dpi_ref)

    def read_tip(v):
        if state_tips:
            return _onehot_rows(tips_ref[v], N, Ht, dtype)
        return tips_ref[v]

    _upward(plan, C, N, Ht, read_tip, lambda v, c: P_ref[v, c],
            abuf, sbuf=sbuf, exact=exact, mode=_BWD_MM,
            scale_set=plan.all_internal)  # abuf doubles as cbuf here

    pi = pi_ref[...]
    gbar = gbar_ref[...]
    s_root = sbuf[root - ns]
    F = jnp.sum(pi[:, :, None] * s_root, axis=1)
    F = jnp.maximum(F, jnp.finfo(dtype).tiny)
    gF = gbar / F                                           # [C, Ht]
    abuf[plan.root_aslot] = gF[:, None, :] * pi[:, :, None]
    dpi_ref[...] += jnp.sum(gF[:, None, :] * s_root, axis=2)

    for v in reversed(plan.order):
        if v < ns:
            continue
        kids = plan.kids_of[v]
        K = len(kids)
        aslot = plan.root_aslot if v == root else plan.slot[v]
        Av = abuf[aslot]                                    # [C, N, Ht]
        sk, ck = [], []
        for k in kids:
            s = sbuf[k - ns] if k >= ns else read_tip(k)
            shared = s.ndim == 2
            c = _dot_classes(
                lambda cc: P_ref[k, cc],
                (lambda cc: s) if shared else (lambda cc: s[cc]),
                C, N, exact, mode=_BWD_MM)
            sk.append(s)
            ck.append(c)
        # leave-one-out products over the (static) child list
        pre = [jnp.ones_like(ck[0])]
        for k in range(1, K):
            pre.append(pre[-1] * ck[k - 1])
        suf = [jnp.ones_like(ck[0])]
        for k in range(K - 2, -1, -1):
            suf.insert(0, suf[0] * ck[k + 1])
        prod = ck[0]
        for c in ck[1:]:
            prod = prod * c
        m = jnp.max(prod, axis=1)
        msafe = jnp.where(m > 0, m, 1.0)
        base = Av / msafe[:, None, :]
        for k, kid in enumerate(kids):
            G = base * (pre[k] * suf[k])                    # [C, N, Ht]
            G = jnp.clip(G, -_GRAD_CAP, _GRAD_CAP)
            G = jnp.where(jnp.isnan(G), 0.0, G)
            s = sk[k]
            dPk = _outer_classes(
                lambda cc: G[cc],
                (lambda cc: s) if s.ndim == 2 else (lambda cc: s[cc]),
                C, N, exact, mode=_BWD_MM)                  # [C, N, N]
            dP_ref[kid] += dPk
            if kid >= ns:
                Ak = _dot_classes(
                    lambda cc: P_ref[kid, cc], lambda cc: G[cc], C, N,
                    exact, dims=(((0,), (0,)), ((), ())),
                    mode=_BWD_MM)                           # [C, N, Ht]
                abuf[plan.slot[kid]] = Ak


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _params(interpret: bool):
    # scoped-vmem stack limit defaults to 16 MiB; v5e has 128 MiB VMEM
    if interpret:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_BUDGET)


def _pad_inputs(P, tips, pi, topo, Ht):
    """Pad states to N (sublane multiple) and patterns to a tile multiple."""
    n = P.shape[-1]
    N = max(_round_up(n, 8), 16)
    state_tips = jnp.asarray(tips).ndim == 2
    H = tips.shape[1]
    Hp = _round_up(H, Ht)
    Pp = jnp.pad(P.astype(jnp.float32),
                 ((0, 0), (0, 0), (0, N - n), (0, N - n)))
    pip = jnp.pad(pi.astype(jnp.float32), ((0, 0), (0, N - n)))
    if state_tips:
        tp = jnp.pad(jnp.asarray(tips, jnp.int32), ((0, 0), (0, Hp - H)))
    else:
        # [ns, H, n] -> padded, transposed [ns, N, Hp]
        t = jnp.swapaxes(jnp.asarray(tips, jnp.float32), 1, 2)
        tp = jnp.pad(t, ((0, 0), (0, N - n), (0, Hp - H)))
    return Pp, tp, pip, n, N, H, Hp, state_tips


def _fwd_call(P, tips, pi, topo: Topology, Ht: int, interpret=False):
    with jax.enable_x64(False):
        return _fwd_call_x32(P, tips, pi, topo, Ht, interpret)


def _fwd_call_x32(P, tips, pi, topo: Topology, Ht: int, interpret=False):
    # NOTE: traced with x64 scoped OFF — under jax_enable_x64 (the f64
    # host stages need it) Python-int literals inside the kernel body
    # otherwise become i64 scalars, which Mosaic refuses to legalize
    plan = _plan(topo)
    Pp, tp, pip, n, N, H, Hp, state_tips = _pad_inputs(P, tips, pi, topo, Ht)
    C = P.shape[1]
    grid = Hp // Ht
    tips_spec = (pl.BlockSpec((topo.ns, Ht), lambda i: (0, i))
                 if state_tips
                 else pl.BlockSpec((topo.ns, N, Ht), lambda i: (0, 0, i)))
    kern = partial(_fwd_kernel_body, plan, C, N, Ht, state_tips, interpret)
    lnf = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            tips_spec,
            pl.BlockSpec((topo.nnode, C, N, N), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((C, N), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((C, Ht), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((C, Hp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((plan.nslots, C, N, Ht), jnp.float32)],
        compiler_params=_params(interpret),
        interpret=interpret,
    )(tp, Pp, pip)
    return lnf[:, :H]


def _bwd_call(P, tips, pi, gbar, topo: Topology, Ht: int, interpret=False):
    with jax.enable_x64(False):
        return _bwd_call_x32(P, tips, pi, gbar, topo, Ht, interpret)


def _bwd_call_x32(P, tips, pi, gbar, topo: Topology, Ht: int,
                  interpret=False):
    plan = _plan(topo)
    Pp, tp, pip, n, N, H, Hp, state_tips = _pad_inputs(P, tips, pi, topo, Ht)
    C = P.shape[1]
    grid = Hp // Ht
    gb = jnp.pad(gbar.astype(jnp.float32), ((0, 0), (0, Hp - H)))
    tips_spec = (pl.BlockSpec((topo.ns, Ht), lambda i: (0, i))
                 if state_tips
                 else pl.BlockSpec((topo.ns, N, Ht), lambda i: (0, 0, i)))
    kern = partial(_bwd_kernel_body, plan, C, N, Ht, state_tips, interpret)
    dP, dpi = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            tips_spec,
            pl.BlockSpec((topo.nnode, C, N, N), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((C, N), lambda i: (0, 0)),
            pl.BlockSpec((C, Ht), lambda i: (0, i)),
        ],
        out_specs=(
            pl.BlockSpec((topo.nnode, C, N, N), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((C, N), lambda i: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((topo.nnode, C, N, N), jnp.float32),
            jax.ShapeDtypeStruct((C, N), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((topo.n_internal, C, N, Ht), jnp.float32),
            pltpu.VMEM((plan.nslots + 1, C, N, Ht), jnp.float32),
        ],
        compiler_params=_params(interpret),
        interpret=interpret,
    )(tp, Pp, pip, gb)
    dP = jnp.nan_to_num(dP[:, :, :n, :n], nan=0.0, posinf=_BIG,
                        neginf=-_BIG)
    dpi = jnp.nan_to_num(dpi[:, :n], nan=0.0, posinf=_BIG, neginf=-_BIG)
    return dP, dpi


# ---------------------------------------------------------------------------
# custom-VJP public entry
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(2, 4, 5))
def class_site_lnf_pallas(P, tips, topo: Topology, pi, Ht: int = 512,
                          interpret: bool = False):
    """Per-(class, pattern) log site likelihood [C, H] via the fused
    Pallas kernel.  Same contract as pruning.class_site_lnf."""
    return _fwd_call(P, tips, pi, topo, Ht, interpret)


def _vjp_fwd(P, tips, topo, pi, Ht, interpret):
    lnf = _fwd_call(P, tips, pi, topo, Ht, interpret)
    return lnf, (P, tips, pi)


def _vjp_bwd(topo, Ht, interpret, res, gbar):
    P, tips, pi = res
    dP, dpi = _bwd_call(P, tips, pi, gbar, topo, Ht, interpret)
    if jnp.asarray(tips).ndim == 2:
        dtips = np.zeros(tips.shape, dtype=jax.dtypes.float0)
    else:
        dtips = jnp.zeros(tips.shape, jnp.float32)
    return dP.astype(P.dtype), dtips, dpi.astype(pi.dtype)


class_site_lnf_pallas.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# dispatch hook used by pruning.class_site_lnf
# ---------------------------------------------------------------------------

_mode = "auto"     # "auto" | "on" | "off"


def set_pallas_mode(mode: str) -> None:
    global _mode
    assert mode in ("auto", "on", "off")
    _mode = mode


def _tpu_backend() -> bool:
    try:
        # an active jax.default_device(...) overrides the process default
        # backend (jax.default_backend() ignores it; compiling a
        # non-interpret pallas_call for CPU is an error)
        dd = jax.config.jax_default_device
        if dd is not None:
            # jax.default_device accepts a Device or a platform string
            plat = dd if isinstance(dd, str) else dd.platform
            return plat in ("tpu", "axon")
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def maybe_pallas_lnf(P, tips, topo: Topology, pi, in_shard: bool = False):
    """Return the pallas lnf if this problem should use the fused kernel,
    else None (caller falls back to the einsum paths).

    in_shard: True when called from inside a shard_map body
    (pruning._class_site_lnf_sharded) — the kernel then runs on each
    device's local pattern shard, so the multi-device guard is skipped."""
    import os
    if not _HAVE_PALLAS or _mode == "off":
        return None
    env = os.environ.get("PAML_TPU_PALLAS", "")
    if env == "0":
        return None
    if _mode == "auto" and env != "1" and not _tpu_backend():
        return None
    # vmapped calls (mcmctree loci, evolver replicates) stay on the
    # einsum paths: pallas_call batching would add a grid axis per locus
    if any(type(x).__name__ == "BatchTracer" for x in (P, tips, pi)):
        return None
    # multi-device processes keep the einsum paths UNLESS the caller
    # explicitly partitioned the pattern axis with shard_map (in_shard) —
    # XLA cannot partition a pallas custom call on its own; an explicit
    # PAML_TPU_PALLAS=1 (tests) also overrides
    try:
        if (not in_shard and env != "1" and _mode != "on"
                and jax.device_count() > 1):
            return None
    except Exception:  # pragma: no cover
        return None
    n = P.shape[-1]
    if n < 16:            # nucleotide models: einsum path is already fine
        return None
    if P.dtype not in (jnp.float32, np.float32):
        return None
    C = P.shape[1]
    N = max(_round_up(n, 8), 16)
    state_tips = jnp.asarray(tips).ndim == 2
    H = tips.shape[1]
    interpret = not _tpu_backend()      # CPU: interpreter mode (tests)
    Ht = choose_tile(topo, C, N, H, state_tips)
    if Ht is not None:
        return class_site_lnf_pallas(P, tips, topo, pi, Ht, interpret)
    if state_tips:
        # large trees: dynamic-schedule kernel (P/S streamed via DMA)
        from . import pallas_pruning_big
        Htb = pallas_pruning_big.choose_tile_big(topo, C, N, n=n)
        if Htb is not None:
            return pallas_pruning_big.class_site_lnf_big(
                P, tips, topo, pi, Htb, interpret)
    return None
