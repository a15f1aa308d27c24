"""Benchmark: site-pattern likelihood evals/sec/chip (61-state codon).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

Primary workload (unchanged across rounds so values are comparable):
jitted value+gradient of an NSsites-style codon log-likelihood (the
optimizer inner loop) on a synthetic alignment — 32 taxa (ladder tree,
worst-case serial depth), 4096 site patterns, 61 states, 3 site classes,
float32 partials on the TPU chip.  Kernel matmuls run the 3-pass bf16x3
product (~f32-faithful; see pallas_pruning.mm_dot_general).

Timing (r4+): steps run back-to-back inside one jit (lax.scan), the way
the production inner loops execute (on-device L-BFGS, MCMC proposals).
Per-step Python dispatch additionally pays a ~0.9 ms host/tunnel gap on
this setup and is reported as primary_ms_per_eval_with_dispatch
(r1-r3 values used that methodology).

`extra` adds:
  - big_pattern_evals_per_sec: the BASELINE.json north-star shape — a
    1024-taxon / 10240-pattern branch-site-A (4-class) lnL+grad eval,
    pattern-chunked with rematerialization so it fits in HBM.
  - mfu: primary-workload model-FLOP utilization against the chip's bf16
    peak (fwd contraction FLOPs x ~4 for fwd+recompute+dP+dA adjoint).
  - tpu_vs_cpu_f32_lnl_absdiff: TPU f32 lnL vs an exact-f32 CPU evaluation
    of the same point (numerics sanity on the real chip).

Baseline: the reference codeml evaluates `lfun` (value only; its gradients
cost extra finite-difference evals).  Measured on this machine
(single-core C, -O3): M2a on HIVenvSweden = 1660 lfun evals in 17 s with
23 branches x 3 classes x 79 patterns -> 5.32e5 branch-class-pattern
partial updates/sec.  vs_baseline is the ratio of per-chip update
throughput (ours counts the gradient as part of the same eval).
"""
import json
import time

import numpy as np

REF_UPDATES_PER_SEC = 5.32e5     # reference codeml, measured (see docstring)

NS_TAXA = 32
NPATT = 4096
K_CLASSES = 3                    # NSsites=3 (M3) with default ncatG=3

BIG_TAXA = 1024
BIG_NPATT = 10240
BIG_CHUNKS = 10

PEAK_BF16 = 197e12               # TPU v5e (v5 lite) chip peak


def _time_steps(step, x, n_iter=30, warmup=12):
    import jax
    for i in range(warmup):
        out = step(x + 1e-6 * i)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(n_iter):
        out = step(x + 1e-6 * i)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_iter, out


def _time_steps_fused(neg_lnl, x, n_iter=30, reps=3):
    """Back-to-back value+grad steps inside ONE jit (lax.scan) — the
    production inner loop (on-device L-BFGS, MCMC) runs this way, with
    no host dispatch between evaluations.  The per-step Python-dispatch
    measurement (_time_steps) additionally pays the host/tunnel gap
    (~0.9 ms/step on this setup; profiler-verified device busy time
    matches the fused number)."""
    import jax
    import jax.numpy as jnp

    xs = x[None, :] + 1e-6 * jnp.arange(n_iter, dtype=x.dtype)[:, None]

    @jax.jit
    def run(xs):
        def body(c, xi):
            v, g = jax.value_and_grad(neg_lnl)(xi)
            return c + v + jnp.sum(g) * 1e-30, None
        tot, _ = jax.lax.scan(body, jnp.asarray(0.0, x.dtype), xs)
        return tot

    out = run(xs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(xs)
    jax.block_until_ready(out)
    assert bool(jnp.isfinite(out))
    return (time.perf_counter() - t0) / (reps * n_iter)


def _big_branchsite_problem():
    """1024-taxon balanced tree, branch-site A, 10240 patterns, chunked."""
    import jax.numpy as jnp

    from paml_tpu.apps.codeml import CodemlSpec, make_codon_objective
    from paml_tpu.core.topology import from_treenode
    from paml_tpu.io import seqio, treeio
    from paml_tpu.models.codon import codon_graph

    rng = np.random.default_rng(7)
    graph = codon_graph(0)
    names = [f"t{i}" for i in range(BIG_TAXA)]

    def bal(lo, hi):
        if hi - lo == 1:
            return names[lo]
        mid = (lo + hi) // 2
        return f"({bal(lo, mid)},{bal(mid, hi)})"
    # foreground = first half of the tree (branch-site A needs 2 branch types)
    nwk = f"({bal(0, BIG_TAXA // 2)} #1,{bal(BIG_TAXA // 2, BIG_TAXA)});"
    tree = treeio.parse_newick(nwk)
    for node in tree.walk_post():
        node.blen = float(rng.uniform(0.02, 0.3))
    topo = from_treenode(tree, names)

    # integer state codes (clean data): 40 MB instead of a 2.5 GB one-hot
    states = rng.integers(0, graph.n,
                          size=(BIG_TAXA, BIG_NPATT)).astype(np.int32)
    fpatt = rng.integers(1, 6, size=BIG_NPATT).astype(np.float32)
    data = seqio.PackedData(
        names=names, seqtype=1, nstates=graph.n, tip_partials=states,
        fpatt=fpatt, ls=int(fpatt.sum()),
        posG=np.array([0, BIG_NPATT]),
        base_freqs=np.full(graph.n, 1 / graph.n))
    spec = CodemlSpec(NSsites=2, model=2, codonf="Fequal", cleandata=True,
                      omega=1.5)
    neg_lnl, *_rest = make_codon_objective(data, topo, spec,
                                           dtype=jnp.float32,
                                           n_chunks=BIG_CHUNKS)
    x0 = _rest[2]
    return neg_lnl, np.asarray(x0, np.float32), states, fpatt


def _parity_configs():
    """Golden example configs for the on-chip parity pass: (name,
    builder) where builder() -> (neg_lnl_f32, neg_lnl_f64, x0, golden_lnL).
    The f64 CPU fit supplies x-hat; the f32 objective is evaluated at
    x-hat on the real TPU and on CPU."""
    REF = "/root/reference/examples"

    def codon(seqfile, treefile, golden, **kw):
        def build():
            import jax.numpy as jnp

            from paml_tpu.apps.codeml import (CodemlSpec, fit_packed,
                                              make_codon_objective)
            from paml_tpu.core.topology import from_treenode
            from paml_tpu.io import seqio, treeio
            aln = seqio.read_alignment(f"{REF}/{seqfile}", 1)
            data = seqio.pack(aln, cleandata=True, icode=0)
            topo = from_treenode(
                treeio.read_trees(f"{REF}/{treefile}", data.names)[0],
                data.names)
            spec = CodemlSpec(cleandata=True, **kw)
            res = fit_packed(data, topo, spec, dtype=jnp.float64)
            neg64, *_ = make_codon_objective(data, topo, spec,
                                             dtype=jnp.float64)
            neg32, *_ = make_codon_objective(data, topo, spec,
                                             dtype=jnp.float32)
            return neg32, neg64, np.asarray(res.x), golden
        return build

    def nuc(seqfile, treefile, golden, **kw):
        def build():
            import jax.numpy as jnp

            from paml_tpu.apps.baseml import (BasemlSpec, fit_packed,
                                              make_objective)
            from paml_tpu.core.topology import from_treenode
            from paml_tpu.io import seqio, treeio
            aln = seqio.read_alignment(f"{REF}/{seqfile}", 0)
            data = seqio.pack(aln, cleandata=True)
            topo = from_treenode(
                treeio.read_trees(f"{REF}/{treefile}", data.names)[0],
                data.names)
            spec = BasemlSpec(cleandata=True, **kw)
            res = fit_packed(data, topo, spec, dtype=jnp.float64)
            neg64, *_ = make_objective(data, topo, spec,
                                       dtype=jnp.float64)
            neg32, *_ = make_objective(data, topo, spec,
                                       dtype=jnp.float32)
            return neg32, neg64, np.asarray(res.x), golden
        return build

    # goldens: tests/golden_*.json values (published/reference-run optima)
    return [
        ("brown_K80", nuc("brown.nuc", "brown.trees", -2748.411046,
                          model="K80")),
        ("brown_HKY_G5", nuc("brown.nuc", "brown.trees", -2621.55434,
                             model="HKY85", ncatG=5, fix_alpha=False,
                             alpha=0.5)),
        ("abglobin_M0_F3x4", codon("abglobin.nuc", "abglobin.trees",
                                   -3048.771401)),
        ("lysozyme_M1a", codon("lysozyme/lysozymeSmall.nuc",
                               "lysozyme/lysozymeSmall.trees",
                               -902.503872, NSsites=1)),
        ("lysozyme_M2a", codon("lysozyme/lysozymeSmall.nuc",
                               "lysozyme/lysozymeSmall.trees",
                               -899.998568, NSsites=2)),
        ("lysozyme_M7", codon("lysozyme/lysozymeSmall.nuc",
                              "lysozyme/lysozymeSmall.trees",
                              -902.510018, NSsites=7, ncatG=10)),
        ("lysozyme_M8", codon("lysozyme/lysozymeSmall.nuc",
                              "lysozyme/lysozymeSmall.trees",
                              -899.999237, NSsites=8, ncatG=10)),
        ("lysozyme_branchsiteA",
         codon("lysozyme/lysozymeSmall.nuc",
               "lysozyme/lysozymeSmall.trees", -898.514392, model=2,
               NSsites=2, omega=1.5)),
    ]


def parity_main():
    """On-chip golden parity pass (VERDICT r3 item 5): f32 forward lnL
    (and one gradient) on the real TPU at the CPU-f64 MLE for each golden
    config, rel error vs the f64 value; plus LRT cancellation — Delta lnL
    between nested pairs on TPU vs CPU within 0.01."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)
    cpu = jax.devices("cpu")[0]
    try:
        tpu = [d for d in jax.devices() if d.platform != "cpu"][0]
    except (RuntimeError, IndexError):
        tpu = None

    # Phase A (CPU, x64 on): f64 fits for x-hat + f64/f32 CPU values.
    rows = {}
    lnls_tpu, lnls_64 = {}, {}
    staged = []
    for name, build in _parity_configs():
        with jax.default_device(cpu):
            neg32, neg64, xhat, golden = build()
            x64 = jnp.asarray(xhat, jnp.float64)
            v64 = -float(jax.jit(neg64)(x64))
            x32 = jnp.asarray(xhat, jnp.float32)
            v32_cpu = -float(jax.jit(neg32)(x32))
        rows[name] = {
            "golden_lnL": golden, "cpu_f64_lnL": round(v64, 6),
            "cpu_f64_vs_golden": round(abs(v64 - golden), 6),
            "cpu_f32_rel": round(abs(v32_cpu - v64) / abs(v64), 10)}
        lnls_64[name] = v64
        staged.append((name, neg32, np.asarray(xhat, np.float32), v64))

    # Phase B (TPU, x64 OFF — Mosaic kernels reject i64 scalars that
    # x64 mode introduces; the production chip path always runs x32).
    if tpu is not None:
        jax.config.update("jax_enable_x64", False)
        for name, neg32, xhat, v64 in staged:
            with jax.default_device(tpu):
                f = jax.jit(jax.value_and_grad(neg32))
                vt, gt = f(jnp.asarray(xhat, jnp.float32))
                v32_tpu = -float(vt)
                gfinite = bool(jnp.all(jnp.isfinite(gt)))
            row = rows[name]
            row["tpu_f32_lnL"] = round(v32_tpu, 6)
            row["tpu_f32_rel"] = round(abs(v32_tpu - v64) / abs(v64), 10)
            row["tpu_grad_finite"] = gfinite
            # 1e-5: the SURVEY section-7 parity bar (restored from the
            # temporarily widened 1.2e-5 after the pmat HIGH-precision
            # change tightened the envelope; VERDICT r4 weak #7)
            # historical note: observed f32 envelope across the set (max
            # 1.04e-5 on M2a; eps32 ~ 1.2e-7 accumulated over ~1e2
            # dependent ops).  The LRT-cancellation check below is the
            # inference-grade assertion (Delta lnL within 0.01).
            row["pass"] = (row["tpu_f32_rel"] <= 1e-5 and gfinite)
            lnls_tpu[name] = v32_tpu
            import sys
            print(f"# parity {name}: tpu_f32_rel="
                  f"{row['tpu_f32_rel']:.3g} grad_finite={gfinite}",
                  file=sys.stderr)

    nested = {}
    for pair in (("lysozyme_M2a", "lysozyme_M1a"),
                 ("lysozyme_M8", "lysozyme_M7")):
        a, b = pair
        if a in lnls_tpu and b in lnls_tpu:
            d_tpu = lnls_tpu[a] - lnls_tpu[b]
            d_cpu = lnls_64[a] - lnls_64[b]
            nested[f"{a}-{b}"] = {
                "delta_tpu": round(d_tpu, 6), "delta_cpu64": round(d_cpu, 6),
                "absdiff": round(abs(d_tpu - d_cpu), 6),
                "pass": abs(d_tpu - d_cpu) <= 0.01}

    ok = (all(r.get("pass", True) for r in rows.values())
          and all(v["pass"] for v in nested.values()))
    out = {"metric": "onchip_golden_parity",
           "value": int(ok),
           "unit": "all_pass",
           "vs_baseline": 1.0,
           "extra": {"configs": rows, "lrt_cancellation": nested,
                     "tpu_present": tpu is not None}}
    print(json.dumps(out))
    with open("PARITY.json", "w") as f:
        json.dump(out, f, indent=1)


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_codon_problem

    neg_lnl, x0, tips, fpatt = _synthetic_codon_problem(
        ns=NS_TAXA, npatt=NPATT, NSsites=3, seed=1)
    x = jnp.asarray(x0)

    step = jax.jit(jax.value_and_grad(neg_lnl))
    v, g = step(x)
    v.block_until_ready()
    assert bool(jnp.isfinite(v)), "non-finite benchmark loss"

    dt_dispatch, (v, g) = _time_steps(step, x)
    # production-loop timing: steps fused under one jit (see docstring)
    dt = _time_steps_fused(neg_lnl, x)
    evals_per_sec = 1.0 / dt
    pattern_evals_per_sec = evals_per_sec * NPATT
    nbranch = 2 * NS_TAXA - 2      # ladder tree from the synthetic problem
    updates_per_sec = evals_per_sec * NPATT * nbranch * K_CLASSES
    vs_baseline = updates_per_sec / REF_UPDATES_PER_SEC

    # model-FLOP utilization: contraction flops only (2*n^2 per
    # (branch, class, pattern)), x4 for the analytic-adjoint val+grad
    n_states = 61
    nnode = 2 * NS_TAXA - 1
    fwd_flops = (nnode - 1) * K_CLASSES * NPATT * 2 * n_states * n_states
    mfu = 4 * fwd_flops / dt / PEAK_BF16

    # measured phase split: P(t)-model construction vs the pruning kernel
    # (the pruning VJP is the remainder of the fused step)
    xs30 = x[None, :] + 1e-6 * jnp.arange(30, dtype=x.dtype)[:, None]

    @jax.jit
    def ma_scan(xs):
        def body(c, xi):
            P_, piC_, fr_ = neg_lnl.model_at(xi)
            # consume ALL of P so XLA cannot dead-code-eliminate any of
            # the P(t) construction
            return c + jnp.sum(P_) + jnp.sum(fr_), None
        tot, _ = jax.lax.scan(body, jnp.asarray(0.0, x.dtype), xs)
        return tot
    out_ma = ma_scan(xs30)
    jax.block_until_ready(out_ma)
    t0 = time.perf_counter()
    for _ in range(3):
        out_ma = ma_scan(xs30)
    jax.block_until_ready(out_ma)
    model_ms = (time.perf_counter() - t0) / 90 * 1e3
    phase_split = {
        "model_at_fwd_ms": round(model_ms, 3),
        "fused_step_ms": round(dt * 1e3, 3),
        "note": "model_at = Q build + uniformization P(t); "
                "remainder = pruning kernel fwd+adjoint + overheads",
    }

    # --- roofline breakdown (VERDICT r3 item 3): where the peak goes ---
    # The fused kernel pads 61 states to N_pad sublanes and runs the
    # 3-pass bf16x3 product; the MXU is a 128x128 systolic array, so a
    # [64, 64] x [64, Ht] matmul fills only (64/128)^2 of it per pass.
    N_pad = 64
    pad_factor = (N_pad * N_pad) / (n_states * n_states)
    mm_passes = {"bf16": 1, "3pass": 3, "6pass": 6}[
        __import__("paml_tpu.core.pallas_pruning",
                   fromlist=["_MM_MODE"])._MM_MODE]
    mxu_fill = (N_pad / 128) ** 2
    # fraction of peak spent on physical MACs (incl. padding + passes)
    physical_frac = mfu * pad_factor * mm_passes
    # ceiling on useful MFU if the MXU were 100% busy at this fill
    ceiling_useful = mxu_fill / pad_factor / mm_passes
    roofline = {
        "n_states": n_states, "n_pad": N_pad,
        "pad_factor": round(pad_factor, 3),
        "mm_passes": mm_passes,
        "mxu_fill_frac": round(mxu_fill, 3),
        "physical_macs_frac_of_peak": round(physical_frac, 4),
        "useful_mfu_ceiling_at_full_mxu_busy": round(ceiling_useful, 4),
        "mxu_busy_frac_est": round(physical_frac / mxu_fill, 4),
    }

    # TPU numerics vs exact-f32 CPU evaluation at the same point (einsum
    # paths; the fused kernel cannot compile for CPU)
    from paml_tpu.core.pallas_pruning import set_pallas_mode
    set_pallas_mode("off")
    try:
        with jax.default_device(jax.devices("cpu")[0]):
            v_cpu = float(jax.jit(lambda y: neg_lnl(y))(jnp.asarray(x0)))
    finally:
        set_pallas_mode("auto")
    f32_err = abs(float(v) - v_cpu)
    f32_rel = f32_err / abs(v_cpu)

    # north-star shape: 1k taxa x 10k patterns, branch-site A, chunked;
    # data passed as arguments (not closure constants) so the 40 MB state
    # array is a device buffer, not baked into the executable
    big_fn, big_x0, bstates, bfpatt = _big_branchsite_problem()
    bts = jnp.asarray(bstates)
    bfp = jnp.asarray(bfpatt)

    @jax.jit
    def big_step(x):
        return jax.value_and_grad(
            lambda p: big_fn.with_data(p, bts, bfp))(x)
    bx = jnp.asarray(big_x0)
    bdt, (bv, _) = _time_steps(big_step, bx, n_iter=5, warmup=3)
    assert bool(jnp.isfinite(bv)), "non-finite big-shape loss"
    big_pattern_evals = BIG_NPATT / bdt

    # big-kernel HBM traffic model (pallas_pruning_big shapes): per
    # val+grad eval the P array streams through VMEM twice (fwd + bwd,
    # once per pattern tile), the S checkpoint is written fwd and read
    # bwd, and per-tile dP partials are written then reduced by XLA
    from paml_tpu.core import pallas_pruning_big as pbig
    from paml_tpu.core.topology import from_treenode as _ftn
    bC = 4                                   # branch-site A classes
    bnnode = 2 * BIG_TAXA - 1
    bnint = bnnode - BIG_TAXA
    NJ, Nb = pbig._NJ, 128
    Ht = 512                                 # choose_tile_big preference
    grid_total = BIG_NPATT // Ht
    P_bytes = bnnode * bC * NJ * Nb * 4
    S_bytes = bnint * bC * Nb * BIG_NPATT * 4
    dP_tile_bytes = grid_total * bnnode * bC * NJ * Nb * 4
    hbm_bytes = (2 * grid_total * P_bytes      # P stream fwd + bwd
                 + 2 * S_bytes                 # S write (fwd) + read (bwd)
                 + 2 * dP_tile_bytes           # dP write + XLA reduce read
                 + 2 * BIG_TAXA * BIG_NPATT * 4)   # tips fwd + bwd
    HBM_PEAK = 819e9                           # v5e HBM bandwidth
    big_gbps = hbm_bytes / bdt / 1e9
    # padded MACs: fwd 1 matmul/branch + bwd 2 (dA, dP), x3 bf16 passes
    big_fwd_macs = (bnnode - 1) * bC * BIG_NPATT * 2 * NJ * Nb * 3
    big_roofline = {
        "hbm_model_gb_per_eval": round(hbm_bytes / 1e9, 2),
        "achieved_gbps": round(big_gbps, 1),
        "hbm_frac_of_peak": round(big_gbps * 1e9 / HBM_PEAK, 3),
        "padded_mac_frac_of_peak": round(
            3 * big_fwd_macs / bdt / PEAK_BF16, 3),
        # r5 measurement note: the kernel is NOT HBM-traffic-bound (the
        # r4 S-checkpoint hypothesis): halving S traffic via cherry
        # recompute, deepening DMA rings, and binary-tree VPU
        # specialization each moved <2%; doubling the pattern tile
        # (Ht 512 -> 1024, halving step count) moved ~2%, so the cost
        # scales with per-step [C, N, Ht] VMEM/VPU work in the serial
        # postorder walk, not with fixed per-step overhead or HBM bytes.
        # bf16 adjoint matmuls (-12%) was the one real lever; fwd-only
        # (81 ms) x ~2.5 adjoint multiplier is this design's floor.
        "bound_by": "serial per-node VMEM/VPU work (see note)",
    }

    # on-chip convergence: whole abglobin M0 fit on the TPU via the
    # bounded on-device L-BFGS (no host round-trips; VERDICT r3 weak 5)
    onchip_fit = None
    try:
        from paml_tpu.apps import codeml as codeml_app
        from paml_tpu.core.optim import maximize_jax_bounded
        from paml_tpu.core.topology import from_treenode
        from paml_tpu.io import seqio, treeio
        REFEX = "/root/reference/examples"
        aln = seqio.read_alignment(f"{REFEX}/abglobin.nuc", 1)
        adata = seqio.pack(aln, cleandata=True, icode=0)
        atopo = from_treenode(
            treeio.read_trees(f"{REFEX}/abglobin.trees", adata.names)[0],
            adata.names)
        aneg, *_arest = codeml_app.make_codon_objective(
            adata, atopo, codeml_app.CodemlSpec(cleandata=True),
            dtype=jnp.float32)
        t0 = time.perf_counter()
        _x, alnl, ait = maximize_jax_bounded(aneg, _arest[2], _arest[3],
                                             dtype=jnp.float32)
        onchip_fit = {
            "config": "abglobin M0 F3x4 (golden lnL -3048.771401)",
            "wall_s": round(time.perf_counter() - t0, 2),
            "lnL": round(alnl, 4), "iters": ait,
            "lnL_gap_vs_golden": round(abs(alnl - -3048.771401), 4)}
    except Exception as e:  # keep the primary metric robust
        onchip_fit = {"error": str(e)[:200]}

    # Full detail (rooflines, phase splits, aux tables) goes to a file;
    # stdout's final line stays compact so the driver's tail capture can
    # parse it (VERDICT r4 missing #4).
    detail = {
        "primary_ms_per_eval": round(dt * 1e3, 3),
        "primary_ms_per_eval_with_dispatch": round(dt_dispatch * 1e3, 3),
        "mfu_vs_bf16_peak": round(mfu, 4),
        "roofline": roofline,
        "phase_split": phase_split,
        "tpu_vs_cpu_f32_lnl_absdiff": round(f32_err, 6),
        "tpu_vs_cpu_f32_lnl_reldiff": round(f32_rel, 10),
        "big_shape": f"{BIG_TAXA}taxa x {BIG_NPATT}patt branch-site A",
        "big_pattern_evals_per_sec": round(big_pattern_evals, 1),
        "big_ms_per_eval": round(bdt * 1e3, 1),
        "big_roofline": big_roofline,
        "onchip_fit_abglobin_M0": onchip_fit,
        "convergence_wall_times": _load_aux_json("BENCH_EXAMPLES.json"),
        "onchip_parity": _load_aux_json("PARITY.json"),
    }
    with open("BENCH_DETAIL.json", "w") as f:
        json.dump(detail, f, indent=1)
    print(json.dumps({
        "metric": "codon61_sitepattern_lnl+grad_evals_per_sec_per_chip",
        "value": round(pattern_evals_per_sec, 1),
        "unit": "site-pattern-evals/s",
        "vs_baseline": round(vs_baseline, 2),
        "extra": {
            "primary_ms_per_eval": round(dt * 1e3, 3),
            "mfu_vs_bf16_peak": round(mfu, 4),
            "big_ms_per_eval": round(bdt * 1e3, 1),
            "f32_rel": round(f32_rel, 10),
            "detail_file": "BENCH_DETAIL.json",
        },
    }))


def _load_aux_json(path):
    """Fold in the latest committed aux benchmark tables (produced by
    bench_examples.py and `bench.py --parity`) so BENCH_rN carries them."""
    import os
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            return json.load(f)
    except Exception:
        return None


if __name__ == "__main__":
    import sys
    if "--parity" in sys.argv:
        parity_main()
    else:
        main()
