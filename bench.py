"""Benchmark: site-pattern likelihood evals/sec/chip (61-state codon).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

Primary workload (unchanged across rounds so values are comparable):
jitted value+gradient of an NSsites-style codon log-likelihood (the
optimizer inner loop) on a synthetic alignment — 32 taxa (ladder tree,
worst-case serial depth), 4096 site patterns, 61 states, 3 site classes,
float32 partials on the TPU chip.  Kernel matmuls run the 3-pass bf16x3
product (~f32-faithful; see pallas_pruning.mm_dot_general).

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

    dt, (v, g) = _time_steps(step, x)
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

    print(json.dumps({
        "metric": "codon61_sitepattern_lnl+grad_evals_per_sec_per_chip",
        "value": round(pattern_evals_per_sec, 1),
        "unit": "site-pattern-evals/s",
        "vs_baseline": round(vs_baseline, 2),
        "extra": {
            "primary_ms_per_eval": round(dt * 1e3, 3),
            "mfu_vs_bf16_peak": round(mfu, 4),
            "tpu_vs_cpu_f32_lnl_absdiff": round(f32_err, 6),
            "tpu_vs_cpu_f32_lnl_reldiff": round(f32_rel, 10),
            "big_shape": f"{BIG_TAXA}taxa x {BIG_NPATT}patt branch-site A",
            "big_pattern_evals_per_sec": round(big_pattern_evals, 1),
            "big_ms_per_eval": round(bdt * 1e3, 1),
        },
    }))


if __name__ == "__main__":
    main()
