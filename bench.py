"""Benchmark: site-pattern likelihood evals/sec/chip (61-state codon).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload: jitted value+gradient of an NSsites-style codon log-likelihood
(the optimizer inner loop) on a synthetic alignment — 32 taxa, 4096 site
patterns, 61 states, 4 site classes, float32 on the TPU chip.

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


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_codon_problem

    neg_lnl, x0, tips, fpatt = _synthetic_codon_problem(
        ns=NS_TAXA, npatt=NPATT, NSsites=3, seed=1)
    x = jnp.asarray(x0)

    step = jax.jit(jax.value_and_grad(neg_lnl))
    # compile + warm up
    v, g = step(x)
    v.block_until_ready()
    assert bool(jnp.isfinite(v)), "non-finite benchmark loss"

    # timed region
    n_iter = 30
    t0 = time.perf_counter()
    for i in range(n_iter):
        v, g = step(x + 1e-6 * i)
    v.block_until_ready()
    dt = time.perf_counter() - t0

    evals_per_sec = n_iter / dt
    pattern_evals_per_sec = evals_per_sec * NPATT
    nbranch = 2 * NS_TAXA - 2      # ladder tree from the synthetic problem
    updates_per_sec = evals_per_sec * NPATT * nbranch * K_CLASSES
    vs_baseline = updates_per_sec / REF_UPDATES_PER_SEC

    print(json.dumps({
        "metric": "codon61_sitepattern_lnl+grad_evals_per_sec_per_chip",
        "value": round(pattern_evals_per_sec, 1),
        "unit": "site-pattern-evals/s",
        "vs_baseline": round(vs_baseline, 2),
    }))


if __name__ == "__main__":
    main()
