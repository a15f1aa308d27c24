"""Parameter-level MLE parity (VERDICT round-1 weakness: lnL-only
assertions can hide wrong parameter conventions).

Published values from examples/mtCDNAape/README.txt and
examples/mtCDNA/AAcodon.result.txt.
"""
import numpy as np
import pytest

import conftest  # noqa: F401
from paml_tpu.apps import codeml
from paml_tpu.core.topology import from_treenode
from paml_tpu.io import seqio, treeio


def _ape(spec):
    EX = conftest.ref_path("examples", "mtCDNAape")
    aln = seqio.read_alignment(f"{EX}/mtCDNAape.txt", 1)
    data = seqio.pack(aln, cleandata=False, icode=1)
    trees = treeio.read_trees(f"{EX}/mtCDNAape.trees", data.names)
    topo = from_treenode(trees[0], data.names)
    return codeml.fit_packed(data, topo, spec)


def test_m0_ape_kappa_omega():
    """M0: lnL -20486.034301, kappa 20.74839, omega 0.04414
    (examples/mtCDNAape/README.txt)."""
    res = _ape(codeml.CodemlSpec(icode=1, cleandata=False, kappa=5.0))
    assert res.lnL == pytest.approx(-20486.034301, abs=2e-4)
    assert float(res.kappa[0]) == pytest.approx(20.74839, abs=2e-3)
    assert float(res.class_omegas[0, 0]) == pytest.approx(0.04414,
                                                          abs=2e-4)


def test_branch_model_ape_omegas():
    """model=2 with the #1-labeled between-species branches:
    lnL -20444.099676 with ratios 0.28638 (within-species) and 0.03693
    (between-species) per the README table; assert both."""
    res = _ape(codeml.CodemlSpec(icode=1, cleandata=False, model=2,
                                 kappa=5.0, omega=0.2))
    assert res.lnL == pytest.approx(-20444.099676, abs=2e-3)
    ws = sorted(float(w) for w in np.asarray(res.class_omegas).ravel())
    assert ws[0] == pytest.approx(0.03693, abs=5e-4)
    assert ws[1] == pytest.approx(0.28638, abs=5e-3)


def test_hkyrev_abglobin():
    """GTR-nucleotide codon model (hkyREV=1; reference eigenQcodon GTR arm
    src/codeml.c:3284): lnL and all five exchangeabilities digit-exact vs
    a fresh reference run."""
    EX = conftest.ref_path("examples")
    aln = seqio.read_alignment(f"{EX}/abglobin.nuc", 1)
    data = seqio.pack(aln, cleandata=True)
    trees = treeio.read_trees(f"{EX}/abglobin.trees", data.names)
    topo = from_treenode(trees[0], data.names)
    res = codeml.fit_packed(data, topo,
                            codeml.CodemlSpec(cleandata=True, hkyREV=True))
    assert res.np == 13
    assert res.lnL == pytest.approx(-3028.995441, abs=2e-4)
    np.testing.assert_allclose(
        res.kappa, [0.50914, 0.42596, 0.29129, 0.72665, 0.24499],
        atol=2e-4)
    assert float(res.class_omegas[0, 0]) == pytest.approx(0.12177,
                                                          abs=2e-4)


def test_ondevice_bounded_lbfgs_matches_scipy_path():
    """Whole-fit-on-device bounded optax L-BFGS (core/optim.py
    maximize_jax_bounded) reaches the abglobin M0 golden optimum
    (-3048.771401) without any host round-trips."""
    import jax.numpy as jnp

    from paml_tpu.apps import codeml
    from paml_tpu.core.optim import maximize_jax_bounded
    from paml_tpu.core.topology import from_treenode
    from paml_tpu.io import seqio, treeio

    aln = seqio.read_alignment(
        conftest.ref_path("examples", "abglobin.nuc"), 1)
    data = seqio.pack(aln, cleandata=True, icode=0)
    topo = from_treenode(
        treeio.read_trees(conftest.ref_path("examples", "abglobin.trees"),
                          data.names)[0], data.names)
    spec = codeml.CodemlSpec(cleandata=True)
    neg, _u, _c, x0, bounds, _pi = codeml.make_codon_objective(
        data, topo, spec)
    x, lnl, it = maximize_jax_bounded(neg, x0, bounds, dtype=jnp.float64)
    assert lnl == pytest.approx(-3048.771401, abs=2e-4)
    assert it < 200
