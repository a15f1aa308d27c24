"""Goldens for the large-ns NSsites datasets (VERDICT r4 missing #5):

- MHC.Swanson2002MBE (192 taxa, 270 codons, fix_blength=2): fresh
  reference runs give M0 -8225.154790 (k 1.75829, w 0.61214),
  M1a -7490.993363, M2a -7231.154540.
- lysin (25 taxa, 135 codons, Yang/Swanson/Vacquier 2000): fresh
  reference battery in tests/golden_lysin.json (written by
  tools/collect_lysin_goldens.py when the reference runs finish).
"""
import json
import os

import numpy as np
import pytest

import conftest

MHC = conftest.ref_path("examples", "MHC.Swanson2002MBE")


@pytest.fixture(scope="module")
def mhc_packed():
    from paml_tpu.core.topology import from_treenode
    from paml_tpu.io import seqio, treeio
    aln = seqio.read_alignment(f"{MHC}/bigmhc.phy", seqio.CODON_SEQ)
    data = seqio.pack(aln, cleandata=False, icode=0)   # reference ctl default
    trees = treeio.read_trees(f"{MHC}/bigmhc.trees", data.names)
    topo = from_treenode(trees[0], data.names)
    return data, topo


@pytest.mark.slow
@pytest.mark.parametrize("ns_model,golden", [
    (0, -8225.154790), (1, -7490.993363), (2, -7231.154540)])
def test_mhc_nssites_fixed_blens(mhc_packed, ns_model, golden):
    """192-taxon NSsites with branch lengths fixed from the tree file
    (fix_blength = 2, the reference's own ctl)."""
    from paml_tpu.apps import codeml
    data, topo = mhc_packed
    spec = codeml.CodemlSpec(seqtype=1, model=0, NSsites=ns_model,
                             codonf="F3x4", cleandata=False,
                             fix_blength=2, kappa=1.6, omega=0.9,
                             ncatG=10)
    res = codeml.fit_packed(data, topo, spec)
    assert res.lnL == pytest.approx(golden, abs=5e-3)
    if ns_model == 0:
        assert float(res.kappa[0]) == pytest.approx(1.75829, abs=5e-3)
        assert float(res.class_omegas.reshape(-1)[0]) == pytest.approx(
            0.61214, abs=5e-3)


LYSIN_GOLDEN = os.path.join(os.path.dirname(__file__),
                            "golden_lysin.json")


def _lysin_cases():
    if not os.path.exists(LYSIN_GOLDEN):
        return []
    with open(LYSIN_GOLDEN) as f:
        return sorted(json.load(f).items())


@pytest.fixture(scope="module")
def lysin_packed():
    from paml_tpu.core.topology import from_treenode
    from paml_tpu.io import seqio, treeio
    LY = conftest.ref_path("examples", "lysin")
    aln = seqio.read_alignment(f"{LY}/lysin.nuc", seqio.CODON_SEQ)
    data = seqio.pack(aln, cleandata=False, icode=0)   # reference ctl: 0
    trees = treeio.read_trees(f"{LY}/lysin.trees", data.names)
    topo = from_treenode(trees[0], data.names)
    return data, topo


@pytest.mark.slow
@pytest.mark.parametrize("name,row", _lysin_cases(),
                         ids=[k for k, _ in _lysin_cases()])
def test_lysin_nssites_battery(lysin_packed, name, row):
    """25-taxon lysin NSsites battery vs a fresh reference run (covers
    the previously-untested M5/M6/M9-M13 families).  The exotic mixture
    surfaces (M9-M13) are multimodal; the requirement is reference-level
    or better lnL, within tolerance when equal."""
    from paml_tpu.apps import codeml
    data, topo = lysin_packed
    spec = codeml.CodemlSpec(seqtype=1, model=0, NSsites=row["NSsites"],
                             codonf="F3x4", cleandata=False,
                             kappa=1.6, omega=0.8, ncatG=row["ncatG"])
    res = codeml.fit_packed(data, topo, spec)
    # at or above the reference optimum, never appreciably below
    assert res.lnL >= row["lnL"] - 5e-3, \
        f"{name}: ours {res.lnL} vs reference {row['lnL']}"
    assert res.lnL <= row["lnL"] + 6.0   # same surface sanity bound
