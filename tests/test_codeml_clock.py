"""Clock dating on codon data (codeml clock = 1/2).

Goldens from fresh reference codeml runs:
  * examples/mtCDNAape (6 taxa, icode=1, F3x4, M0): clock=1
    lnL -20523.690326 (np 6); clock=2 with the #1-labeled between-species
    branches lnL -20502.940675 (np 7, rate class at the 999 bound).
  * examples/MouseLemurs codon data (35 taxa, 7 '@' fossil calibrations,
    absolute rates): clock=1 lnL -25159.985858 (np 30) — codonml.ctl.
Reference: SetBranch src/treesub.c:3770, GetBranchRate :3682.
"""
import pytest

import conftest  # noqa: F401
from paml_tpu.apps import codeml
from paml_tpu.core.topology import from_treenode
from paml_tpu.io import seqio, treeio


def _fit(seqfile, treefile, **kw):
    aln = seqio.read_alignment(seqfile, 1)
    data = seqio.pack(aln, cleandata=False, icode=kw.get("icode", 0))
    trees = treeio.read_trees(treefile, data.names)
    topo = from_treenode(trees[0], data.names)
    spec = codeml.CodemlSpec(cleandata=False, **kw)
    return codeml.fit_packed(data, topo, spec)


@pytest.mark.parametrize("clock,golden,np_want", [
    (1, -20523.690326, 6),
    (2, -20502.940675, 7),
])
def test_ape_codon_clock(clock, golden, np_want):
    EX = conftest.ref_path("examples", "mtCDNAape")
    res = _fit(f"{EX}/mtCDNAape.txt", f"{EX}/mtCDNAape.trees",
               clock=clock, icode=1, kappa=5.0, omega=0.1)
    assert res.np == np_want
    # clock=2's optimum sits at the rate-class 999 bound on a
    # (duration x rate) ridge; allow 1e-2 of line-search slack there
    assert res.lnL == pytest.approx(golden, abs=1e-2 if clock == 2
                                    else 2e-3)
    assert res.lnL <= golden + 1e-2


@pytest.mark.slow
def test_mouselemurs_codon_clock1_fossils():
    """35 taxa, 7 '@' point fossils, absolute mutation rate."""
    EX = conftest.ref_path("examples", "MouseLemurs")
    res = _fit(f"{EX}/MouseLemurs.nuc", f"{EX}/MouseLemurs.trees",
               clock=1, icode=1, kappa=10.0, omega=0.1)
    assert res.np == 30
    assert res.lnL == pytest.approx(-25159.985858, abs=2e-3)
