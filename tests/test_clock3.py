"""clock = 3 combined analysis (Yang & Yoder 2003) and messy-data pi.

Golden values from the reference baseml 4.10.10 run on
examples/MouseLemurs (F84+G5, 3 codon-position genes, 7 '@' fossil point
calibrations): clock=3 lnL -25976.769529 (np 38), no-clock messy
single-gene lnL -26431.639161.  The messy-data case exercises the
EM resolution of ambiguity characters in the observed base frequencies
(reference: InitializeBaseAA/AddFreqSeqGene, src/treesub.c:1548/:1712).
"""
import os
import re

import numpy as np
import pytest

from paml_tpu.apps import baseml
from paml_tpu.core.topology import deroot, from_treenode
from paml_tpu.io import seqio, treeio

EX = "/root/reference/examples/MouseLemurs"


@pytest.fixture(scope="module")
def mouselemurs():
    aln = seqio.read_alignment(os.path.join(EX, "MouseLemurs.nuc"),
                               seqio.BASE_SEQ)
    data = seqio.pack(aln)
    trees = treeio.read_trees(os.path.join(EX, "MouseLemurs.trees"),
                              data.names)
    return data, trees[0]


def test_em_base_freqs(mouselemurs):
    data, _ = mouselemurs
    np.testing.assert_allclose(
        data.base_freqs, [0.27855, 0.28572, 0.30364, 0.13210], atol=5e-6)


def test_fossil_ages_parsed(mouselemurs):
    data, tree = mouselemurs
    topo = from_treenode(tree, data.names)
    fossil = {n: topo.ages0[n] for n in range(topo.ns, topo.nnode)
              if topo.ages0[n] == topo.ages0[n]}
    assert len(fossil) == 7
    assert abs(sorted(fossil.values())[-1] - 0.77) < 1e-12


@pytest.mark.slow
def test_clock3_combined_golden(mouselemurs):
    data, tree = mouselemurs
    topo = from_treenode(tree, data.names)
    spec = baseml.BasemlSpec(model="F84", ncatG=5, fix_alpha=False,
                             alpha=0.5, fix_kappa=False, kappa=2.3,
                             clock=3, Mgene=0)
    res = baseml.fit_packed(data, topo, spec)
    assert res.np == 38
    assert res.lnL == pytest.approx(-25976.769529, abs=2e-4)
    # kappa/alpha from the reference output
    assert res.rate_params[0] == pytest.approx(4.42707, abs=2e-3)


@pytest.mark.slow
def test_messy_noclock_golden():
    txt = open(os.path.join(EX, "MouseLemurs.nuc")).read()
    txt = re.sub(r"^(\s*35\s+1812)\s+GC", r"\1", txt)
    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".nuc", delete=False) as f:
        f.write(txt)
        path = f.name
    aln = seqio.read_alignment(path, seqio.BASE_SEQ)
    data = seqio.pack(aln)
    topo = deroot(from_treenode(
        treeio.read_trees(os.path.join(EX, "MouseLemurs.trees"),
                          data.names)[0], data.names))
    res = baseml.fit_packed(data, topo, baseml.BasemlSpec(
        model="F84", ncatG=5, fix_alpha=False, alpha=0.5,
        fix_kappa=False, kappa=2.3))
    assert res.lnL == pytest.approx(-26431.639161, abs=2e-4)
    os.unlink(path)
