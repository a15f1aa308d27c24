"""Codon-based amino-acid models FromCodon0 (model 5) and FromCodon
(model 6), plus the checked-in AAcodon results.

Goldens from fresh reference runs (mtCDNApri.aa, icode=1, kappa0=3,
omega=1.5, cleandata=0) and the repo's own expected output
(examples/mtCDNA/AAcodon.result.txt:60-97).  Reference implementation:
eigenQaa FromCodon arm src/codeml.c:3419, Qcodon2aa :3487, the
AA-as-codon-set recoding for FromCodon0 :498-556.
"""
import pytest

import conftest  # noqa: F401
from paml_tpu.apps import codeml
from paml_tpu.core.topology import from_treenode
from paml_tpu.io import seqio, treeio

SEQ = conftest.ref_path("examples", "mtCDNA", "mtCDNApri.aa")
TREE = conftest.ref_path("examples", "mtCDNA", "mtCDNApri.trees")


def _fit(model):
    aln = seqio.read_alignment(SEQ, 2)
    data = seqio.pack(aln, cleandata=False)
    trees = treeio.read_trees(TREE, data.names)
    topo = from_treenode(trees[0], data.names)
    spec = codeml.CodemlSpec(seqtype=2, aa_model=model, icode=1,
                             kappa=3.0, omega=1.5, cleandata=False)
    return codeml.fit_packed(data, topo, spec)


@pytest.mark.parametrize("model,golden,np_want", [
    ("FromCodon0", -14707.663779, 13),
    ("FromCodon", -14718.224885, 12),
])
def test_fromcodon_golden(model, golden, np_want):
    res = _fit(model)
    assert res.np == np_want
    assert res.lnL == pytest.approx(golden, abs=2e-4)
    assert res.lnL <= golden + 1e-2


def test_fromcodon_mles():
    """kappa parity: reference model 6 kappa = 9.15682
    (examples/mtCDNA/AAcodon.result.txt:78)."""
    res = _fit("FromCodon")
    assert float(res.kappa[0]) == pytest.approx(9.15682, abs=2e-3)
    res0 = _fit("FromCodon0")
    # model 5: kappa 9.246897, omega 0.031208 (fresh reference run)
    assert float(res0.kappa[0]) == pytest.approx(9.246897, abs=2e-3)
    assert res0.params["omega"] == pytest.approx(0.031208, abs=2e-4)


@pytest.mark.parametrize("model,golden,np_want", [
    ("REVaa_0", -14461.504274, 80),
    pytest.param("REVaa", -14367.014272, 200, marks=pytest.mark.slow),
])
def test_revaa_golden(model, golden, np_want):
    """REVaa/REVaa_0 free-exchangeability AA models (reference:
    eigenQaa src/codeml.c:3424-3436; fresh reference runs on
    mtCDNApri.aa, icode=1, jones initials)."""
    res = _fit(model)
    assert res.np == np_want
    assert res.lnL == pytest.approx(golden, abs=5e-3)
    assert res.lnL <= golden + 5e-2
