"""Multi-gene codon models (Mgene 0/2/3/4).

Goldens from fresh reference codeml runs on a 2-gene split of
examples/abglobin.nuc (option G, 150 + 135 codons; F3x4, M0, cleandata=1).
Reference: SetPGene src/codeml.c:2421, MultipleGenes src/treesub.c:5170.
"""
import os

import pytest

import conftest  # noqa: F401
from paml_tpu.apps import codeml
from paml_tpu.core.topology import from_treenode
from paml_tpu.io import seqio, treeio

GOLDEN = {0: (-3048.338788, 10), 2: (-3035.195257, 10),
          3: (-3046.071393, 12), 4: (-3031.379489, 12)}


def _write_2gene(tmp_path):
    src = open(conftest.ref_path("examples", "abglobin.nuc")).read()
    lines = src.strip().split("\n")
    ns, ls = lines[0].split()[:2]
    out = [f"{ns}  {ls}  GI", "G 2  150 135"] + lines[1:]
    p = os.path.join(tmp_path, "abglobin.G.nuc")
    with open(p, "w") as f:
        f.write("\n".join(out) + "\n")
    return p


@pytest.mark.parametrize("mgene", sorted(GOLDEN))
def test_mgene_codon_golden(mgene, tmp_path):
    seqfile = _write_2gene(tmp_path)
    aln = seqio.read_alignment(seqfile, 1)
    data = seqio.pack(aln, cleandata=True, icode=0)
    assert data.ngene == 2
    trees = treeio.read_trees(
        conftest.ref_path("examples", "abglobin.trees"), data.names)
    topo = from_treenode(trees[0], data.names)
    spec = codeml.CodemlSpec(cleandata=True)
    res = codeml.fit_codon_mgene(data, topo, spec, mgene)
    want, np_want = GOLDEN[mgene]
    assert res.np == np_want
    assert res.lnL == pytest.approx(want, abs=2e-4)
    assert res.lnL <= want + 1e-2


@pytest.mark.parametrize("ctl", ["codeml-ndata.ctl",
                                 "codeml-ndata-maintree-ml.ctl"])
def test_ndata_modes_cli(ctl, tmp_path, monkeypatch):
    """ndata separate_trees / maintree modes (examples/ndata/README.txt):
    per-dataset lnLs match a fresh reference run exactly."""
    import re

    from paml_tpu.__main__ import run_codeml

    monkeypatch.chdir(tmp_path)
    run_codeml(conftest.ref_path("examples", "ndata", ctl))
    text = open(tmp_path / "mlc").read()
    lnls = [float(v) for v in re.findall(r"lnL.*?(-\d+\.\d+)", text)]
    golden = [-2489.832647, -2068.795718, -1749.849536]
    assert len(lnls) == 3
    for got, want in zip(lnls, golden):
        assert got == pytest.approx(want, abs=2e-4)
