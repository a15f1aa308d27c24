"""codeml TipDate (dated tips under a codon clock) — previously baseml
only (the ctl rejected TipDate in codeml).

Golden: fresh reference codeml run on lysozymeSmall codons with taxa
renamed sp{i}_{year} (1980..2004 step 4), rooted ladder tree, clock = 1,
TipDate = 1 100: lnL -965.613616, np = 9 (7 times incl. mutation rate +
kappa + omega).
"""
import numpy as np
import pytest

import conftest


@pytest.mark.slow
def test_codeml_tipdate_golden(tmp_path):
    from paml_tpu.apps import codeml
    from paml_tpu.core.topology import from_treenode
    from paml_tpu.io import seqio, treeio

    LY = conftest.ref_path("examples", "lysozyme")
    aln = seqio.read_alignment(f"{LY}/lysozymeSmall.txt",
                               seqio.CODON_SEQ)
    years = [1980, 1984, 1988, 1992, 1996, 2000, 2004]
    names = [f"sp{i}_{y}" for i, y in enumerate(years)]
    sub = seqio.Alignment(names, aln.rows, aln.seqtype)
    data = seqio.pack(sub, cleandata=True, icode=0)
    nwk = names[0]
    for nm in names[1:]:
        nwk = f"({nwk},{nm})"
    topo = from_treenode(treeio.parse_newick(nwk + ";"), data.names)
    spec = codeml.CodemlSpec(cleandata=True, clock=1, tipdate=True,
                             tipdate_timeunit=100.0)
    res = codeml.fit_packed(data, topo, spec)
    assert res.np == 9
    assert res.lnL == pytest.approx(-965.613616, abs=2e-4)


def test_ctl_wires_codeml_tipdate(tmp_path):
    from paml_tpu.io import ctl as ctlmod
    p = tmp_path / "c.ctl"
    p.write_text("seqfile = x\ntreefile = y\nclock = 1\n"
                 "TipDate = 1 100\n")
    spec, *_ = ctlmod.codeml_spec(ctlmod.read_ctl(str(p)), str(p))
    assert spec.tipdate and spec.tipdate_timeunit == 100.0
