"""codeml tree-search runmodes through the ctl front end (VERDICT r4
missing #6; reference: Forestry -> StepwiseAddition, src/codeml.c:606,
src/treesub.c:4866 — previously wired for baseml only).
"""
import re

import numpy as np
import pytest

import conftest


@pytest.mark.slow
def test_codeml_runmode3_stepwise_addition(tmp_path, monkeypatch):
    """Stepwise-addition ML tree search under the codon model on a
    5-taxon subset of lysozyme; the found tree's lnL must at least match
    a fit of the user tree restricted to the same taxa."""
    from paml_tpu.__main__ import run_codeml
    from paml_tpu.io import seqio

    LY = conftest.ref_path("examples", "lysozyme")
    aln = seqio.read_alignment(f"{LY}/lysozymeSmall.txt",
                               seqio.CODON_SEQ)
    keep = list(range(5))
    sub = seqio.Alignment([aln.names[i] for i in keep],
                          [aln.rows[i] for i in keep], aln.seqtype)
    with open(tmp_path / "seq.txt", "w") as f:
        f.write(f" {len(keep)} {len(sub.rows[0])}\n")
        for nm, r in zip(sub.names, sub.rows):
            f.write(f"{nm}  {''.join(r)}\n")
    (tmp_path / "codeml.ctl").write_text(f"""
seqfile = seq.txt
outfile = mlc
runmode = 3
seqtype = 1
CodonFreq = 2
model = 0
NSsites = 0
cleandata = 1
""")
    monkeypatch.chdir(tmp_path)
    run_codeml(str(tmp_path / "codeml.ctl"))
    out = (tmp_path / "mlc").read_text()
    assert "tree search runmode 3" in out
    lnl = float(re.search(r"best lnL = (-\d+\.\d+)", out).group(1))
    assert np.isfinite(lnl)
    # sanity: the searched tree is at least as good as a star-ish
    # baseline — compare against a fit of an arbitrary resolved topology
    from paml_tpu.apps import codeml as capp
    from paml_tpu.core.topology import from_treenode
    from paml_tpu.io import treeio
    data = seqio.pack(sub, cleandata=True, icode=0)
    nwk = (f"(({sub.names[0]},{sub.names[1]}),({sub.names[2]},"
           f"{sub.names[3]}),{sub.names[4]});")
    topo = from_treenode(treeio.parse_newick(nwk), data.names)
    base = capp.fit_packed(data, topo,
                           capp.CodemlSpec(cleandata=True))
    assert lnl >= base.lnL - 1e-6
