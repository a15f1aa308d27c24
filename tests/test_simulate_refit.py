"""Simulate -> refit statistical QC (the reference's main check for the
positive-selection machinery, Technical/Simulation/Codon/ +
PositiveSites.c).

Simulates branch-site model A truth with the evolver core, refits with
codeml (model=2, NSsites=2), and checks parameter recovery plus BEB
identification of the truly positive sites.
"""
import os

import numpy as np
import pytest

import conftest  # noqa: F401
from paml_tpu.apps import beb as bebmod
from paml_tpu.apps import codeml
from paml_tpu.apps.evolver import simulate_codon
from paml_tpu.core.topology import from_treenode
from paml_tpu.io import seqio, treeio

TREE = ("(((a:0.2, b:0.2):0.1, (c:0.2, d:0.2):0.1):0.15,"
        " ((e:0.2, f:0.2):0.1, (g:0.2, h:0.2):0.1):0.15);")
LBL = ("(((a #{w0}, b #{w0}) #{w0}, (c #{w0}, d #{w0}) #{w0}) #{fg},"
       " ((e #{w0}, f #{w0}) #{w0}, (g #{w0}, h #{w0}) #{w0}) #{w0});")
W0, W2 = 0.1, 6.0
FREQS = (0.45, 0.35, 0.1125, 0.0875)       # p0, p1, p2a, p2b (A model)


def _write_dat(path):
    # branch-site A: classes (w0,w0), (1,1), (w0->w2 fg), (1->w2 fg)
    cls = [dict(w0=W0, fg=W0), dict(w0=1.0, fg=1.0),
           dict(w0=W0, fg=W2), dict(w0=1.0, fg=W2)]
    f64 = np.zeros(64)
    from paml_tpu.constants import sense_codons
    sense = sense_codons(0)
    f64[sense] = 1.0 / len(sense)
    with open(path, "w") as f:
        f.write("0\n4321\n8 600 1\n-1\n\n")
        f.write(TREE + "\n\n")
        f.write("4\n" + " ".join(f"{p}" for p in FREQS) + "\n\n")
        for c in cls:
            f.write(LBL.format(**c) + "\n")
        f.write("\n2.0\n\n")
        for i in range(0, 64, 4):
            f.write(" ".join(f"{v:.8f}" for v in f64[i:i + 4]) + "\n")
        f.write("\n0\n")


@pytest.mark.slow
def test_branchsite_simulate_refit(tmp_path):
    dat = os.path.join(tmp_path, "mc.dat")
    _write_dat(dat)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        out, nrep = simulate_codon(dat, out="mc.paml", seed=11)
        classes = np.array([int(t) - 1 for t in
                            open("siterates.txt").read().split()[-600:]])
    finally:
        os.chdir(cwd)
    assert nrep == 1
    aln = seqio.read_alignment(os.path.join(tmp_path, "mc.paml"), 1)
    data = seqio.pack(aln, cleandata=True, icode=0)
    # foreground = the first basal clade (abcd): label its stem #1
    nwk = ("(((a:0.2, b:0.2):0.1, (c:0.2, d:0.2):0.1) #1 :0.15,"
           " ((e:0.2, f:0.2):0.1, (g:0.2, h:0.2):0.1):0.15);")
    topo = from_treenode(treeio.parse_newick(nwk), data.names)
    spec = codeml.CodemlSpec(model=2, NSsites=2, codonf="Fequal",
                             cleandata=True, omega=1.5)
    res = codeml.fit_packed(data, topo, spec)
    W = res.params["W"]
    freqs = res.params["freqs"]
    w2_hat = float(W[1, 2])
    p01_hat = float(freqs[0] + freqs[1])
    assert w2_hat > 1.5, f"foreground omega2 not recovered: {w2_hat}"
    assert abs(p01_hat - 0.8) < 0.15, f"p0+p1 off: {p01_hat}"
    # BEB: positive sites should be enriched in the true 2a/2b classes
    sp = bebmod.beb(data, topo, spec, res)
    sites = bebmod.positive_sites(data, sp, 0.5)
    if sites:
        hits = np.array([s - 1 for s, p, w in sites])
        frac_true = (classes[hits] >= 2).mean()
        base_rate = (classes >= 2).mean()
        assert frac_true > 2 * base_rate, \
            f"BEB enrichment too weak: {frac_true} vs base {base_rate}"
