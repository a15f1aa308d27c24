"""Simulate -> refit statistical tests (the reference's own QC workflow,
SURVEY.md section 4 item 5)."""
import numpy as np
import pytest

from paml_tpu.apps import baseml, codeml, evolver
from paml_tpu.io import seqio

from conftest import ref_path

TREE = "((a: 0.1, b: 0.2): 0.12, c: 0.3, d: 0.4);"


def test_nuc_simulate_refit(tmp_path):
    dat = tmp_path / "mc.dat"
    dat.write_text(f"""0
123
4 20000 1
-1
{TREE}
4
5.0
0 0
0.2 0.3 0.35 0.15
""")
    out = str(tmp_path / "mc.paml")
    evolver.simulate_nuc(str(dat), out, seed=7)
    aln = seqio.read_alignment(out, seqio.BASE_SEQ)
    assert aln.ns == 4 and aln.ls == 20000
    tf = tmp_path / "t.trees"
    tf.write_text(TREE + "\n")
    res = baseml.fit(out, str(tf), baseml.BasemlSpec(model="HKY85"))
    kappa = res.rate_params[0]
    assert abs(kappa - 5.0) < 0.5, f"kappa {kappa} far from truth 5"
    total = res.blens.sum()
    assert abs(total - 1.12) < 0.08, f"tree length {total} vs 1.12"


def test_codon_simulate_refit(tmp_path):
    # equal codon frequencies, M0 with known kappa/omega
    dat = tmp_path / "mc.dat"
    freqs = " ".join(["0.015625"] * 64)
    freq_lines = "\n".join(" ".join(["0.015625"] * 4) for _ in range(16))
    dat.write_text(f"""0
13147
4 3000 1
-1
{TREE}
0.3
4.0
{freq_lines}
0
""")
    out = str(tmp_path / "mc.paml")
    evolver.simulate_codon(str(dat), out, seed=11)
    aln = seqio.read_alignment(out, seqio.CODON_SEQ)
    assert aln.ns == 4 and aln.ls == 9000
    tf = tmp_path / "t.trees"
    tf.write_text(TREE + "\n")
    res = codeml.fit(out, str(tf),
                     codeml.CodemlSpec(codonf="Fequal", cleandata=True))
    kappa = float(res.kappa[0])
    omega = float(res.params["W"][0, 0])
    assert abs(kappa - 4.0) < 0.6, f"kappa {kappa} vs truth 4"
    assert abs(omega - 0.3) < 0.06, f"omega {omega} vs truth 0.3"


def test_aa_simulate_refit(tmp_path):
    dat = tmp_path / "mc.dat"
    pi_line = " ".join(["0.05"] * 20)
    dat.write_text(f"""0
13147
4 5000 1
-1
{TREE}
0 0
0
{pi_line}
""")
    out = str(tmp_path / "mc.paml")
    evolver.simulate_aa(str(dat), out, seed=3)
    aln = seqio.read_alignment(out, seqio.AA_SEQ)
    assert aln.ns == 4 and aln.ls == 5000
    tf = tmp_path / "t.trees"
    tf.write_text(TREE + "\n")
    res = codeml.fit(out, str(tf),
                     codeml.CodemlSpec(seqtype=2, aa_model="Poisson"))
    total = res.blens.sum()
    assert abs(total - 1.12) < 0.08, f"tree length {total} vs 1.12"
