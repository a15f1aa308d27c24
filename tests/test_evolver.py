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


def test_clade_support_from_sample(tmp_path, monkeypatch):
    """evolver mode 9 (reference: CladeSupport src/treesub.c:4275 via
    evolver option 9): hand-checked support values, incl. MrBayes NEXUS
    translate-table input."""
    from paml_tpu.apps.evolver import clade_support_cli

    (tmp_path / "sample.trees").write_text(
        "((A,B),(C,D),E);\n((A,B),(C,E),D);\n"
        "((A,B),C,(D,E));\n((A,C),(B,D),E);\n")
    (tmp_path / "main.tree").write_text("((A,B),(C,D),E);\n")
    monkeypatch.chdir(tmp_path)
    sup = clade_support_cli(str(tmp_path / "sample.trees"),
                            str(tmp_path / "main.tree"))
    vals = sorted(sup.values())
    assert vals == [0.25, 0.75]
    out = (tmp_path / "evolver.out").read_text()
    assert "75.0" in out and "25.0" in out

    (tmp_path / "mb.t").write_text(
        "#NEXUS\nbegin trees;\n  translate\n    1 A,\n    2 B,\n"
        "    3 C,\n    4 D,\n    5 E;\n"
        "  tree gen.1 = [&U] ((1,2),(3,4),5);\n"
        "  tree gen.2 = [&U] ((1,2),3,(4,5));\nend;\n")
    sup2 = clade_support_cli(str(tmp_path / "mb.t"),
                             str(tmp_path / "main.tree"))
    assert sorted(sup2.values()) == [0.5, 1.0]


def test_label_clades(tmp_path, monkeypatch):
    """evolver mode 11 (reference: LabelClades src/evolver.c:271):
    monophyletic name-substring groups get '#i' labels; paraphyletic
    groups are reported, not labeled."""
    from paml_tpu.apps.evolver import label_clades_cli

    (tmp_path / "t.tree").write_text(
        "((HumanX1,HumanX2),(ChimpY1,ChimpY2),Gorilla);\n")
    monkeypatch.chdir(tmp_path)
    label_clades_cli(str(tmp_path / "t.tree"),
                     ["HumanX", "ChimpY", "Gorilla"])
    out = (tmp_path / "evolver.out").read_text()
    assert "#1" in out and "#2" in out and "#3" in out
    # paraphyletic selection: no label emitted
    (tmp_path / "t2.tree").write_text("((A1,B1),(A2,B2),C);\n")
    label_clades_cli(str(tmp_path / "t2.tree"), ["A"])
    assert "#1" not in (tmp_path / "evolver.out").read_text()
