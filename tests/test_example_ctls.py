"""End-to-end smoke matrix: run reference example ctl files through the
CLI and compare against fresh reference-binary results.

HIVNSsites (Yang et al. 2000 table 12, 10th dataset): the 'NSsites = 0 1
2' batch must reproduce M0 -1137.688190, M1a -1114.641736, M2a
-1106.445004 (fresh reference run).
"""
import re

import pytest

import conftest  # noqa: F401


@pytest.mark.slow
def test_hivnssites_ctl_batch(tmp_path, monkeypatch):
    from paml_tpu.__main__ import run_codeml

    monkeypatch.chdir(tmp_path)
    run_codeml(conftest.ref_path("examples", "HIVNSsites", "codeml.ctl"))
    text = open(tmp_path / "mlc").read()
    lnls = [float(v) for v in re.findall(r"lnL.*?(-\d+\.\d+)", text)]
    golden = [-1137.688190, -1114.641736, -1106.445004]
    assert len(lnls) == 3
    for got, want in zip(lnls, golden):
        assert got == pytest.approx(want, abs=2e-3)
        assert got <= want + 1e-2
    # side outputs exist
    assert (tmp_path / "lnf").exists()
    assert (tmp_path / "rst").exists()
    assert (tmp_path / "rub").exists()


@pytest.mark.slow
def test_lysozyme_branchsite_beb_ctl(tmp_path, monkeypatch):
    """Branch-site model A through the ctl front end, incl. the BEB
    4-class table in rst (reference run: lnL -894.284097; site-1 BEB
    posteriors 0.21596 0.09912 0.45863 0.22629)."""
    from paml_tpu.__main__ import run_codeml
    from paml_tpu.io import treeio

    lines = open(conftest.ref_path(
        "examples", "lysozyme", "lysozymeSmall.trees")).read()
    trees = [t[t.index("("):] + ";" for t in lines.split(";") if "(" in t]
    (tmp_path / "tree1.trees").write_text(" 7 1\n" + trees[1] + "\n")
    seq = conftest.ref_path("examples", "lysozyme", "lysozymeSmall.txt")
    (tmp_path / "codeml.ctl").write_text(f"""
seqfile = {seq}
treefile = tree1.trees
outfile = mlc
seqtype = 1
CodonFreq = 2
model = 2
NSsites = 2
icode = 0
fix_kappa = 0
kappa = 2
fix_omega = 0
omega = 1.5
cleandata = 1
""")
    monkeypatch.chdir(tmp_path)
    run_codeml(str(tmp_path / "codeml.ctl"))
    mlc = (tmp_path / "mlc").read_text()
    lnl = float(re.search(r"lnL.*?(-\d+\.\d+)", mlc).group(1))
    assert lnl == pytest.approx(-894.284097, abs=2e-3)
    rst = (tmp_path / "rst").read_text()
    assert "Bayes Empirical Bayes (BEB) probabilities for 4 classes" in rst
    m = re.search(r"^\s*1\s+([\d.]+)\s+([\d.]+)\s+([\d.]+)\s+([\d.]+)",
                  rst.split("4 classes")[1], re.M)
    got = [float(m.group(i)) for i in range(1, 5)]
    ref = [0.21596, 0.09912, 0.45863, 0.22629]
    assert got == pytest.approx(ref, abs=2e-3)


@pytest.mark.slow
def test_mtcdna_aa_ctl(tmp_path, monkeypatch):
    """mtCDNA amino-acid run (seqtype=2, Empirical_F jones) through the
    ctl front end: checked-in golden lnL -14717.981418
    (examples/mtCDNA/AAcodon.result.txt:60)."""
    from paml_tpu.__main__ import run_codeml

    seq = conftest.ref_path("examples", "mtCDNA", "mtCDNApri.aa")
    tree = conftest.ref_path("examples", "mtCDNA", "mtCDNApri.trees")
    dat = conftest.ref_path("dat", "jones.dat")
    (tmp_path / "codeml.ctl").write_text(f"""
seqfile = {seq}
treefile = {tree}
outfile = mlc
seqtype = 2
model = 3
aaRatefile = {dat}
fix_alpha = 1
alpha = 0
cleandata = 1
""")
    monkeypatch.chdir(tmp_path)
    run_codeml(str(tmp_path / "codeml.ctl"))
    mlc = (tmp_path / "mlc").read_text()
    lnl = float(re.search(r"lnL.*?(-\d+\.\d+)", mlc).group(1))
    assert lnl == pytest.approx(-14717.981418, abs=2e-3)


@pytest.mark.slow
def test_brown_baseml_ctl(tmp_path, monkeypatch):
    """Plain baseml ctl (HKY+G5 on brown.nuc): golden lnL -2621.55434
    (tests/golden_baseml.json hky_g5_brown)."""
    from paml_tpu.__main__ import run_baseml

    (tmp_path / "baseml.ctl").write_text(f"""
seqfile = {conftest.ref_path('examples', 'brown.nuc')}
treefile = {conftest.ref_path('examples', 'brown.trees')}
outfile = mlb
model = 4
fix_kappa = 0
kappa = 5
fix_alpha = 0
alpha = 0.5
ncatG = 5
cleandata = 1
""")
    monkeypatch.chdir(tmp_path)
    run_baseml(str(tmp_path / "baseml.ctl"))
    mlb = (tmp_path / "mlb").read_text()
    lnl = float(re.search(r"lnL.*?(-\d+\.\d+)", mlb).group(1))
    assert lnl == pytest.approx(-2621.55434, abs=2e-3)


def test_yn00_ctl_2yn_files(tmp_path, monkeypatch):
    """yn00 ctl end-to-end, checking 2YN.dS contents: abglobin pair 2-1
    YN00 dS = 0.5031 (examples/YN00abglobin.result.txt:24)."""
    from paml_tpu.__main__ import run_yn00

    (tmp_path / "yn00.ctl").write_text(f"""
seqfile = {conftest.ref_path('examples', 'abglobin.nuc')}
outfile = yn
icode = 0
weighting = 0
commonf3x4 = 0
""")
    monkeypatch.chdir(tmp_path)
    run_yn00(str(tmp_path / "yn00.ctl"))
    ds = (tmp_path / "2YN.dS").read_text()
    row2 = ds.strip().splitlines()[2].split()
    assert float(row2[1]) == pytest.approx(0.5031, abs=2e-3)
    assert (tmp_path / "2YN.dN").exists() and (tmp_path / "2YN.t").exists()


@pytest.mark.slow
def test_mcmctree_ctl_short_chain(tmp_path, monkeypatch):
    """DatingSoftBound mcmctree ctl (usedata=2 approximate likelihood)
    through the CLI with a short chain: chain runs, mcmc.txt + FigTree
    outputs exist, posterior root age within loose bounds of the
    reference posterior (~0.75-2.0 x100Myr)."""
    from paml_tpu.__main__ import main as cli_main

    src = conftest.ref_path("examples", "DatingSoftBound")
    text = open(f"{src}/mcmctree.ctl").read()
    text = text.replace("= mtCDNApri123.txt", f"= {src}/mtCDNApri123.txt")
    text = text.replace("= mtCDNApri.trees", f"= {src}/mtCDNApri.trees")
    text = re.sub(r"usedata\s*=\s*\d+.*", "usedata = 2", text)
    text = re.sub(r"burnin\s*=\s*\d+", "burnin = 400", text)
    text = re.sub(r"sampfreq\s*=\s*\d+", "sampfreq = 2", text)
    text = re.sub(r"nsample\s*=\s*\d+", "nsample = 1000", text)
    (tmp_path / "mcmctree.ctl").write_text(text)
    monkeypatch.chdir(tmp_path)
    cli_main(["mcmctree", str(tmp_path / "mcmctree.ctl")])
    assert (tmp_path / "mcmc.txt").exists()
    samples = (tmp_path / "mcmc.txt").read_text().strip().splitlines()
    assert len(samples) >= 500
    header = samples[0].split("\t")
    tcols = [i for i, h in enumerate(header) if h.startswith("t_")]
    means = []
    for icol in tcols:
        ages = [float(s.split("\t")[icol]) for s in samples[1:]]
        means.append(sum(ages) / len(ages))
    # root age (the oldest node) should be near the reference posterior
    # (~0.15 at the example's 100 Myr time unit; RootAge bound < 1.0)
    root_mean = max(means)
    assert 0.05 < root_mean < 1.0


@pytest.mark.slow
def test_clade_model_c_ctl(tmp_path, monkeypatch):
    """CladeModelCD clade model C ctl (model=3 NSsites=2, 2 clades):
    fresh reference run gives lnL -1702.903642 (np 33)."""
    from paml_tpu.__main__ import run_codeml

    src = conftest.ref_path("examples", "CladeModelCD")
    text = open(f"{src}/codeml.CladeC.ctl").read()
    text = text.replace("= ECP_EDN_15.nuc", f"= {src}/ECP_EDN_15.nuc")
    text = text.replace("= tree.txt", f"= {src}/tree.txt")
    (tmp_path / "codeml.ctl").write_text(text)
    monkeypatch.chdir(tmp_path)
    run_codeml(str(tmp_path / "codeml.ctl"))
    mlc = (tmp_path / "mlc").read_text()
    lnl = float(re.search(r"lnL.*?(-\d+\.\d+)", mlc).group(1))
    assert lnl == pytest.approx(-1702.903642, abs=2e-3)
