"""TipDate (serially-sampled sequences) dating tests on the reference's
TipDate.HIV2 example (Stadler & Yang 2012).

Oracle: a fresh reference mcmctree run (seed 777, burnin 4000,
20000x2 samples, usedata=2 with the checked-in in.BV.HKYG5, clock=1,
BDparas 2 1 0 1.8) gave posterior means root t_n34 = 0.8862 and
mu = 0.2257 (reference 1-based node 34 == our 0-based node 33).
"""
import numpy as np
import pytest

from paml_tpu.apps import mcmctree as M
from paml_tpu.io import seqio, treeio

from conftest import ref_path

HIV2 = ref_path("examples", "TipDate.HIV2")


@pytest.fixture(scope="module")
def hiv2():
    aln = seqio.read_alignments(HIV2 + "/HIV2ge.txt", seqio.BASE_SEQ, 1)[0]
    names = aln.names
    text = open(HIV2 + "/HIV2ge.tre").read()
    first = text[text.index("("):text.index(";") + 1]
    tree = treeio.parse_newick(first)
    return aln, names, tree


def test_parse_tip_dates(hiv2):
    _, names, _ = hiv2
    ages, tu, young = M.parse_tip_dates(names, 100.0)
    # README: "Date range: (1995.00, 1982.00) => (0, 0.13)"
    assert young == 1995.0 and tu == 100.0
    assert ages.min() == 0.0
    np.testing.assert_allclose(ages.max(), 0.13)
    # automatic time unit: (young-old)*2.5
    ages2, tu2, _ = M.parse_tip_dates(names, None)
    np.testing.assert_allclose(tu2, 13 * 2.5)
    np.testing.assert_allclose(ages2.max(), 0.4)


def test_read_BV_reference_file(hiv2):
    loci = M.read_BV(HIV2 + "/in.BV.HKYG5", 1, transform="sqrt")
    (l,) = loci
    assert len(l.bl) == 2 * 33 - 3
    # sqrt transform applied: values are sqrt(MLE)
    assert (l.bl >= 0).all() and l.bl.max() < 1.5
    # Hessian symmetric after permutation
    np.testing.assert_allclose(l.hessian, l.hessian.T, atol=1e-6)


def test_tipdate_prior_finite_and_root_bound(hiv2):
    aln, names, tree = hiv2
    st = M.build_species_tree(tree, names, bds=(2, 1, 0),
                              root_age="B(0.5, 2.0, 0.01, 0.01)")
    ages, tu, _ = M.parse_tip_dates(names, 100.0)
    st.tip_ages = ages
    st.psi = 1.8
    spec = M.McmcSpec(clock=1, usedata=0, bds=(2, 1, 0), seed=1)
    mc = M.MCMCTree(st, [None], spec)
    lp = M.ln_prior_times(st, mc.ages)
    assert np.isfinite(lp)
    # pushing the root far above the B(0.5,2.0) bound must drop the prior
    ages_hi = mc.ages.copy()
    ages_hi[st.root] = 5.0
    assert M.ln_prior_times(st, ages_hi) < lp


def test_tipdate_ml_baseml_matches_reference(hiv2, tmp_path):
    """ML TipDate (baseml clock=1, HKY85+G5): fresh reference run gives
    lnL -12352.105674, rate 0.232871 per time unit, alpha 0.32045."""
    from paml_tpu.apps import baseml
    aln, names, tree = hiv2
    text = open(HIV2 + "/HIV2ge.tre").read()
    first = text[text.index("("):text.index(";") + 1]
    (tmp_path / "one.tre").write_text(" 33 1\n" + first + "\n")
    spec = baseml.BasemlSpec(model="HKY85", ncatG=5, fix_alpha=False,
                             alpha=0.5, clock=1, tipdate=True,
                             tipdate_timeunit=100.0)
    res = baseml.fit(HIV2 + "/HIV2ge.txt", str(tmp_path / "one.tre"), spec)
    assert abs(res.lnL - (-12352.105674)) < 5e-3
    mu = res.x[32]                # 1 root age + 31 proportions, then rate
    assert abs(mu - 0.232871) < 5e-4
    assert abs(res.alpha[0] - 0.32045) < 5e-3


def test_tipdate_posterior_matches_reference(hiv2):
    aln, names, tree = hiv2
    st = M.build_species_tree(tree, names, bds=(2, 1, 0),
                              root_age="B(0.5, 2.0, 0.01, 0.01)")
    ages, tu, _ = M.parse_tip_dates(names, 100.0)
    st.tip_ages = ages
    st.psi = 1.8
    loci = M.read_BV(HIV2 + "/in.BV.HKYG5", 1, transform="sqrt")
    spec = M.McmcSpec(clock=1, usedata=2, bds=(2, 1, 0),
                      rgene_gamma=(2, 10, 2), burnin=1500, sampfreq=2,
                      nsample=2500, seed=99, transform="sqrt")
    mc = M.MCMCTree(st, loci, spec)
    samples = mc.run()
    summ = M.summarize(samples)
    assert abs(summ["t_n33"]["mean"] - 0.8862) < 0.08   # low-ESS dimension
    assert abs(summ["mu1"]["mean"] - 0.2257) < 0.02
