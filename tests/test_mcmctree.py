"""mcmctree tests: prior math, BV generation parity, and a posterior
regression against a reference run.

Reference posterior (DatingSoftBound, usedata=2, clock=2, seed 137,
burnin 2000, 20000x10 samples):
  t_n8 0.1871  t_n9 0.1569  t_n10 0.0922  t_n11 0.0639  t_n12 0.0254
  t_n13 0.0481  mu1 0.4849 mu2 0.1670 mu3 2.9423
(reference 1-based node numbers; ours are 0-based: t_n7 == t_n8 etc.)
"""
import math

import numpy as np
import pytest

from paml_tpu.apps import mcmctree as M
from paml_tpu.io import seqio, treeio

from conftest import ref_path

DSB = ref_path("examples", "DatingSoftBound")


def test_calibration_densities_normalize():
    # each density integrates to ~1 over t
    from scipy.integrate import quad
    for kind, p, bks in [("B", [0.06, 0.08, 0.025, 0.025],
                          [0.06, 0.08, 0.0805, 0.09]),
                         ("L", [0.1, 0.1, 1.0, 0.025], [0.1]),
                         ("U", [1.0, 0.025], [1.0]),
                         ("G", [2.0, 20.0], [0.1])]:
        edges = [1e-9] + bks + [120.0]
        val = sum(quad(lambda t: math.exp(
            M._ln_calibration_density(t, kind, p)), a, b, limit=300)[0]
            for a, b in zip(edges[:-1], edges[1:]))
        assert abs(val - 1) < 2e-3, (kind, val)


def test_bds_kernel_cdf_matches_pdf():
    from scipy.integrate import quad
    lam, mu, rho, t1 = 1.0, 1.0, 0.1, 1.0
    p0t1 = rho / (1 + rho * mu * t1)
    vt1 = mu * t1 * p0t1
    for t in [0.2, 0.5, 0.9]:
        cdf = M._bds_cdf(t, t1, vt1, lam, mu, rho)
        num, _ = quad(lambda x: math.exp(
            M._bds_pdf_ln(x, t1, vt1, lam, mu, rho)), 1e-9, t)
        np.testing.assert_allclose(cdf, num, rtol=1e-6)


@pytest.fixture(scope="module")
def dsb_setup():
    alns = seqio.read_alignments(
        ref_path("examples", "DatingSoftBound", "mtCDNApri123.txt"),
        seqio.BASE_SEQ, 3)
    names = alns[0].names
    tree = treeio.read_trees(
        ref_path("examples", "DatingSoftBound", "mtCDNApri.trees"),
        names)[0]
    return alns, names, tree


def test_generate_BV_matches_reference_fits(dsb_setup, tmp_path):
    """Our per-locus ML fits + autodiff Hessians reproduce the reference's
    baseml rst2 values (locus 1: lnL -8900.688351, kappa 14.6076,
    alpha 0.20704, H[0,0] -67018.9485)."""
    alns, names, tree = dsb_setup
    per_locus = M.generate_BV(alns[:1], tree, names, model="HKY85",
                              ncatG=5, alpha0=1.0, fix_alpha=False,
                              outfile=str(tmp_path / "out.BV"))
    data, utopo, bl, grad, H = per_locus[0]
    assert np.abs(grad).max() < 1e-2           # at the MLE
    np.testing.assert_allclose(H[0, 0], -67018.9485, rtol=1e-5)
    np.testing.assert_allclose(sorted(bl)[-1], 0.097941, atol=2e-5)


def test_species_tree_calibrations(dsb_setup):
    alns, names, tree = dsb_setup
    st = M.build_species_tree(tree, names, root_age="<1.0")
    kinds = sorted(k for k, p in st.calibrations.values())
    assert kinds == ["B", "B"]
    assert st.root_age_prior[0] == "U"
    ages = np.zeros(st.topo.nnode)
    # a consistent set of ages gives a finite prior
    order = {7: 0.18, 8: 0.15, 9: 0.09, 10: 0.065, 11: 0.03, 12: 0.05}
    for n, a in order.items():
        ages[n] = a
    lp = M.ln_prior_times(st, ages)
    assert np.isfinite(lp)


@pytest.mark.slow
def test_posterior_regression_usedata2(dsb_setup, tmp_path):
    """Short-chain posterior means vs the reference run (loose MC bounds)."""
    from paml_tpu.io import ctl as ctlmod
    import os
    ctl = tmp_path / "m.ctl"
    ctl.write_text(f"""
seqfile = {DSB}/mtCDNApri123.txt
treefile = {DSB}/mtCDNApri.trees
outfile = {tmp_path}/out.txt
ndata = 3
usedata = 2
clock = 2
RootAge = '<1.0'
model = 4
alpha = 1
ncatG = 5
BDparas = 1 1 0.1
rgene_gamma = 2 20 1
sigma2_gamma = 1 10 1
burnin = 800
sampfreq = 2
nsample = 1200
seed = 7
""")
    opts = ctlmod.read_ctl(str(ctl))
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        summ = M.run_ctl(opts, str(ctl), progress=False)
    finally:
        os.chdir(cwd)
    ref = {"t_n8": 0.1569, "t_n9": 0.0922, "t_n10": 0.0639, "mu1": 0.4849}
    tol = {"t_n8": 0.01, "t_n9": 0.012, "t_n10": 0.008, "mu1": 0.06}
    for k, r in ref.items():
        assert abs(summ[k]["mean"] - r) < tol[k], \
            f"{k}: {summ[k]['mean']} vs reference {r}"


def test_native_skew_t_matches_scipy():
    """Native skew-t (t pdf + incomplete-beta t cdf) vs the scipy
    composition (reference: PDFSkewT src/tools.c:3114, CDFt :3101)."""
    import numpy as np
    from scipy.stats import t as tdist

    rng = np.random.default_rng(4)
    for _ in range(50):
        x, df = float(rng.normal(0, 3)), float(rng.uniform(1.5, 40))
        assert abs(M._t_pdf(x, df) - tdist.pdf(x, df)) < 1e-12
        assert abs(M._t_cdf(x, df) - tdist.cdf(x, df)) < 1e-11
    for _ in range(30):
        t0 = float(rng.uniform(0.01, 8))
        loc, sc = 1.0, float(rng.uniform(0.2, 2))
        sh, df = float(rng.uniform(-5, 5)), float(rng.uniform(2, 30))
        z = (t0 - loc) / sc
        want = (2 / sc * tdist.pdf(z, df)
                * tdist.cdf(sh * z * math.sqrt((df + 1) / (df + z * z)),
                            df + 1))
        got = math.exp(M._ln_calibration_density(
            t0, "ST", [loc, sc, sh, df]))
        assert abs(got - want) <= 1e-10 * max(1.0, want)
