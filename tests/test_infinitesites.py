"""infinitesites tests.

Clock 1: the posterior is one-dimensional in the root age, so the MCMC
mean can be cross-checked against direct numerical integration of the
same log-density — an independent oracle for both the density and the
sampler.  Clock 2: short chain on the reference's DatingSoftBound
example (FixedDsClock23.txt), checking the posterior root age against
the finite-data mcmctree posterior ballpark (dos Reis & Yang 2013: the
infinite-sites posterior is the limit the finite-data one approaches).
"""
import math

import numpy as np
import pytest

from paml_tpu.apps import infinitesites as I
from paml_tpu.apps import mcmctree as M
from paml_tpu.io import treeio

from conftest import ref_path

DSB = ref_path("examples", "DatingSoftBound")


@pytest.fixture(scope="module")
def species_tree():
    tree_lines = [ln for ln in open(DSB + "/mtCDNApri.trees")
                  if "(" in ln]
    tree = treeio.parse_newick(tree_lines[0].strip())
    names = [n.name for n in tree.walk_pre() if not n.children]
    st = M.build_species_tree(tree, names, bds=(1, 1, 0.1))
    return st, names


def test_clock1_mcmc_matches_quadrature(species_tree):
    st, names = species_tree
    s = st.ns
    g = 2
    # synthetic fixed distances: d11..d1,s-1 (node depths relative),
    # then d21 (locus-2 root depth)
    rng = np.random.default_rng(0)
    base = np.array([0.15, 0.13, 0.09, 0.06, 0.02, 0.05])  # s-1 = 6 nodes
    ds = np.concatenate([base, [0.30]])                    # + d21
    rgene_para = (2.0, 20.0, 1.0)

    # quadrature posterior mean of t0
    from scipy.integrate import quad
    f = lambda t: math.exp(I.ln_pdf_clock1(t, ds, st, rgene_para)[0] + 700)
    z0, _ = quad(f, 0.01, 3.0, limit=500)
    z1, _ = quad(lambda t: t * f(t), 0.01, 3.0, limit=500)
    mean_quad = z1 / z0

    out = I.run_clock1(st, ds, rgene_para, burnin=2000, nsample=8000,
                       sampfreq=2, seed=7)
    se = out["t0"].std() / math.sqrt(200)    # generous ESS guess
    assert abs(out["t0_mean"] - mean_quad) < max(5 * se, 0.01), (
        out["t0_mean"], mean_quad)
    # derived times scale with t0: node ages at the mean obey the fixed
    # ratios d_j / d_root
    ages = out["times"]["mean"]
    np.testing.assert_allclose(ages[1:] / ages[0], base[1:] / base[0],
                               rtol=1e-9)


def test_clock23_reads_reference_fixedds(species_tree):
    st, names = species_tree
    b = I.read_fixed_ds_clock23(DSB + "/FixedDsClock23.txt", st, names)
    assert b.shape == (3, st.topo.nnode)
    root = st.root
    sons = [c for c in st.topo.children[root] if c >= 0]
    assert b[0, root] == -1 and b[0, sons[1]] == -1
    # son0 slot holds the summed root branches: locus 1 tree has
    # 0.073309 + 0.024637 around the root
    s0 = b[:, sons[0]]
    assert any(abs(v - (0.073309 + 0.024637)) < 1e-6 for v in s0)


def test_clock23_posterior_sane(species_tree):
    st, names = species_tree
    b = I.read_fixed_ds_clock23(DSB + "/FixedDsClock23.txt", st, names)
    samples = I.run_clock23(st, b, clock=2, rgene_para=(2, 20, 1),
                            sigma2_para=(1, 10, 1), burnin=3000,
                            nsample=3000, sampfreq=2, seed=11)
    root_key = f"t_n{st.root + 1}"
    t0 = np.array([r[root_key] for r in samples])
    # root calibration B(.12,.16) soft bounds; finite-data posterior mean
    # 0.187 — infinite-sites limit should be nearby
    assert 0.10 < t0.mean() < 0.30, t0.mean()
    # every sampled state keeps ages ordered (implied rates positive)
    mus = np.array([[r[f"mu_L{i+1}"] for i in range(3)] for r in samples])
    assert (mus > 0).all()
    lnp = np.array([r["lnp"] for r in samples])
    assert np.isfinite(lnp).all()


def test_ctl_driver_clock1(tmp_path, species_tree):
    st, names = species_tree
    # build a FixedDsClock1.txt + ctl in tmp dir
    tree_line = open(DSB + "/mtCDNApri.trees").read()
    (tmp_path / "species.trees").write_text(tree_line)
    ds = "7\n0.15 0.13 0.09 0.06 0.02 0.05 0.30\n"
    (tmp_path / "FixedDsClock1.txt").write_text(ds)
    opts = {"treefile": "species.trees", "clock": 1, "ndata": 2,
            "burnin": 200, "nsample": 400, "sampfreq": 1, "seed": 3,
            "rgene_gamma": "2 20 1", "BDparas": "1 1 0.1"}
    out = I.run_ctl(opts, str(tmp_path / "mcmctree.ctl"), progress=False)
    assert 0.0 < out["t0_mean"] < 3.0
