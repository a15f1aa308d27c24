"""BEB site-posterior golden tests (HIV env M2a/M8 vs fresh reference runs).

Reference values: codeml on examples/HIVNSsites/HIVenvSweden.txt with
NSsites=2 (M2a) and NSsites=8 ncatG=10 (M8); BEB tables from mlc.
"""
import numpy as np
import pytest

from paml_tpu.apps import beb, codeml
from paml_tpu.core.topology import from_treenode
from paml_tpu.io import seqio, treeio

from conftest import ref_path


def _setup(NSsites, ncatG=3):
    aln = seqio.read_alignment(
        ref_path("examples", "HIVNSsites", "HIVenvSweden.txt"), 1)
    data = seqio.pack(aln, cleandata=True)
    topo = from_treenode(treeio.read_trees(
        ref_path("examples", "HIVNSsites", "HIVenvSweden.trees"),
        data.names)[0], data.names)
    spec = codeml.CodemlSpec(NSsites=NSsites, ncatG=ncatG, cleandata=True)
    res = codeml.fit_packed(data, topo, spec)
    return data, topo, spec, res


def test_beb_m2a_hivenv():
    data, topo, spec, res = _setup(2)
    np.testing.assert_allclose(res.lnL, -1106.445004, atol=2e-4)
    sp = beb.beb(data, topo, spec, res)
    # reference BEB table values (site, P(w>1), mean w, SE)
    expected = {28: (0.999, 3.729, 1.024), 66: (0.998, 3.727, 1.026),
                87: (0.987, 3.696, 1.062), 26: (0.904, 3.408, 1.184)}
    for s, (p, w, se) in expected.items():
        h = data.site_pattern[s - 1]
        np.testing.assert_allclose(sp.p_positive[h], p, atol=2e-3)
        np.testing.assert_allclose(sp.mean_w[h], w, atol=5e-3)
        np.testing.assert_allclose(sp.se_w[h], se, atol=5e-3)
    sites = [s for s, p, w in beb.positive_sites(data, sp, 0.5)]
    assert sites == [1, 9, 22, 24, 26, 28, 31, 39, 40, 51, 66, 68, 69,
                     76, 83, 87]


def test_beb_m8_hivenv():
    data, topo, spec, res = _setup(8, ncatG=10)
    np.testing.assert_allclose(res.lnL, -1106.388268, atol=2e-4)
    assert res.np == 28
    sp = beb.beb(data, topo, spec, res)
    expected = {28: (1.000, 3.183, 0.653), 66: (1.000, 3.183, 0.654),
                26: (0.972, 3.112, 0.744), 1: (0.796, 2.627, 1.064)}
    for s, (p, w, se) in expected.items():
        h = data.site_pattern[s - 1]
        np.testing.assert_allclose(sp.p_positive[h], p, atol=2e-3)
        np.testing.assert_allclose(sp.mean_w[h], w, atol=5e-3)
        np.testing.assert_allclose(sp.se_w[h], se, atol=5e-3)


def test_neb_m2a_consistency():
    data, topo, spec, res = _setup(2)
    sp = beb.neb(data, topo, spec, res)
    assert sp.class_post.shape[0] == 3
    np.testing.assert_allclose(sp.class_post.sum(0), 1.0, atol=1e-10)
    # NEB should agree with BEB on the strongest site
    h = data.site_pattern[27]
    assert sp.p_positive[h] > 0.95


@pytest.mark.slow
def test_beb_branchsite_A_vs_reference():
    """Branch-site model A BEB (reference: lfunNSsites_ACD,
    src/codeml.c:6827) on lysozymeSmall tree 2: 4-class posteriors match
    a fresh reference run digit-for-digit (first 4 sites shown in the
    reference rst: 0.21596 0.09912 0.45863 0.22629 / ...)."""
    from paml_tpu.apps import beb as bebmod
    from paml_tpu.apps import codeml
    from paml_tpu.core.topology import from_treenode
    from paml_tpu.io import seqio, treeio

    LYS = (ref_path("examples", "lysozyme", "lysozymeSmall.txt"),
           ref_path("examples", "lysozyme", "lysozymeSmall.trees"))
    spec = codeml.CodemlSpec(cleandata=True, model=2, NSsites=2, omega=1.5)
    res = codeml.fit(*LYS, spec, tree_index=1)
    np.testing.assert_allclose(res.lnL, -894.284097, atol=2e-4)
    aln = seqio.read_alignment(LYS[0], 1)
    data = seqio.pack(aln, cleandata=True, icode=0)
    topo = from_treenode(treeio.read_trees(LYS[1], data.names)[1],
                         data.names)
    acd = bebmod.beb_branchsite_A(data, topo, spec, res)
    post = acd["postSite"]
    ref = np.array([[0.21596, 0.09912, 0.45863, 0.22629],
                    [0.07441, 0.22415, 0.16004, 0.54140],
                    [0.20228, 0.10534, 0.44422, 0.24817],
                    [0.22748, 0.09407, 0.46938, 0.20907]])
    got = np.stack([post[:, data.site_pattern[s]] for s in range(4)])
    np.testing.assert_allclose(got, ref, atol=5e-5)
    assert acd["pos_prob"].shape == (data.npatt,)
