"""Ancestral reconstruction + site-rate golden tests vs reference rst/rates
(baseml K80+G5 on brown.nuc, RateAncestor=1; lnL -2726.431712)."""
import jax.numpy as jnp
import numpy as np
import pytest

from paml_tpu.apps import ancestral, baseml
from paml_tpu.constants import NUC_ORDER
from paml_tpu.core.dgamma import discrete_gamma
from paml_tpu.core.topology import from_treenode
from paml_tpu.io import seqio, treeio
from paml_tpu.models import nuc

from conftest import ref_path

# reference reconstructed sequences (rst), first 60 sites per internal node
REF_NODE6 = ("AAGCTTCACCGGCGCAACCATCCTCATAATCGCCCACGGACTTACATCCTCCCTACTATT")
REF_NODE7 = ("AAGCTTCACCGGCGCAGTTATTCTCATAATCGCCCACGGACTTACATCCTCATTATTATT")
REF_NODE8 = ("AAGCTTCACCGGCGCAGTTATTCTCATAATCGCCCACGGACTTACATCCTCATTATTATT")


@pytest.fixture(scope="module")
def k80g5_fit():
    aln = seqio.read_alignment(ref_path("examples", "brown.nuc"), 0)
    data = seqio.pack(aln, cleandata=True)
    topo = from_treenode(treeio.read_trees(
        ref_path("examples", "brown.trees"), data.names)[0], data.names)
    spec = baseml.BasemlSpec(model="K80", ncatG=5, fix_alpha=False,
                             alpha=0.5, cleandata=True)
    res = baseml.fit_packed(data, topo, spec)
    np.testing.assert_allclose(res.lnL, -2726.431712, atol=1e-4)
    # rebuild MLE P matrices
    r, w = discrete_gamma(jnp.asarray(res.alpha[0]), 5)
    tfull = np.zeros(topo.nnode)
    tfull[res.branch_nodes] = res.blens
    ts = jnp.asarray(tfull)[:, None] * r[None, :]
    pi = jnp.asarray(nuc.model_pi("K80", data.base_freqs))
    P, pi_root = nuc.pmats_for_model("K80", jnp.asarray(res.rate_params),
                                     pi, ts)
    piC = jnp.broadcast_to(pi_root, (5, 4))
    return data, topo, P, piC, w, r


def test_marginal_reconstruction(k80g5_fit):
    data, topo, P, piC, w, r = k80g5_fit
    tips = jnp.asarray(data.tip_partials)
    best, prob, post = ancestral.marginal_reconstruction(
        P, tips, topo, piC, w, jnp.asarray(data.fpatt))
    # expand patterns to sites and compare with the reference sequences
    for node, ref_seq in [(5, REF_NODE6), (6, REF_NODE7), (7, REF_NODE8)]:
        mine = "".join(NUC_ORDER[best[node - topo.ns, data.site_pattern[s]]]
                       for s in range(60))
        assert mine == ref_seq, f"node {node + 1}: {mine} != {ref_seq}"
    # reference site-1 probabilities: A(0.998) A(1.000) A(1.000)
    h = data.site_pattern[0]
    A = NUC_ORDER.index("A")
    np.testing.assert_allclose(prob[0, h], 0.998, atol=5e-4)
    assert best[0, h] == A and best[1, h] == A and best[2, h] == A
    np.testing.assert_allclose(prob[1, h], 1.000, atol=5e-4)


def test_site_rates(k80g5_fit):
    data, topo, P, piC, w, r = k80g5_fit
    tips = jnp.asarray(data.tip_partials)
    # reference category rates: 0.02422 0.16684 0.48366 1.11896 3.20631
    np.testing.assert_allclose(
        np.asarray(r), [0.02422, 0.16684, 0.48366, 1.11896, 3.20631],
        atol=5e-5)
    rates = ancestral.site_rates(P, tips, topo, piC, w, r)
    # constant site 1 -> 0.539; variable site 7 (CCCCT) -> 1.668
    np.testing.assert_allclose(rates[data.site_pattern[0]], 0.539, atol=1e-3)
    np.testing.assert_allclose(rates[data.site_pattern[6]], 1.668, atol=1e-3)


def test_joint_reconstruction_single_class(k80g5_fit):
    data, topo, P, piC, w, r = k80g5_fit
    # joint on the single-rate model (class axis collapsed to 1, rate 1)
    tips = jnp.asarray(data.tip_partials)
    P1 = P[:, 2:3]      # middle rate class as a single-class model
    states, lnP = ancestral.joint_reconstruction(P1, tips, topo,
                                                 np.asarray(piC)[:1])
    assert states.shape == (topo.n_internal, data.npatt)
    assert np.isfinite(lnP).all()
    # joint and marginal agree at strongly-supported constant sites
    best, prob, post = ancestral.marginal_reconstruction(
        P, tips, topo, piC, w, jnp.asarray(data.fpatt))
    h = data.site_pattern[0]
    assert (states[:, h] == best[:, h]).all()
