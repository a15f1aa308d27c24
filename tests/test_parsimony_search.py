"""Parsimony, tree search, and RELL/KH/SH tests vs reference values.

Reference (baseml, brown.nuc cleandata=1, three rooted trees):
  MP scores 357 / 358 / 355; clock=1 lnLs -2749.218 / -2759.489 / -2758.621
  RELL proportions ~ 0.860 / 0.056 / 0.085; pKH 0.092 / 0.117.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from paml_tpu.apps import baseml, bootstrap, parsimony, treesearch
from paml_tpu.core import pruning
from paml_tpu.core.topology import from_treenode
from paml_tpu.io import seqio, treeio
from paml_tpu.models import nuc

from conftest import ref_path


@pytest.fixture(scope="module")
def brown():
    aln = seqio.read_alignment(ref_path("examples", "brown.nuc"), 0)
    data = seqio.pack(aln, cleandata=True)
    trees = treeio.read_trees(ref_path("examples", "brown.rooted.trees"),
                              data.names)
    return data, trees


def test_mp_scores(brown):
    data, trees = brown
    scores = [parsimony.mp_score(from_treenode(t, data.names), data)
              for t in trees]
    assert scores == [357.0, 358.0, 355.0]


def test_informative_sites(brown):
    data, _ = brown
    inf = parsimony.informative_sites(data)
    assert 0 < inf.sum() < data.npatt


def test_stepwise_addition_recovers_best_tree(brown):
    data, trees = brown
    tree, score = treesearch.stepwise_addition_mp(data)
    assert score <= 360.0          # greedy addition may miss the optimum
    t2, s2 = treesearch.nni_search_mp(data, tree)
    # NNI refinement reaches the best of the 3 reference topologies (355)
    assert s2 <= 355.0


def test_rell_kh_sh(brown):
    data, trees = brown
    # per-site lnf for each tree at its clock=1 MLE
    site_lnf = []
    for ti in range(3):
        spec = baseml.BasemlSpec(model="K80", clock=1, cleandata=True)
        topo = from_treenode(trees[ti], data.names)
        res = baseml.fit_packed(data, topo, spec)
        neg, unpack, x0, bounds = baseml.make_objective(data, topo, spec)
        t, rgene, rates, alpha = unpack(jnp.asarray(res.x))
        tfull = np.zeros(topo.nnode)
        tfull[res.branch_nodes] = res.blens
        pi = jnp.asarray(nuc.model_pi("K80", data.base_freqs))
        P, pi_root = nuc.pmats_for_model(
            "K80", rates, pi, jnp.asarray(tfull)[:, None])
        lnf = pruning.site_loglik(P, jnp.asarray(data.tip_partials), topo,
                                  jnp.broadcast_to(pi_root, (1, 4)),
                                  jnp.ones(1))
        site_lnf.append(np.asarray(lnf))
    site_lnf = np.stack(site_lnf)
    tc = bootstrap.tree_comparison(site_lnf, data.fpatt, n_boot=20000,
                                   seed=3)
    np.testing.assert_allclose(
        tc["lnL"], [-2749.218349, -2759.489249, -2758.621146], atol=1e-3)
    assert tc["best"] == 0
    np.testing.assert_allclose(tc["pRELL"], [0.860, 0.056, 0.085], atol=0.02)
    np.testing.assert_allclose(tc["pKH"][1:], [0.092, 0.117], atol=5e-3)
    assert 0 < tc["pSH"][1] < 0.5 and 0 < tc["pSH"][2] < 0.5


def test_partition_distance(brown):
    data, trees = brown
    topos = [from_treenode(t, data.names) for t in trees]
    assert bootstrap.partition_distance(topos[0], topos[0]) == 0
    assert bootstrap.partition_distance(topos[0], topos[1]) > 0
    sup = bootstrap.clade_support(topos[0], topos)
    assert all(0 <= v <= 1 for v in sup.values())
