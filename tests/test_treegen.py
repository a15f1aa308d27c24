"""Tree generation/enumeration tests (evolver options 1-4, 8).

Counts are exact combinatorics: #unrooted topologies = (2n-5)!!,
#rooted = (2n-3)!!; labeled histories are uniform under the coalescent
construction (reference: RandomLHistory, src/treesub.c:8612).
"""
import numpy as np
import pytest

from paml_tpu.apps import treegen as T
from paml_tpu.apps.bootstrap import tree_partitions
from paml_tpu.core.topology import from_treenode


@pytest.mark.parametrize("ns,rooted,expect", [
    (4, False, 3), (4, True, 15), (5, False, 15), (5, True, 105),
    (6, False, 105),
])
def test_enumeration_complete_and_distinct(ns, rooted, expect):
    trees = list(T.list_trees(ns, rooted))
    assert len(trees) == expect == T.num_trees(ns, rooted)
    names = T.default_names(ns)
    keys = set()
    for t in trees:
        topo = from_treenode(t, names)
        if rooted:
            desc = topo.tip_descendants()
            keys.add(frozenset(frozenset(desc[j])
                               for j in range(topo.ns, topo.nnode)))
        else:
            keys.add(frozenset(tree_partitions(topo)))
    assert len(keys) == expect


def test_random_labeled_history_uniform():
    # ns=4 rooted: 18 labeled histories, 15 topologies of which the 3
    # balanced ones have 1 history and the 12 caterpillars have... use
    # topology frequencies: balanced topologies get 1/18, caterpillars
    # 1/18 each plus; simplest exact check: each of the 3 ns=3 rooted
    # topologies has equal probability 1/3
    rng = np.random.default_rng(42)
    counts = {}
    n = 3000
    names = T.default_names(3)
    for _ in range(n):
        t, _h = T.random_labeled_history(3, rooted=True, rng=rng)
        topo = from_treenode(t, names)
        desc = topo.tip_descendants()
        key = frozenset(frozenset(desc[j])
                        for j in range(topo.ns, topo.nnode))
        counts[key] = counts.get(key, 0) + 1
    assert len(counts) == 3
    for c in counts.values():
        assert abs(c / n - 1 / 3) < 0.04


def test_bd_branch_lengths():
    rng = np.random.default_rng(1)
    t = T.random_tree_bd(8, rooted=True, birth=2, death=1, sample=0.3,
                         mut=1.5, rng=rng)
    ages = [n.age for n in t.walk_pre() if n.children]
    np.testing.assert_allclose(max(ages), 1.5)     # root height = mut
    for n in t.walk_pre():
        if n.blen is not None:
            assert n.blen >= -1e-12
    # coalescent mode (sample=0): increasing ages, no fixed height
    ages2 = T.bd_ages(6, 0, 0, 0.0, 1.0, rng)
    assert (np.diff(ages2) > 0).all()


def test_bd_unrooted_third_branch():
    rng = np.random.default_rng(7)
    t = T.random_tree_bd(6, rooted=False, birth=2, death=1, sample=0.5,
                         mut=1.0, rng=rng)
    assert len(t.children) == 3
    for n in t.walk_pre():
        if n is not t and n.blen is not None:
            assert n.blen >= -1e-12


def test_tree_distances():
    trees = list(T.list_trees(5, False))
    sh, rf = T.tree_distances(trees)
    assert (np.diag(rf) == 0).all()
    assert (rf == rf.T).all()
    assert (np.diag(sh) == 2).all()                 # 5 taxa: 2 internal
    assert rf.max() <= 4


def test_make_tree_ib_matches_index_roundtrip():
    # every index yields a tree; index order is stable
    t1 = T.tree_from_index(7, 5, rooted=False)
    t2 = T.tree_from_index(7, 5, rooted=False)
    names = T.default_names(5)
    p1 = tree_partitions(from_treenode(t1, names))
    p2 = tree_partitions(from_treenode(t2, names))
    assert p1 == p2
