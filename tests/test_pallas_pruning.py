"""Parity of the fused Pallas pruning kernel vs the einsum level path.

Runs in Pallas interpreter mode on CPU (the suite's backend); on real TPU
hardware the same kernel is exercised compiled (bench.py and any codeml
run dispatch to it automatically via pruning.class_site_lnf).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from paml_tpu.core import pallas_pruning, pruning
from paml_tpu.core.topology import from_treenode
from paml_tpu.io import treeio


def _random_problem(ns=9, H=200, C=3, n=61, seed=0, ladder=False,
                    state_tips=True, root_trifurcation=True):
    rng = np.random.default_rng(seed)
    names = [f"t{i}" for i in range(ns)]
    if ladder:
        nwk = names[0]
        for nm in names[1:-1]:
            nwk = f"({nwk},{nm})"
        nwk = f"({nwk},{names[-1]});"
    elif root_trifurcation and ns >= 5:
        mid1, mid2 = ns // 3, 2 * ns // 3

        def bal(lo, hi):
            if hi - lo == 1:
                return names[lo]
            m = (lo + hi) // 2
            return f"({bal(lo, m)},{bal(m, hi)})"
        nwk = f"({bal(0, mid1)},{bal(mid1, mid2)},{bal(mid2, ns)});"
    else:
        def bal(lo, hi):
            if hi - lo == 1:
                return names[lo]
            m = (lo + hi) // 2
            return f"({bal(lo, m)},{bal(m, hi)})"
        nwk = bal(0, ns) + ";"
    tree = treeio.parse_newick(nwk)
    topo = from_treenode(tree, names)

    # random reversible-ish P rows (positive, row-normalized)
    P = rng.gamma(1.0, 1.0, size=(topo.nnode, C, n, n)).astype(np.float32)
    P = P / P.sum(axis=-1, keepdims=True)
    # make diagonally dominant (transition-matrix-like)
    eye = np.eye(n, dtype=np.float32)
    P = 0.7 * eye[None, None] + 0.3 * P
    pi = rng.dirichlet(np.ones(n), size=C).astype(np.float32)
    if state_tips:
        tips = rng.integers(0, n, size=(ns, H)).astype(np.int32)
    else:
        states = rng.integers(0, n, size=(ns, H))
        tips = np.zeros((ns, H, n), np.float32)
        tips[np.arange(ns)[:, None], np.arange(H)[None, :], states] = 1.0
        # sprinkle ambiguity: a few patterns with multi-hot tips
        amb = rng.integers(0, H, size=10)
        tips[0, amb] = 0.0
        tips[0, amb, :5] = 1.0
    return jnp.asarray(P), jnp.asarray(tips), topo, jnp.asarray(pi)


@pytest.mark.parametrize("state_tips", [True, False])
@pytest.mark.parametrize("ladder", [True, False])
def test_pallas_lnf_matches_level_path(state_tips, ladder):
    P, tips, topo, pi = _random_problem(state_tips=state_tips,
                                        ladder=ladder, seed=1)
    ref = pruning._class_site_lnf_lvl(P, tips, topo, pi)
    got = pallas_pruning.class_site_lnf_pallas(P, tips, topo, pi, 128, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-6, atol=2e-6)


@pytest.mark.parametrize("state_tips", [True, False])
def test_pallas_grad_matches_level_path(state_tips):
    P, tips, topo, pi = _random_problem(ns=7, H=150, C=2,
                                        state_tips=state_tips, seed=2)
    w = jnp.asarray(np.random.default_rng(3).uniform(0.5, 2.0, size=150),
                    jnp.float32)

    def obj_ref(P, pi):
        return jnp.sum(w * jnp.sum(
            pruning._class_site_lnf_lvl(P, tips, topo, pi), axis=0))

    def obj_pl(P, pi):
        return jnp.sum(w * jnp.sum(
            pallas_pruning.class_site_lnf_pallas(P, tips, topo, pi, 128,
                                                 True), axis=0))

    vr, (gPr, gpir) = jax.value_and_grad(obj_ref, argnums=(0, 1))(P, pi)
    vp, (gPp, gpip) = jax.value_and_grad(obj_pl, argnums=(0, 1))(P, pi)
    np.testing.assert_allclose(float(vp), float(vr), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gPp), np.asarray(gPr),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(gpip), np.asarray(gpir),
                               rtol=3e-5, atol=3e-5)


def test_pallas_multifurcating_and_uneven_tiles():
    # basal trifurcation + H not a multiple of the tile
    P, tips, topo, pi = _random_problem(ns=11, H=193, C=4, seed=5)
    ref = pruning._class_site_lnf_lvl(P, tips, topo, pi)
    got = pallas_pruning.class_site_lnf_pallas(P, tips, topo, pi, 128, True)
    assert got.shape == ref.shape == (4, 193)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-6, atol=2e-6)


def test_dispatch_gating():
    # CPU default: maybe_pallas_lnf returns None (einsum paths keep serving)
    P, tips, topo, pi = _random_problem(ns=5, H=64, C=1, seed=7)
    assert pallas_pruning.maybe_pallas_lnf(P, tips, topo, pi) is None

    # forced on (env): dispatch through the public API matches level path
    import os
    os.environ["PAML_TPU_PALLAS"] = "1"
    try:
        got = pruning.class_site_lnf(P, tips, topo, pi)
        ref = pruning._class_site_lnf_lvl(P, tips, topo, pi)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-6, atol=2e-6)
    finally:
        del os.environ["PAML_TPU_PALLAS"]
