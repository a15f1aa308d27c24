"""Parity of the dynamic (large-tree) Pallas kernel vs the level path.

Interpreter mode on CPU; on TPU hardware the kernel is exercised by
bench.py's 1024-taxon north-star shape.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from paml_tpu.core import pallas_pruning_big, pruning
from tests.test_pallas_pruning import _random_problem


@pytest.mark.parametrize("ladder", [False, True])
def test_big_kernel_lnf_matches(ladder):
    P, tips, topo, pi = _random_problem(ns=12, H=300, C=3, seed=3,
                                        ladder=ladder, state_tips=True)
    ref = pruning._class_site_lnf_lvl(P, tips, topo, pi)
    got = pallas_pruning_big.class_site_lnf_big(P, tips, topo, pi, 128, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-6, atol=2e-6)


def test_big_kernel_grad_matches():
    P, tips, topo, pi = _random_problem(ns=9, H=260, C=2, seed=4,
                                        state_tips=True)
    w = jnp.asarray(np.random.default_rng(5).uniform(0.5, 2.0, size=260),
                    jnp.float32)

    def obj(fn):
        def f(P, pi):
            return jnp.sum(w * jnp.sum(fn(P, tips, topo, pi), axis=0))
        return f

    ref_fn = obj(lambda *a: pruning._class_site_lnf_lvl(*a))
    big_fn = obj(lambda P, t, tp, pi:
                 pallas_pruning_big.class_site_lnf_big(P, t, tp, pi, 128,
                                                       True))
    vr, (gPr, gpir) = jax.value_and_grad(ref_fn, argnums=(0, 1))(P, pi)
    vb, (gPb, gpib) = jax.value_and_grad(big_fn, argnums=(0, 1))(P, pi)
    np.testing.assert_allclose(float(vb), float(vr), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gPb), np.asarray(gPr),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(gpib), np.asarray(gpir),
                               rtol=3e-5, atol=3e-5)


def test_big_kernel_multifurcating_uneven():
    P, tips, topo, pi = _random_problem(ns=11, H=193, C=4, seed=6,
                                        state_tips=True)
    ref = pruning._class_site_lnf_lvl(P, tips, topo, pi)
    got = pallas_pruning_big.class_site_lnf_big(P, tips, topo, pi, 128, True)
    assert got.shape == (4, 193)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-6, atol=2e-6)


def test_choose_tile_big_rejects_wide_state_spaces():
    """State spaces wider than the NJ=64 sublane padding must fall back
    to the einsum paths instead of crashing on a negative pad (ADVICE
    r3: 64 < n <= 128 hit `NJ - n < 0` in _grids)."""
    from paml_tpu.core import pallas_pruning_big as pbig
    P, tips, topo, pi = _random_problem(ns=12, H=64, C=2, seed=9,
                                        state_tips=True)
    assert pbig.choose_tile_big(topo, 2, 128, n=100) is None
    assert pbig.choose_tile_big(topo, 2, 128, n=61) is not None
