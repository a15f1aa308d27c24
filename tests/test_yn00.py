"""yn00 golden tests.

Expected values from a fresh run of the reference yn00 on
examples/abglobin.nuc (verbose=1, icode=0, weighting=1, commonf3x4=0),
which also reproduces the checked-in
/root/reference/examples/YN00abglobin.result.txt table.
"""
import numpy as np
import pytest

from paml_tpu.apps import yn00

from conftest import ref_path


@pytest.fixture(scope="module")
def abglobin_results():
    return yn00.run(ref_path("examples", "abglobin.nuc"), common_f3x4=False)


def test_ng86(abglobin_results):
    r = abglobin_results[0]        # pair 2-1: goat-cow vs human
    np.testing.assert_allclose(r.ng_dN, 0.0863, atol=5e-5)
    np.testing.assert_allclose(r.ng_dS, 0.3443, atol=5e-5)
    np.testing.assert_allclose(r.ng_dN / r.ng_dS, 0.2507, atol=5e-4)


def test_yn00_method(abglobin_results):
    r = abglobin_results[0]
    np.testing.assert_allclose(
        [r.S, r.N, r.t, r.kappa, r.omega, r.dN, r.dS],
        [183.7, 671.3, 0.5191, 1.5804, 0.1573, 0.0804, 0.5114],
        rtol=5e-4)
    np.testing.assert_allclose([r.SEdN, r.SEdS], [0.0114, 0.0942], atol=1e-4)
    r = abglobin_results[2]        # pair 3-2
    np.testing.assert_allclose(
        [r.S, r.N, r.t, r.omega, r.dN, r.dS],
        [180.1, 674.9, 0.5623, 0.1930, 0.0997, 0.5165], rtol=5e-4)


def test_lwl_family(abglobin_results):
    r = abglobin_results[0]
    np.testing.assert_allclose(
        [r.lwl["LWL85"]["dS"], r.lwl["LWL85"]["dN"],
         r.lwl["LWL85"]["S"], r.lwl["LWL85"]["N"]],
        [0.3495, 0.0856, 212.2, 642.8], atol=0.06)
    np.testing.assert_allclose(
        [r.lwl["LWL85m"]["dS"], r.lwl["LWL85m"]["dN"], r.lwl["LWL85m"]["rho"]],
        [0.2861, 0.0924, 0.640], atol=5e-4)
    np.testing.assert_allclose(
        [r.lwl["LPB93"]["dS"], r.lwl["LPB93"]["dN"]],
        [0.2918, 0.0865], atol=5e-5)
