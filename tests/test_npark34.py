"""nparK = 3/4 rate-class HMM models (rK & MK).

Golden from a fresh reference baseml run on brown.nuc (HKY85, ncatG=3,
nparK=4): lnL -2616.558391, np 16.  The surface is multimodal; our
multi-start L-BFGS finds a better optimum (-2612.41), so the assertion is
one-sided: at least as good as the reference.  Reference: SetParameters
nparK arms src/baseml.c:1392-1424, lfunAdG src/treesub.c:7447.
"""
import pytest

import conftest  # noqa: F401
from paml_tpu.apps import baseml


@pytest.mark.slow
def test_npark4_beats_reference():
    res = baseml.fit(
        conftest.ref_path("examples", "brown.nuc"),
        conftest.ref_path("examples", "brown.trees"),
        baseml.BasemlSpec(model="HKY85", cleandata=True, nparK=4,
                          ncatG=3, kappa=5.0))
    assert res.np == 16
    assert res.lnL >= -2616.558391 - 1e-3


def test_npark3_runs():
    res = baseml.fit(
        conftest.ref_path("examples", "brown.nuc"),
        conftest.ref_path("examples", "brown.trees"),
        baseml.BasemlSpec(model="HKY85", cleandata=True, nparK=3,
                          ncatG=2, kappa=5.0))
    # doubly-stochastic MK with K=2: np = 7 t + kappa + 1 rK + 1 MK row
    assert res.np == 10
    import numpy as np
    assert np.isfinite(res.lnL)
