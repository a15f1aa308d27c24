"""pamp golden test (mtprim9.nuc, reference values from src/pamp)."""
import numpy as np

from paml_tpu.apps import pamp

from conftest import ref_path


def test_pamp_alpha_estimates():
    res = pamp.run(ref_path("examples", "mtprim9.nuc"),
                   ref_path("examples", "9s.trees"))
    np.testing.assert_array_equal(res.n_changes_hist,
                                  [388, 195, 149, 113, 37, 6])
    np.testing.assert_allclose([res.mean, res.var], [1.1374, 1.5798],
                               atol=1e-4)
    np.testing.assert_allclose(res.alpha_mm, 2.9244, atol=1e-4)
    np.testing.assert_allclose(res.alpha_sullivan, 2.0498, atol=1e-4)
    np.testing.assert_allclose(res.alpha_yk96, 1.3649, atol=1e-4)
    assert res.pattern_matrix.shape == (4, 4)
    assert res.pattern_matrix.sum() > 0
