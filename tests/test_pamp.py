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


def test_distance_rev_recovers_jc():
    """distance_rev on an exact F(t) = diag(pi) P(t) recovers t
    (reference: DistanceREV, src/pamp.c:574)."""
    import jax.numpy as jnp
    import numpy as np

    from paml_tpu.apps.pamp import distance_rev
    from paml_tpu.core.pmat import pmat_tn93

    pi = np.full(4, 0.25)
    P = np.asarray(pmat_tn93(jnp.asarray(pi), 1.0, 1.0, 1.0,
                             jnp.asarray([0.37]))[0])
    F = pi[:, None] * P * 5000
    t, Q, pihat, cond = distance_rev(F, 0.0, 5000)
    assert cond == 0
    assert abs(t - 0.37) < 1e-9
    np.testing.assert_allclose(pihat, pi, atol=1e-12)


def test_pattern_ls_mtprim9():
    """PatternLS pipeline (src/pamp.c:631): pairwise REV distances + LS
    branch lengths on mtprim9."""
    import numpy as np

    import conftest
    from paml_tpu.apps.pamp import pattern_ls
    from paml_tpu.core.topology import from_treenode
    from paml_tpu.io import seqio, treeio

    aln = seqio.read_alignment(
        conftest.ref_path("examples", "mtprim9.nuc"), 0)
    data = seqio.pack(aln, cleandata=True)
    trees = treeio.read_trees(
        conftest.ref_path("examples", "9s.trees"), data.names)
    topo = from_treenode(trees[0], data.names)
    out = pattern_ls(topo, data)
    D = out["D"]
    assert (D[np.triu_indices_from(D, 1)] > 0).all()
    assert out["blens"].sum() > 0 and np.isfinite(out["ss"])
    # Q rows: offdiagonals nonnegative
    Q = out["Q"]
    off = Q[~np.eye(4, dtype=bool)]
    assert (off >= 0).all()
