"""Pairwise ML (runmode -2) golden tests vs the published
YN00abglobin.result.txt ML table (Goldman & Yang 1994) and a fresh
reference codeml runmode=-2 run (2ML.* matrices)."""
import numpy as np
import pytest

from paml_tpu.apps import pairwise
from paml_tpu.io import seqio

from conftest import ref_path


@pytest.fixture(scope="module")
def abglobin_codon():
    aln = seqio.read_alignment(ref_path("examples", "abglobin.nuc"),
                               seqio.CODON_SEQ)
    return seqio.pack(aln, cleandata=True)


def test_pairwise_codon_ml(abglobin_codon):
    res = pairwise.pairwise_codon(abglobin_codon, codonf="F3x4")
    by_pair = {(r.i, r.j): r for r in res}
    # published: seq seq S N dN dS dN/dS t kappa omega lnL
    expected = {
        (1, 0): (186.0, 669.0, 0.0839, 0.4309, 0.4783, 2.2914, 0.1948),
        (2, 0): (179.9, 675.1, 0.0842, 0.4247, 0.4676, 2.1904, 0.1982),
        (2, 1): (183.5, 671.5, 0.1036, 0.4570, 0.5384, 2.2643, 0.2267),
        (4, 0): (176.2, 678.8, 0.1729, 3.0396, 2.2908, 0.9866, 0.0569),
    }
    for (i, j), (S, N, dN, dS, t, k, w) in expected.items():
        r = by_pair[(i, j)]
        np.testing.assert_allclose([r.S, r.N], [S, N], atol=0.1)
        np.testing.assert_allclose([r.dN, r.dS], [dN, dS], atol=2e-4)
        np.testing.assert_allclose([r.t, r.kappa, r.omega], [t, k, w],
                                   atol=2e-3)


def test_pairwise_aa(abglobin_codon):
    aln = seqio.read_alignment(ref_path("examples", "abglobin.aa"),
                               seqio.AA_SEQ)
    data = seqio.pack(aln, cleandata=True)
    res = pairwise.pairwise_aa(data, "Empirical_F", "dayhoff")
    assert len(res) == data.ns * (data.ns - 1) // 2
    assert all(0 < r.t < 10 for r in res)


def test_nuc_distances():
    aln = seqio.read_alignment(ref_path("examples", "brown.nuc"), 0)
    data = seqio.pack(aln, cleandata=True)
    for model in ("JC69", "K80", "F81", "F84"):
        D = pairwise.distance_matrix(data, model)
        assert (D >= 0).all() and np.allclose(D, D.T)
        assert 0.05 < D[1, 0] < 0.2
    # K80 human-chimp distance: hand value ~0.0966 (from pairwise counts)
    D = pairwise.distance_matrix(data, "K80")
    np.testing.assert_allclose(D[1, 0], 0.09655, atol=1e-4)
