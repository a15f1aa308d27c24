"""Amino-acid model golden tests (codeml seqtype=2).

Expected values from fresh reference codeml runs on mtCDNApri.aa
(cleandata=1); the JTT+F value also matches the checked-in
/root/reference/examples/mtCDNA/AAcodon.result.txt:60.
"""
import numpy as np
import pytest

from paml_tpu.apps import codeml

from conftest import ref_path

MT = (ref_path("examples", "mtCDNA", "mtCDNApri.aa"),
      ref_path("examples", "mtCDNA", "mtCDNApri.trees"))

CASES = {
    "poisson": (dict(aa_model="Poisson"), -16566.598235, 11),
    "equalinput": (dict(aa_model="EqualInput"), -15503.260838, 11),
    "jtt_f": (dict(aa_model="Empirical_F", aa_rate_file="jones"),
              -14717.981418, 11),
    "mtmam": (dict(aa_model="Empirical", aa_rate_file="mtmam"),
              -14558.594662, 11),
    "jtt_f_g5": (dict(aa_model="Empirical_F", aa_rate_file="jones",
                      fix_alpha=False, alpha=0.5, ncatG=5),
                 -14583.545624, 12),
}


@pytest.mark.parametrize("name", list(CASES))
def test_aaml_golden(name):
    kw, lnl, nparams = CASES[name]
    res = codeml.fit(*MT, codeml.CodemlSpec(seqtype=2, cleandata=True, **kw))
    assert res.np == nparams
    np.testing.assert_allclose(res.lnL, lnl, atol=2e-4)


def test_aa_matrix_library():
    from paml_tpu.models import aa
    mats = aa.available_matrices()
    for m in ["dayhoff", "jones", "wag", "lg", "mtREV24", "mtmam",
              "cpREV10", "MtZoa"]:
        assert m in mats, f"{m} missing"
        S, pi = aa.load_empirical(m)
        assert S.shape == (20, 20) and abs(pi.sum() - 1) < 1e-9
        assert (S >= 0).all() and np.allclose(S, S.T)
    D = aa.load_distance("grantham")
    # Grantham distance Leu-Ile = 5, Cys-Trp = 215 (published values)
    from paml_tpu.constants import AA_ORDER
    L, I = AA_ORDER.index("L"), AA_ORDER.index("I")
    C, W = AA_ORDER.index("C"), AA_ORDER.index("W")
    assert D[L, I] == 5.0
    assert D[C, W] == 215.0
