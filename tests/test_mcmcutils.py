"""Checkpoint/combine/ds/BFdriver/multiruns utilities."""
import numpy as np
import pytest

from paml_tpu.apps import mcmcutils


def test_combine_and_ds(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    for k in range(3):
        p = tmp_path / f"mcmc{k}.txt"
        with open(p, "w") as f:
            f.write("Gen\tt_n8\tmu1\n")
            for i in range(100):
                f.write(f"{i+1}\t{rng.normal(0.15, 0.01):.6f}\t"
                        f"{rng.normal(0.5, 0.05):.6f}\n")
        paths.append(str(p))
    out = str(tmp_path / "merged.txt")
    n = mcmcutils.combine_mcmc(paths, out)
    assert n == 300
    stats = mcmcutils.describe_file(out)
    assert abs(stats["t_n8"]["mean"] - 0.15) < 0.005
    assert stats["mu1"]["hpd_lo"] < 0.5 < stats["mu1"]["hpd_hi"]
    # incomplete lines are SKIPPED with a count (reference --combine
    # semantics, src/mcmctree.c CombineMCMCFiles NOTE 2); header
    # mismatches abort
    bad = tmp_path / "bad.txt"
    bad.write_text("Gen\tt\n1\t0.1\n2\n")
    n = mcmcutils.combine_mcmc([str(bad)], str(tmp_path / "x.txt"))
    assert n == 1
    other = tmp_path / "other.txt"
    other.write_text("Gen\tt\tmu\n1\t0.1\t0.2\n")
    with pytest.raises(ValueError, match="Header mismatch"):
        mcmcutils.combine_mcmc([str(bad), str(other)],
                               str(tmp_path / "y.txt"))


def test_checkpoint_roundtrip(tmp_path):
    class Dummy:
        pass
    mc = Dummy()
    rng = np.random.default_rng(42)
    mc.ages = rng.random(5)
    mc.mu = rng.random(3)
    mc.sigma2 = rng.random(3)
    mc.rates = rng.random((5, 3))
    mc.kappa = rng.random(3)
    mc.alpha_g = rng.random(3)
    mc.rng = rng
    draw_before = None
    mcmcutils.save_state(mc, str(tmp_path / "ckpt"), it=123)
    draw_after_save = mc.rng.random()
    mc2 = Dummy()
    mc2.rng = np.random.default_rng(0)
    it = mcmcutils.load_state(mc2, str(tmp_path / "ckpt"))
    assert it == 123
    np.testing.assert_array_equal(mc2.ages, mc.ages)
    # RNG stream resumes identically
    assert mc2.rng.random() == draw_after_save


def test_bfdriver_and_logml(tmp_path):
    ctl = tmp_path / "m.ctl"
    ctl.write_text("seqfile = x\nusedata = 2\n")
    betas, ws = mcmcutils.bfdriver(str(ctl), nbeta=8,
                                   outdir=str(tmp_path / "bf"))
    assert len(betas) == 8 and abs(ws.sum() - 1) < 1e-12
    assert (tmp_path / "bf" / "b1" / "mcmctree.ctl").exists()
    # TI of a linear power posterior: E_beta[lnL] = c -> logML = c
    logml = mcmcutils.gauss_legendre_logml(np.full(8, -123.4), ws)
    np.testing.assert_allclose(logml, -123.4)


def test_multiruns(tmp_path):
    a = tmp_path / "r1.txt"
    b = tmp_path / "r2.txt"
    a.write_text("1 0.5 -100.5\n2 0.6 -200.0\n")
    b.write_text("1 0.4 -101.0\n2 0.7 -199.5\n")
    out = str(tmp_path / "best.txt")
    n = mcmcutils.multiruns([str(a), str(b)], out)
    assert n == 2
    lines = open(out).read().splitlines()
    assert lines[0].endswith("-100.5")     # run 1 better for dataset 1
    assert lines[1].endswith("-199.5")     # run 2 better for dataset 2
