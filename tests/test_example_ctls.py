"""End-to-end smoke matrix: run reference example ctl files through the
CLI and compare against fresh reference-binary results.

HIVNSsites (Yang et al. 2000 table 12, 10th dataset): the 'NSsites = 0 1
2' batch must reproduce M0 -1137.688190, M1a -1114.641736, M2a
-1106.445004 (fresh reference run).
"""
import re

import pytest

import conftest  # noqa: F401


@pytest.mark.slow
def test_hivnssites_ctl_batch(tmp_path, monkeypatch):
    from paml_tpu.__main__ import run_codeml

    monkeypatch.chdir(tmp_path)
    run_codeml(conftest.ref_path("examples", "HIVNSsites", "codeml.ctl"))
    text = open(tmp_path / "mlc").read()
    lnls = [float(v) for v in re.findall(r"lnL.*?(-\d+\.\d+)", text)]
    golden = [-1137.688190, -1114.641736, -1106.445004]
    assert len(lnls) == 3
    for got, want in zip(lnls, golden):
        assert got == pytest.approx(want, abs=2e-3)
        assert got <= want + 1e-2
    # side outputs exist
    assert (tmp_path / "lnf").exists()
    assert (tmp_path / "rst").exists()
    assert (tmp_path / "rub").exists()
