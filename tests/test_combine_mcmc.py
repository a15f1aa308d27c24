"""End-to-end `mcmctree --combine` against the reference's own example
(examples/combine-mcmc/README.txt; reference: CombineMCMCFiles,
src/mcmctree.c:397): numeric-aware filename ordering, blank/incomplete
line skipping, Gen renumbering 1..N, and header-mismatch rejection.
"""
import os
import shutil

import numpy as np
import pytest

import conftest

CMB = conftest.ref_path("examples", "combine-mcmc")


def test_combine_directory_matches_reference(tmp_path, monkeypatch):
    """README documents: 4 files combined in order mcmc_1, mcmc_3,
    mcmc_5, mcmc_21; kept 8 + 7 + 8 + 8 = 31 lines (one incomplete line
    skipped in mcmc_3, one blank line skipped in mcmc_21)."""
    from paml_tpu.apps.mcmctree import main as mcmctree_main
    monkeypatch.chdir(tmp_path)
    mcmctree_main(["--combine", os.path.join(CMB, "to_combine")])
    out = tmp_path / "mcmc_combined.txt"
    assert out.exists()
    lines = out.read_text().splitlines()
    header = lines[0].split()
    assert header[0] == "Gen" and header[-1] == "lnL"
    rows = [ln.split() for ln in lines[1:] if ln.strip()]
    assert len(rows) == 31
    # Gen renumbered 1..31
    assert [int(r[0]) for r in rows] == list(range(1, 32))
    # every row is complete
    assert all(len(r) == len(header) for r in rows)
    # ordering: rows 1-8 come from mcmc_1.txt, 9-15 from mcmc_3.txt
    h1, r1, _, _ = _read(os.path.join(CMB, "to_combine", "mcmc_1.txt"))
    assert float(rows[0][-1]) == pytest.approx(float(r1[0][-1]))
    h3, r3, _, _ = _read(os.path.join(CMB, "to_combine", "mcmc_3.txt"))
    assert float(rows[8][-1]) == pytest.approx(float(r3[0][-1]))


def _read(p):
    from paml_tpu.apps.mcmcutils import read_mcmc_txt
    return read_mcmc_txt(p, skip_malformed=True)


def test_combine_skips_incomplete_and_blank_lines():
    h, rows, n_empty, n_bad = _read(
        os.path.join(CMB, "to_combine", "mcmc_3.txt"))
    assert n_bad == 1 and len(rows) == 7      # truncated last line
    h, rows, n_empty, n_bad = _read(
        os.path.join(CMB, "to_combine", "mcmc_21.txt"))
    assert n_empty == 1 and len(rows) == 8    # trailing blank line


def test_combine_rejects_header_mismatch(tmp_path, monkeypatch):
    """Copy wrong_file/mcmc_4.txt into the set: the reference aborts with
    'Header mismatch detected!' (README NOTE 3)."""
    from paml_tpu.apps.mcmctree import main as mcmctree_main
    d = tmp_path / "to_combine"
    shutil.copytree(os.path.join(CMB, "to_combine"), d)
    shutil.copy(os.path.join(CMB, "wrong_file", "mcmc_4.txt"), d)
    monkeypatch.chdir(tmp_path)
    with pytest.raises(ValueError, match="Header mismatch"):
        mcmctree_main(["--combine", str(d)])


def test_natural_filename_ordering():
    from paml_tpu.apps.mcmcutils import _natural_key
    names = ["mcmc_21.txt", "mcmc_1.txt", "mcmc_5.txt", "mcmc_3.txt"]
    assert sorted(names, key=_natural_key) == [
        "mcmc_1.txt", "mcmc_3.txt", "mcmc_5.txt", "mcmc_21.txt"]
