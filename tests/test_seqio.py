import numpy as np
import pytest

from paml_tpu.io import seqio

from conftest import ref_path


def test_brown_patterns():
    # reference baseml prints 85 patterns for brown.nuc (7 taxa x 895 sites)
    aln = seqio.read_alignment(ref_path("examples", "brown.nuc"), seqio.BASE_SEQ)
    assert aln.ns == 5 and aln.ls == 895
    assert aln.names == ["Human", "Chimpanzee", "Gorilla", "Orangutan", "Gibbon"]
    data = seqio.pack(aln, cleandata=True)
    assert data.npatt == 85
    assert data.fpatt.sum() == 895
    # frequencies from the reference output (mlb "Frequencies" block average)
    np.testing.assert_allclose(
        data.base_freqs, [0.25318, 0.32894, 0.31196, 0.10592], atol=2e-5)


def test_horai_partitions():
    aln = seqio.read_alignment(ref_path("examples", "horai.nuc"), seqio.BASE_SEQ)
    assert aln.ns == 6 and aln.ls == 4860
    assert aln.ngene == 4
    assert aln.site_gene is not None and len(aln.site_gene) == 4860
    # codon-position marks 123123... plus gene 4: gene 0 and 1 get 1/3 of
    # the coding part each
    counts = np.bincount(aln.site_gene)
    assert counts.sum() == 4860 and len(counts) == 4
    data = seqio.pack(aln, cleandata=True)
    assert data.ngene == 4
    assert (data.posG[1:] > data.posG[:-1]).all()


def test_abglobin_codon_encoding():
    aln = seqio.read_alignment(ref_path("examples", "abglobin.nuc"), seqio.CODON_SEQ)
    data = seqio.pack(aln, cleandata=True)
    assert data.nstates == 61
    # every clean codon site must be a single sense codon
    assert (data.tip_partials.sum(-1) == 1).all()


def test_ambiguity_statesets():
    from paml_tpu.constants import NUC_ORDER
    m = seqio.encode_nuc(["TRYN-"])
    assert m.shape == (1, 5, 4)
    assert m[0, 0].tolist() == [True, False, False, False]          # T
    assert m[0, 1].tolist() == [False, False, True, True]           # R = AG
    assert m[0, 2].tolist() == [True, True, False, False]           # Y = TC
    assert m[0, 3].all() and m[0, 4].all()                          # N, -


def test_genetic_code_universal():
    from paml_tpu.constants import geneticcode_table, sense_codons, codon_index
    tab = geneticcode_table(0)
    assert len(sense_codons(0)) == 61
    from paml_tpu.constants import AA_ORDER
    assert AA_ORDER[tab[codon_index("ATG")]] == "M"
    assert tab[codon_index("TAA")] == -1 and tab[codon_index("TGA")] == -1
    # vertebrate mito: TGA = Trp, AGA/AGG = stop
    tab1 = geneticcode_table(1)
    assert AA_ORDER[tab1[codon_index("TGA")]] == "W"
    assert tab1[codon_index("AGA")] == -1
    assert len(sense_codons(1)) == 60


def test_fasta_roundtrip(tmp_path):
    p = tmp_path / "x.fa"
    p.write_text(">a\nACGT\n>b\nACGA\n")
    aln = seqio.read_alignment(str(p), seqio.BASE_SEQ)
    assert aln.ns == 2 and aln.ls == 4
    data = seqio.pack(aln)
    assert data.npatt == 4  # ACGT vs ACGA: 3 constant-ish + 1 varying -> 4 cols unique? A,C,G shared; T/A differs
