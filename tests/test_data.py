"""Data layer: genetic codes, parsers, filters, pattern compression,
frequency harvesting."""

import numpy as np
import pytest

from hyphy_tpu.data.alignment import Alignment, parse_fasta, read_alignment
from hyphy_tpu.data.filter import DataFilter
from hyphy_tpu.data.genetic_code import GeneticCode, codon_index, codon_string


class TestGeneticCode:
    def test_universal_has_61_sense_codons(self):
        gc = GeneticCode("Universal")
        assert gc.n_states == 61
        assert sorted(codon_string(int(c)) for c in gc.stop_codons) == [
            "TAA", "TAG", "TGA",
        ]

    def test_translation_universal(self):
        gc = GeneticCode("Universal")
        assert gc.translation[codon_index("ATG")] == "M"
        assert gc.translation[codon_index("TGG")] == "W"
        assert gc.translation[codon_index("AAA")] == "K"
        assert gc.translation[codon_index("TTT")] == "F"

    def test_vertebrate_mtdna(self):
        gc = GeneticCode("Vertebrate-mtDNA")
        assert gc.n_states == 60
        assert gc.translation[codon_index("TGA")] == "W"
        assert gc.translation[codon_index("AGA")] == "*"

    def test_one_step_table(self):
        gc = GeneticCode("Universal")
        tbl = gc.one_step_table
        # each sense codon has at most 9 single-nuc neighbors
        assert tbl["pairs"].shape[0] <= 61 * 9
        # TTT(F) -> TTC(F) is synonymous
        i = gc.codon_to_sense[codon_index("TTT")]
        j = gc.codon_to_sense[codon_index("TTC")]
        k = np.nonzero((tbl["pairs"][:, 0] == i) & (tbl["pairs"][:, 1] == j))[0]
        assert len(k) == 1 and tbl["synonymous"][k[0]]


class TestParsers:
    def test_fasta(self):
        aln = parse_fasta(">a\nACGT\n>b\nAC-T\n")
        assert aln.names == ["a", "b"]
        assert aln.sequences == ["ACGT", "AC-T"]

    def test_nexus_cd2(self, cd2_path):
        aln = read_alignment(cd2_path)
        assert aln.n_sequences == 10
        assert aln.n_sites == 561
        assert "Human" in aln.names
        assert "tree" in aln.trees

    def test_datatype_guess(self, cd2_path):
        aln = read_alignment(cd2_path)
        assert aln.guess_datatype() == "nucleotide"


class TestFilter:
    def test_nucleotide_patterns(self, cd2_path):
        aln = read_alignment(cd2_path)
        filt = DataFilter.from_alignment(aln, "nucleotide")
        assert filt.n_states == 4
        assert filt.pattern_weights.sum() == 561
        assert filt.duplicate_map.shape == (561,)
        # reconstruction: pattern of site i equals column i
        lp = filt.leaf_partials()
        assert lp.shape == (10, filt.n_patterns, 4)

    def test_codon_patterns(self, cd2_path):
        aln = read_alignment(cd2_path)
        filt = DataFilter.from_alignment(aln, "codon")
        assert filt.n_states == 61
        assert filt.pattern_weights.sum() == 187
        # gaps resolve to all-ones rows
        lp = filt.leaf_partials()
        assert ((lp.sum(-1) == 61) | (lp.sum(-1) <= 16)).all()

    def test_ambiguity_resolution(self):
        aln = Alignment(["a", "b"], ["ARN-", "ACGT"])
        filt = DataFilter.from_alignment(aln, "nucleotide")
        lp = filt.leaf_partials()
        np.testing.assert_array_equal(lp[0, 0], [1, 0, 0, 0])  # A
        np.testing.assert_array_equal(lp[0, 1], [1, 0, 1, 0])  # R = A/G
        np.testing.assert_array_equal(lp[0, 2], [1, 1, 1, 1])  # N
        np.testing.assert_array_equal(lp[0, 3], [1, 1, 1, 1])  # gap

    def test_harvest_nucleotide(self):
        aln = Alignment(["a", "b"], ["AACC", "AAGG"])
        filt = DataFilter.from_alignment(aln, "nucleotide")
        f = filt.harvest_frequencies(1, 1, False)[:, 0]
        np.testing.assert_allclose(f, [0.5, 0.25, 0.25, 0.0])

    def test_harvest_skips_gaps(self):
        aln = Alignment(["a", "b"], ["AA--", "AAGG"])
        filt = DataFilter.from_alignment(aln, "nucleotide")
        f = filt.harvest_frequencies(1, 1, False)[:, 0]
        np.testing.assert_allclose(f, [4 / 6, 0, 2 / 6, 0])

    def test_harvest_position_specific(self, cd2_path):
        aln = read_alignment(cd2_path)
        filt = DataFilter.from_alignment(aln, "codon")
        f = filt.harvest_frequencies(3, 1, True)
        assert f.shape == (4, 3)
        np.testing.assert_allclose(f.sum(axis=0), 1.0)


class TestBinaryModel:
    def test_binary_filter_and_fit(self, tmp_path):
        """2-state model (reference: libv3/models/binary.bf)."""
        import hyphy_tpu as ht
        from hyphy_tpu.likelihood import LikelihoodFunction, Partition
        from hyphy_tpu.models.binary import Binary

        fa = tmp_path / "bin.fasta"
        fa.write_text(">a\n0101100110\n>b\n0101110110\n>c\n1101100010\n>d\n1001101010\n")
        aln = ht.read_alignment(str(fa))
        filt = ht.DataFilter.from_alignment(aln, "binary")
        assert filt.n_states == 2
        tree = ht.Tree.from_newick("((a,b),(c,d))", leaf_order=filt.names)
        freqs = filt.harvest_frequencies(1, 1, False)[:, 0]
        lf = LikelihoodFunction([Partition(filt, tree, Binary(freqs))])
        res = lf.fit(precision=1e-5)
        assert np.isfinite(res.loglik)
        # saturated upper bound: independent-site multinomial likelihood
        assert res.loglik < 0


class TestHashFormat:
    def test_hash_mark_sequences(self):
        """Legacy '#name' sequence format (dataset.cpp hash-mark reader)."""
        from hyphy_tpu.data.alignment import read_alignment

        a = read_alignment("#s1\nACGTACGT\n#s2\nACGAACGT\n", is_path=False)
        assert a.names == ["s1", "s2"]
        assert a.sequences == ["ACGTACGT", "ACGAACGT"]
