"""Pairwise-aligner tests (reference: tests/hbltests/Alignment suite;
semantics of AlignSequences, src/core/alignment.cpp)."""

import numpy as np
import pytest

from hyphy_tpu import align
from hyphy_tpu import native


class TestGotoh:
    def test_identical(self):
        sc, a, b = align.align_sequences("ACGTACGT", "ACGTACGT")
        assert a == b == "ACGTACGT"
        assert sc == 8 * 5.0

    def test_simple_gap(self):
        sc, a, b = align.align_sequences("ACGTTT", "ACGTT")
        assert a.replace("-", "") == "ACGTTT"
        assert b.replace("-", "") == "ACGTT"
        assert len(a) == len(b) == 6
        assert b.count("-") == 1

    def test_leading_gap(self):
        sc, a, b = align.align_sequences("TTACGT", "ACGT")
        assert a == "TTACGT"
        assert b == "--ACGT"

    def test_local_alignment(self):
        sc, a, b = align.align_sequences(
            "GGGGACGTACGTGGGG", "ACGTACGT", local=True
        )
        assert a == "ACGTACGT"
        assert b == "ACGTACGT"
        assert sc == 40.0

    def test_protein(self):
        sc, a, b = align.align_sequences("MKLVW", "MKLW", datatype="protein")
        assert a.replace("-", "") == "MKLVW"
        assert b.replace("-", "") == "MKLW"

    @pytest.mark.skipif(not native.load_library("align"), reason="no toolchain")
    def test_native_matches_python(self):
        rng = np.random.default_rng(0)
        for trial in range(8):
            a = "".join(rng.choice(list("ACGT"), size=rng.integers(5, 30)))
            b = "".join(rng.choice(list("ACGT"), size=rng.integers(5, 30)))
            for local in (False, True):
                s1, a1, b1 = align.align_sequences(a, b, local=local, use_native=True)
                s2, a2, b2 = align.align_sequences(a, b, local=local, use_native=False)
                assert abs(s1 - s2) < 1e-9, (a, b, local)
                # paths may differ on ties; scores must agree exactly


class TestCodonAlign:
    def test_clean_codon(self):
        ref = "ATGAAACCCGGG"
        sc, a, b = align.align_codon(ref, ref)
        assert a == b == ref

    def test_codon_deletion(self):
        ref = "ATGAAACCCGGG"
        qry = "ATGCCCGGG"  # AAA codon deleted
        sc, a, b = align.align_codon(ref, qry)
        assert a == ref
        assert b == "ATG---CCCGGG"

    def test_frameshift_single_deletion(self):
        # query lost one nucleotide mid-codon: must use a 3x2 step, not
        # garble the rest of the alignment
        ref = "ATGAAACCCGGGTTT"
        qry = "ATGAA" + "CCCGGGTTT"
        sc, a, b = align.align_codon(ref, qry)
        assert a.replace("-", "") == ref
        assert b.replace("-", "") == qry
        # downstream codons stay aligned in frame
        assert a.endswith("CCCGGGTTT")
        assert b.endswith("CCCGGGTTT")

    def test_frameshift_single_insertion(self):
        ref = "ATGAAACCCGGGTTT"
        qry = "ATGAAAT" + "CCCGGGTTT"  # extra T after codon 2
        sc, a, b = align.align_codon(ref, qry)
        assert a.replace("-", "") == ref
        assert b.replace("-", "") == qry
        assert a.endswith("CCCGGGTTT")
        assert b.endswith("CCCGGGTTT")

    def test_stop_codons_penalized(self):
        s = align.codon_scores()
        taa = align._encode("TAA", "ACGT")
        idx = taa[0] * 16 + taa[1] * 4 + taa[2]
        assert s[idx, idx] <= -50.0

    def test_synonymous_bonus(self):
        s = align.codon_scores(synonymous_bonus=1.0)
        # CTT and CTC are both Leucine
        ctt = align._encode("CTT", "ACGT")
        ctc = align._encode("CTC", "ACGT")
        i = ctt[0] * 16 + ctt[1] * 4 + ctt[2]
        j = ctc[0] * 16 + ctc[1] * 4 + ctc[2]
        leu = align._BLOSUM62[align._AA.index("L"), align._AA.index("L")]
        assert s[i, j] == leu + 1.0

    @pytest.mark.skipif(not native.load_library("align"), reason="no toolchain")
    def test_native_matches_python(self):
        rng = np.random.default_rng(1)
        for trial in range(5):
            nr = int(rng.integers(2, 6))
            ref = "".join(rng.choice(list("ACGT"), size=3 * nr))
            qry = "".join(rng.choice(list("ACGT"), size=int(rng.integers(3, 3 * nr + 4))))
            s1, *_ = align.align_codon(ref, qry, use_native=True)
            s2, *_ = align.align_codon(ref, qry, use_native=False)
            assert abs(s1 - s2) < 1e-9, (ref, qry)
