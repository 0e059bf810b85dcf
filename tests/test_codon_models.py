"""Codon model parity: CF3x4, MG94xREV staged fits vs reference goldens."""

import numpy as np
import pytest

from hyphy_tpu.data.filter import DataFilter
from hyphy_tpu.data.alignment import read_alignment
from hyphy_tpu.data.genetic_code import GeneticCode
from hyphy_tpu.methods import common
from hyphy_tpu.models import frequencies as freq_mod


@pytest.fixture(scope="module")
def cd2_loaded(cd2_path):
    return common.load_codon_data(cd2_path)


@pytest.fixture(scope="module")
def cd2_gtr(cd2_loaded):
    return common.fit_gtr(cd2_loaded)


class TestCF3x4:
    def test_codon_freqs_normalized(self, cd2_loaded):
        gc = cd2_loaded.genetic_code
        corners, codon_freqs = freq_mod.cf3x4(cd2_loaded.codon_filter, gc)
        assert codon_freqs.shape == (61,)
        np.testing.assert_allclose(codon_freqs.sum(), 1.0, atol=1e-10)
        np.testing.assert_allclose(corners.sum(axis=0), 1.0, atol=1e-8)

    def test_f3x4(self, cd2_loaded):
        gc = cd2_loaded.genetic_code
        corners, codon_freqs = freq_mod.f3x4(cd2_loaded.codon_filter, gc)
        np.testing.assert_allclose(codon_freqs.sum(), 1.0, atol=1e-10)


class TestStagedFits:
    def test_gtr_golden(self, cd2_gtr):
        # reference binary: -3532.3247 (we find a slightly better optimum)
        assert cd2_gtr.loglik == pytest.approx(-3532.32, abs=0.05)

    def test_mg94_golden(self, cd2_loaded, cd2_gtr):
        """FEL.wbf:21-23 asserts Global MG94xREV lnL = -3467.00 (0.1%)."""
        mg = common.fit_partitioned_mg94(cd2_loaded, cd2_gtr)
        assert mg.loglik == pytest.approx(-3467.00, rel=0.001)
        # reference binary reports omega ~1.008 on this data
        assert mg.omegas[0] == pytest.approx(1.0, abs=0.05)
        # tree length per nucleotide site (reference convention: /3)
        assert mg.branch_lengths.sum() == pytest.approx(5.17 / 3.0, rel=0.02)
