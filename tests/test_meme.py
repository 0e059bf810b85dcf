"""MEME golden test (reference: tests/hbltests/libv3/MEME.wbf)."""

import numpy as np
import pytest

from hyphy_tpu.methods import meme

EXPECTED_POSITIVES = [43, 67, 76, 98, 113, 117, 149]


@pytest.fixture(scope="module")
def meme_result(cd2_path):
    return meme.run(cd2_path)


class TestMEMEGoldens:
    def test_mg94_loglik(self, meme_result):
        lnl = meme_result.json["fits"]["Global MG94xREV"]["Log Likelihood"]
        assert lnl == pytest.approx(-3467.00, rel=0.001)

    def test_positive_sites(self, meme_result):
        t = meme_result.site_table
        positives = sorted(np.nonzero(t[:, 6] <= 0.05)[0] + 1)
        assert positives == EXPECTED_POSITIVES

    def test_lrt_sum(self, meme_result):
        """MEME.wbf: cumulative LRT over positives = 41.798 (5%)."""
        t = meme_result.site_table
        idx = np.array(EXPECTED_POSITIVES) - 1
        assert t[idx, 5].sum() == pytest.approx(41.798, rel=0.05)

    def test_branch_count_sum(self, meme_result):
        """MEME.wbf: total # branches with EBF >= 100 over positives = 6."""
        t = meme_result.site_table
        idx = np.array(EXPECTED_POSITIVES) - 1
        assert t[idx, 7].sum() == 6

    def test_meme_dominates_fel(self, meme_result):
        t = meme_result.site_table
        assert (t[:, 9] >= t[:, 10] - 1e-6).all()


class TestMEMEGroup1Golden:
    """MEME-partitioned.wbf: CD2.nex with --branches GROUP1."""

    @pytest.fixture(scope="class")
    def g1(self, cd2_path):
        return meme.run(cd2_path, branches="Group1")

    def test_mg94_loglik(self, g1):
        """MEME-partitioned.wbf:23-25: Global MG94xREV lnL -3466.57 (0.1%)."""
        lnl = g1.json["fits"]["Global MG94xREV"]["Log Likelihood"]
        assert lnl == pytest.approx(-3466.57, rel=0.001)

    def test_positive_sites(self, g1):
        """MEME-partitioned.wbf:44: positives at p <= 0.1 = {34,98,142,175}."""
        t = g1.site_table
        positives = sorted(np.nonzero(t[:, 6] <= 0.1)[0] + 1)
        assert positives == [34, 98, 142, 175]

    def test_branch_count_sum(self, g1):
        """MEME-partitioned.wbf:96: total # branches with high EBF = 3."""
        t = g1.site_table
        idx = np.array([34, 98, 142, 175]) - 1
        assert t[idx, 7].sum() == 3
