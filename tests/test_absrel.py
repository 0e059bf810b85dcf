"""aBSREL golden test (reference: tests/hbltests/libv3/ABSREL.wbf:
CD2.nex, branches=Internal)."""

import pytest

from hyphy_tpu.methods import absrel


@pytest.fixture(scope="module")
def absrel_result(cd2_path):
    return absrel.run(cd2_path, branches="Internal")


class TestABSRELGoldens:
    def test_full_model_loglik(self, absrel_result):
        """ABSREL.wbf:11-13: full adaptive lnL -3415.02 (0.1%)."""
        assert absrel_result.full_lnl == pytest.approx(-3415.02, rel=0.001)

    def test_test_counts(self, absrel_result):
        """ABSREL.wbf:14-19: 2 positives of 6 tested."""
        j = absrel_result.json["test results"]
        assert j["tested"] == 6
        assert j["positive test results"] == 2

    def test_positive_branches(self, absrel_result):
        assert sorted(absrel_result.positive_branches) == ["Node2", "Node8"]

    def test_lrt_sum(self, absrel_result):
        """ABSREL.wbf: cumulative LRT over positives = 15.67 (5%)."""
        total = sum(absrel_result.branch_lrt[b] for b in absrel_result.positive_branches)
        assert total == pytest.approx(15.67, rel=0.05)
