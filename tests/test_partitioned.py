"""Multi-partition golden tests (reference: SLAC-partitioned.wbf;
data/partitioned.nex = 13 sequences x 897 codons, 5 CHARSET spans with
per-partition trees)."""

import numpy as np
import pytest

from hyphy_tpu.methods import common
from tests.conftest import data_path


@pytest.fixture(scope="module")
def part_path() -> str:
    return data_path("partitioned.nex")


class TestPartitionLoading:
    def test_charsets_and_trees(self, part_path):
        md = common.load_codon_data_multi(part_path, "Universal", None, "Internal")
        assert md.n_partitions == 5
        # SPAN_1..5 site counts from the reference FEL JSON coverage arrays
        assert [p.codon_filter.n_units for p in md.parts] == [196, 164, 137, 67, 333]
        # each partition carries its own tree topology
        newicks = {p.tree.to_newick() for p in md.parts}
        assert len(newicks) == 5


@pytest.mark.slow
class TestPartitionedFits:
    def test_joint_gtr_and_stage1_mg94(self, part_path):
        """Joint GTR lnL matches the reference exactly; the stage-1
        proportional MG94 fit (thetas fixed at GTR MLEs — the fit SLAC
        reports) reproduces SLAC-partitioned.wbf's -5453.42 (0.1%)."""
        md = common.load_codon_data_multi(part_path, "Universal", None, "Internal")
        gtr = common.fit_gtr_multi(md)
        assert gtr.loglik == pytest.approx(-5702.4818, abs=0.05)
        md, gtr = common.kill_zero_branches_multi(md, gtr, "Internal")
        mg = common.fit_partitioned_mg94_multi(md, gtr, refit_lengths=False)
        assert mg.loglik == pytest.approx(-5453.42, rel=0.001)

    def test_fel_partitioned_vs_reference_json(self, part_path):
        """Per-partition FEL vs the reference's own partitioned.nex.FEL.json
        (shipped in tests/hbltests/libv3/data): joint MG94 lnL -5440.49
        (0.1%) and near-exact per-partition significant-site sets (a
        measured run recovers 113/115 reference sites with no extras;
        the 2 misses sit exactly at the p = 0.1 boundary)."""
        import json as _json

        from hyphy_tpu.methods import fel

        res = fel.run(part_path, branches="All")
        j = res.json
        assert j["fits"]["Global MG94xREV"]["Log Likelihood"] == pytest.approx(
            -5440.49, rel=0.001
        )
        ref = _json.load(open(
            "/root/reference/tests/hbltests/libv3/data/partitioned.nex.FEL.json"
        ))
        missed = extra = total_ref = 0
        for p in range(5):
            ours = np.asarray(j["MLE"]["content"][str(p)])
            theirs = np.asarray(ref["MLE"]["content"][str(p)])
            sig_o = set(np.nonzero(ours[:, 4] <= 0.1)[0])
            sig_t = set(np.nonzero(theirs[:, 4] <= 0.1)[0])
            total_ref += len(sig_t)
            missed += len(sig_t - sig_o)
            extra += len(sig_o - sig_t)
        assert total_ref > 100
        assert missed <= 4 and extra <= 4

    def test_slac_partitioned_golden(self, part_path):
        """SLAC-partitioned.wbf: joint MG94 lnL -5453.42; zero positive and
        negative sites at p <= 0.1 in every partition."""
        from hyphy_tpu.methods import slac

        res = slac.run(part_path, branches="Internal")
        j = res.json
        assert j["fits"]["Global MG94xREV"]["Log Likelihood"] == pytest.approx(
            -5453.42, rel=0.001
        )
        content = j["MLE"]["content"]
        assert len(content) == 5
        for p in range(5):
            av = np.asarray(content[str(p)]["by-site"]["AVERAGED"])
            assert (av[:, 8] <= 0.1).sum() == 0     # positive sites
            assert (av[:, 9] <= 0.1).sum() == 0     # negative sites
