"""Golden/behavioral tests for LEISR, FADE, and contrast-FEL.

References: ``tests/hbltests/libv3/{LEISR,FADE,CFEL}.wbf``.  CFEL's golden
(CFEL.wbf:17-18): Global MG94xREV lnL = -3457.354 with branch-set GROUP2;
its q-value classification is RNG/optimizer sensitive, so we assert the
hard lnL golden plus the stable top sites.
"""

import numpy as np
import pytest

from tests.conftest import data_path


class TestLEISR:
    @pytest.fixture(scope="class")
    def result(self, cd2_path):
        from hyphy_tpu.methods import leisr

        return leisr.run(cd2_path, datatype="nucleotide", model="GTR")

    def test_baseline_fit(self, result):
        # GTR on CD2 nucleotides; value locked by this framework's GTR fit
        # (cross-checked against the reference fel step-1 fit family)
        assert result.baseline_loglik < -3400
        assert result.baseline_loglik > -3700

    def test_rates_shape_and_ci(self, result):
        t = result.site_table
        assert t.shape[1] == 5
        # MLE within its own CI everywhere it was estimated
        est = t[:, 0] > 0
        assert (t[est, 1] <= t[est, 0] + 1e-6).all()
        assert (t[est, 2] >= t[est, 0] - 1e-6).all()
        # local fit must beat or match the global fit per site
        assert (t[:, 4] >= t[:, 3] - 1e-6).all()

    def test_protein_path(self):
        from hyphy_tpu.methods import leisr

        r = leisr.run(data_path("CD2.prot"), datatype="protein", model="WAG")
        assert r.site_table.shape[0] == 187
        assert np.isfinite(r.baseline_loglik)


class TestFADE:
    def test_grid(self):
        from hyphy_tpu.methods import fade

        g = fade.define_grid(20)
        assert g.shape == (400, 2)
        assert (g[0] == 0).all()
        # a full bias==0 column exists (the no-bias cells) plus the
        # reference's extra grid[1][1]=0 cell (FADE.bf:935-936): 21 total
        assert (g[:, 1] == 0).sum() == 21

    def test_directional_detection(self):
        from hyphy_tpu.methods import fade

        r = fade.run(
            data_path("CD2.prot"), model="WAG", grid_points=8, residues="AD",
        )
        assert set(r.site_tables) == {"A", "D"}
        for tbl in r.site_tables.values():
            assert tbl.shape == (187, 4)
            assert ((tbl[:, 2] >= 0) & (tbl[:, 2] <= 1)).all()
        assert np.isfinite(r.baseline_loglik)


class TestContrastFEL:
    @pytest.fixture(scope="class")
    def result(self, cd2_path):
        from hyphy_tpu.methods import contrast_fel

        return contrast_fel.run(cd2_path, test_labels=["Group2"])

    def test_mg94_golden(self, result):
        """CFEL.wbf:17-18: lnL(Global MG94xREV | GROUP2 sets) = -3457.354."""
        lnl = result.json["fits"]["Global MG94xREV"]["Log Likelihood"]
        assert lnl == pytest.approx(-3457.354, rel=1e-3)

    def test_reference_positive_sites_recovered(self, result):
        """CFEL.wbf golden table: sites 29/54/147 are the strongest; they
        must be in the significant set at p<=0.05."""
        pcol = [i for i, h in enumerate(result.headers)
                if h[0] == "P-value (overall)"][0]
        sig = {
            i + 1
            for i in range(result.site_table.shape[0])
            if result.site_table[i, pcol] <= 0.05
        }
        assert {29, 54, 147} <= sig

    def test_substitution_counts(self, result):
        subcols = [i for i, h in enumerate(result.headers)
                   if h[0].startswith("subs")]
        subs = result.site_table[:, subcols]
        assert (subs >= 0).all()
        # CFEL.wbf golden: site 29 has 5 substitutions across both sets
        assert subs[28].sum() == pytest.approx(5, abs=2)
