"""RELAX golden test (reference: tests/hbltests/libv3/RELAX.wbf:
CD2.nex, test=GROUP1, reference=GROUP2, rates=2, models=All)."""

import pytest

from hyphy_tpu.methods import relax


@pytest.fixture(scope="module")
def relax_result(cd2_path):
    return relax.run(cd2_path, test="Group1", reference="Group2", rate_classes=2)


class TestRELAXGoldens:
    def test_general_descriptive_loglik(self, relax_result):
        """RELAX.wbf:24-26: general descriptive lnL -3420.63 (0.1%)."""
        assert relax_result.fits["General descriptive"] == pytest.approx(
            -3420.63, rel=0.001
        )

    def test_k_parameter(self, relax_result):
        """RELAX.wbf:29-33: K ~ 0.2 (20%)."""
        assert relax_result.k == pytest.approx(0.2, rel=0.35)

    def test_p_value(self, relax_result):
        """RELAX.wbf:27: p ~ 0.14 (20%)."""
        assert relax_result.p_value == pytest.approx(0.14, rel=0.35)

    def test_alternative_scaling(self, relax_result):
        """Test omegas = reference omegas ^ K with equal weights."""
        d = relax_result.distributions["alternative"]
        for i in range(2):
            t, r = d["Test"][str(i)], d["Reference"][str(i)]
            assert t["proportion"] == pytest.approx(r["proportion"], abs=1e-10)
            assert t["omega"] == pytest.approx(r["omega"] ** relax_result.k, rel=1e-6)

    def test_partitioned_descriptive_differs(self, relax_result):
        d = relax_result.distributions["partitioned descriptive"]
        props_t = [d["Test"][str(i)]["proportion"] for i in range(2)]
        props_r = [d["Reference"][str(i)]["proportion"] for i in range(2)]
        assert props_t != props_r
