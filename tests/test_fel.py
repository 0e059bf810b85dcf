"""FEL end-to-end golden test (reference: tests/hbltests/libv3/FEL.wbf)."""

import numpy as np
import pytest

from hyphy_tpu.methods import fel

EXPECTED_POSITIVES = {9, 34, 53, 55, 64, 81, 98, 102, 106, 113, 117, 149, 172}
EXPECTED_NEGATIVES = {
    11, 22, 31, 36, 45, 47, 60, 65, 70, 71, 78, 82, 87, 95, 110, 116, 120,
    123, 125, 129, 130, 132, 133, 136, 164, 166, 176,
}


@pytest.fixture(scope="module")
def fel_result(cd2_path):
    return fel.run(cd2_path)


class TestFELGoldens:
    def test_mg94_loglik(self, fel_result):
        lnl = fel_result.json["fits"]["Global MG94xREV"]["Log Likelihood"]
        assert lnl == pytest.approx(-3467.00, rel=0.001)

    def test_positive_sites(self, fel_result):
        t = fel_result.site_table
        positives = set(np.nonzero((t[:, 4] <= 0.1) & (t[:, 1] > t[:, 0]))[0] + 1)
        assert positives == EXPECTED_POSITIVES

    def test_negative_sites(self, fel_result):
        t = fel_result.site_table
        negatives = set(np.nonzero((t[:, 4] <= 0.1) & (t[:, 1] < t[:, 0]))[0] + 1)
        assert negatives == EXPECTED_NEGATIVES

    def test_positive_lrt_sum(self, fel_result):
        """FEL.wbf:59-62: sum of LRTs over positive sites = 50.33 (5%)."""
        t = fel_result.site_table
        idx = np.array(sorted(EXPECTED_POSITIVES)) - 1
        assert t[idx, 3].sum() == pytest.approx(50.33, rel=0.05)

    def test_negative_lrt_sum(self, fel_result):
        """FEL.wbf:74-77: sum of LRTs over negative sites = 161.69 (5%)."""
        t = fel_result.site_table
        idx = np.array(sorted(EXPECTED_NEGATIVES)) - 1
        assert t[idx, 3].sum() == pytest.approx(161.69, rel=0.05)

    def test_json_schema(self, fel_result):
        j = fel_result.json
        for key in ("analysis", "input", "fits", "MLE", "tested", "data partitions"):
            assert key in j
        assert j["input"]["number of sites"] == 187
        assert j["input"]["number of sequences"] == 10
        headers = [h[0] for h in j["MLE"]["headers"]]
        assert headers[:6] == [
            "alpha", "beta", "alpha=beta", "LRT", "p-value", "Total branch length",
        ]
        assert len(j["MLE"]["content"]["0"]) == 187


class TestResample:
    def test_bootstrap_pvalues(self, tmp_path):
        """FEL --resample (FEL.bf:805-820): bootstrap p-values are valid
        probabilities with the (hits+1)/(N+1) floor, and non-significant
        sites stay non-significant."""
        from hyphy_tpu.utils.synth import random_tree_newick, synthetic_codon_alignment

        aln = synthetic_codon_alignment(6, 20, seed=7)
        fa = tmp_path / "fel_rs.fasta"
        fa.write_text("".join(f">{n}\n{s}\n" for n, s in zip(aln.names, aln.sequences)))
        tr = random_tree_newick(6, seed=7)
        n_reps = 10
        res = fel.run(str(fa), tree=tr, resample=n_reps, srv=True)
        pv = res.site_table[:, 4]
        assert ((pv > 0) & (pv <= 1)).all()
        floor = 1.0 / (n_reps + 1)
        nonconst = pv < 1.0
        # every bootstrap p is a multiple of 1/(N+1)
        mult = pv[nonconst] * (n_reps + 1)
        assert np.allclose(mult, np.round(mult), atol=1e-9)
        assert pv[nonconst].min() >= floor - 1e-12
