"""SLAC golden test (reference: tests/hbltests/libv3/SLAC.wbf + a direct
run of the reference binary on CD2.nex)."""

import numpy as np
import pytest

from hyphy_tpu.methods import slac

# SLAC.wbf:22-24 asserts this subset; the reference binary's own run also
# flags site 87 — ours matches the binary exactly
EXPECTED_NEGATIVES = {47, 65, 78, 82, 87, 110, 116, 123, 130, 164, 166}


@pytest.fixture(scope="module")
def slac_result(cd2_path):
    return slac.run(cd2_path)


class TestSLACGoldens:
    def test_mg94_loglik(self, slac_result):
        """SLAC.wbf:13: lnL -3467.319 (0.1% tolerance; we find -3467.05,
        a slightly better optimum of the same 7-parameter model)."""
        lnl = slac_result.json["fits"]["Global MG94xREV"]["Log Likelihood"]
        assert lnl == pytest.approx(-3467.319, rel=0.001)

    def test_no_positive_sites(self, slac_result):
        av = slac_result.by_site["AVERAGED"]
        assert (av[:, 8] <= 0.1).sum() == 0

    def test_negative_sites(self, slac_result):
        av = slac_result.by_site["AVERAGED"]
        negatives = set(np.nonzero(av[:, 9] <= 0.1)[0] + 1)
        assert negatives == EXPECTED_NEGATIVES

    def test_counts_sane(self, slac_result):
        av = slac_result.by_site["AVERAGED"]
        # expected sites per codon <= 3 nucleotide positions (less with
        # missing data; reference run ranges 0.26..3.0, mean ~2.8)
        total = av[:, 0] + av[:, 1]
        assert total.max() <= 3.0 + 1e-9
        assert 2.0 < total.mean() < 3.0
        assert np.isfinite(av).all()

    def test_ancestor_states_resolved(self, slac_result):
        states = slac_result.ancestor_states
        # most ancestral states resolved; all within the state space
        assert (states < 61).all()
        internal = states[slac_result.data.tree.n_leaves :]
        assert (internal >= 0).mean() > 0.95


class TestAncestralSampling:
    def test_samples_bracket_joint_counts(self, tmp_path):
        """slac.run(samples=N): sampled-count quantile tables exist, are
        ordered (2.5% <= median <= 97.5%), and the JSON carries the
        reference's keys (SLAC.bf:107-109)."""
        from hyphy_tpu.utils.synth import random_tree_newick, synthetic_codon_alignment

        aln = synthetic_codon_alignment(6, 40, seed=9)
        fa = tmp_path / "slac_samp.fasta"
        fa.write_text("".join(f">{n}\n{s}\n" for n, s in zip(aln.names, aln.sequences)))
        res = slac.run(str(fa), tree=random_tree_newick(6, seed=9), samples=12)
        j = res.json
        for key in ("sample-median", "sample-2.5", "sample-97.5"):
            assert key in j, key
        med = np.asarray(j["sample-median"]["0"]["by-site"]["RESOLVED"])
        lo = np.asarray(j["sample-2.5"]["0"]["by-site"]["RESOLVED"])
        hi = np.asarray(j["sample-97.5"]["0"]["by-site"]["RESOLVED"])
        assert med.shape == lo.shape == hi.shape
        # quantile ordering on the count columns
        assert (lo <= med + 1e-9).all() and (med <= hi + 1e-9).all()
