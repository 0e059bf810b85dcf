"""FUBAR golden test (reference: tests/hbltests/libv3/FUBAR.wbf)."""

import numpy as np
import pytest

from hyphy_tpu.methods import fubar

EXPECTED_POSITIVES = [7, 9, 34, 55, 56, 64, 81, 113, 117, 126, 141, 149, 172]


@pytest.fixture(scope="module")
def fubar_result(cd2_path):
    return fubar.run(cd2_path)


class TestFUBARGoldens:
    def test_grid_definition(self):
        grid = fubar.alpha_beta_grid(20)
        assert grid.shape == (400, 2)
        one_d = np.unique(grid[:, 0])
        assert one_d[0] == 0.0
        assert 1.0 in one_d
        assert one_d.max() == pytest.approx(50.0, rel=1e-9)

    def test_positive_weight_mass(self, fubar_result):
        """FUBAR.wbf:42-44: posterior mass on beta>alpha grid = 0.4922 (1%)."""
        mass = fubar_result.posterior_weights[
            fubar_result.grid[:, 0] < fubar_result.grid[:, 1]
        ].sum()
        assert mass == pytest.approx(0.4922, rel=0.01)

    def test_positive_sites(self, fubar_result):
        t = fubar_result.site_table
        positives = sorted(np.nonzero(t[:, 4] >= 0.9)[0] + 1)
        assert positives == EXPECTED_POSITIVES

    def test_bayes_factor_sum(self, fubar_result):
        """FUBAR.wbf:76-78: sum of BFs over positive sites = 195.21 (10%)."""
        t = fubar_result.site_table
        idx = np.array(EXPECTED_POSITIVES) - 1
        assert t[idx, 5].sum() == pytest.approx(195.21, rel=0.10)

    def test_posterior_weights_normalized(self, fubar_result):
        assert fubar_result.posterior_weights.sum() == pytest.approx(1.0, abs=1e-8)


class TestFUBARCache:
    def test_cache_roundtrip_and_fingerprint(self, cd2_path, tmp_path):
        """Resume (FUBAR.bf:160-236): the checkpoint written on run 1 must be
        found and reused on run 2 even when the user path lacks '.npz'."""
        cache = str(tmp_path / "fubar.cache")
        r1 = fubar.run(cd2_path, grid_points=5, cache=cache)
        import os

        assert os.path.exists(cache + ".npz")  # normalized save path
        saved = np.load(cache + ".npz")
        assert "fingerprint" in saved.files
        # poison the cached site log-likelihoods: if run 2 resumes (it must),
        # its posterior comes out of the poisoned grid, not a recompute
        poisoned = dict(sll=saved["sll"] * 0.5, grid_points=saved["grid_points"],
                        fingerprint=saved["fingerprint"])
        np.savez(cache + ".npz", **poisoned)
        r2 = fubar.run(cd2_path, grid_points=5, cache=cache)
        assert not np.allclose(r2.posterior_weights, r1.posterior_weights)
        # mismatched grid size must ignore the cache, not crash
        r3 = fubar.run(cd2_path, grid_points=6, cache=cache)
        assert r3.grid.shape[0] == 36
