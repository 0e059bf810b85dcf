"""BGM tests: network-learning unit behavior + the CD2 golden pipeline
(reference: tests/hbltests/libv3/BGM.wbf — site pairs (6,146) and (7,85)
reported with P[coupled] > 0.5 at min-subs 5)."""

import numpy as np
import pytest

from hyphy_tpu.methods import bgm


class TestScores:
    def test_k2_prefers_true_parent(self):
        rng = np.random.default_rng(0)
        n = 200
        x = rng.integers(0, 2, n)
        y = np.where(rng.uniform(size=n) < 0.9, x, 1 - x)  # strongly coupled
        z = rng.integers(0, 2, n)                           # independent
        data = np.stack([x, y, z], axis=1)
        s_true = bgm.k2_local_score(data, 1, (0,), 2)
        s_empty = bgm.k2_local_score(data, 1, (), 2)
        s_wrong = bgm.k2_local_score(data, 1, (2,), 2)
        assert s_true > s_empty > s_wrong or s_true > max(s_empty, s_wrong)

    def test_bdeu_score_finite(self):
        data = np.random.default_rng(1).integers(0, 2, size=(50, 3))
        s = bgm.k2_local_score(data, 0, (1, 2), 2, prior_sample_size=1.0)
        assert np.isfinite(s)


class TestOrderMCMC:
    def test_recovers_coupled_pair(self):
        rng = np.random.default_rng(2)
        n = 300
        x = rng.integers(0, 2, n)
        y = np.where(rng.uniform(size=n) < 0.92, x, 1 - x)
        z = rng.integers(0, 2, n)
        w = rng.integers(0, 2, n)
        data = np.stack([x, y, z, w], axis=1)
        net = bgm.DiscreteBGM(data, levels=2, max_parents=1)
        edge, trace = net.order_mcmc(steps=4000, burnin=500, samples=50, seed=3)
        coupled = edge[0, 1] + edge[1, 0]
        assert coupled > 0.9, coupled
        for (i, j) in [(0, 2), (0, 3), (2, 3), (1, 2), (1, 3)]:
            assert edge[i, j] + edge[j, i] < 0.4, (i, j, edge[i, j] + edge[j, i])
        assert len(trace) == 50

    def test_substitution_counts(self):
        # 4-node chain: states per node x 3 sites
        states = np.array([
            [0, 1, 2],   # leaf 0
            [0, 1, 2],   # leaf 1
            [1, 1, 2],   # internal (parent of 0,1)
            [1, 1, 2],   # root
        ])
        parent = np.array([2, 2, 3, -1])
        tested = np.ones(3, dtype=bool)
        aa = np.arange(61)  # identity: every state change counts
        counts, sites, branches = bgm.substitution_counts(
            states, parent, tested, amino_of_state=aa, min_subs=1
        )
        # only site 0 has substitutions (leaf0,leaf1 differ from internal)
        assert list(sites) == [0]
        assert counts.sum() == 2


class TestPipeline:
    def test_cd2_golden_pairs(self, cd2_path):
        """BGM.wbf golden: with min-subs 5, pairs (6,146) and (7,85) are
        reported as coupled (P > 0.5); we check the strongest golden pair
        and the output contract."""
        res = bgm.run(
            cd2_path, steps=20000, burnin=2000, samples=100,
            max_parents=1, min_subs=5, seed=1,
        )
        rows = res["MLE"]["content"]["0"]
        assert res["MLE"]["headers"][4][0].startswith("P [Site 1")
        by_pair = {(r[0], r[1]): r for r in rows}
        assert (7, 85) in by_pair
        p_7_85 = by_pair[(7, 85)][4]
        assert p_7_85 > 0.5, p_7_85
        # substitution counts for the golden pair (7, 85): 7, 7, 7
        assert by_pair[(7, 85)][5] == 7
        assert by_pair[(7, 85)][6] == 7
        assert by_pair[(7, 85)][7] == 7
