"""Unit tests for the auxiliary ops: HMM rate variation, linalg, random.

Mirrors the reference's HBLCommands unit tier (SURVEY §4): brute-force /
closed-form golden values on tiny inputs.
"""

import itertools

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from hyphy_tpu.ops import hmm, linalg
from hyphy_tpu.utils import random as hrandom


def _brute_force_hmm(site_ll, T, init):
    """Enumerate all class paths: sum_z init[z0] prod T prod L."""
    C, S = site_ll.shape
    total = 0.0
    for path in itertools.product(range(C), repeat=S):
        p = init[path[0]] * np.exp(site_ll[path[0], 0])
        for i in range(1, S):
            p *= T[path[i - 1], path[i]] * np.exp(site_ll[path[i], i])
        total += p
    return np.log(total)


class TestHMM:
    def setup_method(self):
        rng = np.random.default_rng(3)
        self.C, self.S = 3, 6
        self.site_ll = np.log(rng.uniform(0.1, 1.0, size=(self.C, self.S)))
        lam = 0.3
        self.T = np.asarray(hmm.uniform_switching_matrix(self.C, lam))
        self.init = np.full(self.C, 1.0 / self.C)
        self.dm = np.arange(self.S, dtype=np.int32)

    def test_switching_matrix_rows(self):
        assert np.allclose(self.T.sum(1), 1.0)
        assert np.allclose(np.diag(self.T), 0.7)

    def test_forward_matches_enumeration(self):
        got = float(hmm.forward_log_likelihood(
            jnp.asarray(self.site_ll), self.dm, jnp.asarray(self.T),
            jnp.asarray(self.init)))
        want = _brute_force_hmm(self.site_ll, self.T, self.init)
        assert abs(got - want) < 1e-9

    def test_forward_pattern_expansion(self):
        # collapse duplicate columns into patterns; map must re-expand
        patt = self.site_ll[:, :4]
        dm = np.array([0, 1, 2, 3, 1, 2], dtype=np.int32)
        expanded = patt[:, dm]
        a = float(hmm.forward_log_likelihood(
            jnp.asarray(patt), dm, jnp.asarray(self.T), jnp.asarray(self.init)))
        b = float(hmm.forward_log_likelihood(
            jnp.asarray(expanded), np.arange(6, dtype=np.int32),
            jnp.asarray(self.T), jnp.asarray(self.init)))
        assert abs(a - b) < 1e-9

    def test_viterbi_matches_enumeration(self):
        path, score = hmm.viterbi_path(
            jnp.asarray(self.site_ll), self.dm, jnp.asarray(self.T),
            jnp.asarray(self.init))
        best, best_p = None, -np.inf
        for cand in itertools.product(range(self.C), repeat=self.S):
            p = np.log(self.init[cand[0]]) + self.site_ll[cand[0], 0]
            for i in range(1, self.S):
                p += np.log(self.T[cand[i - 1], cand[i]]) + self.site_ll[cand[i], i]
            if p > best_p:
                best, best_p = cand, p
        assert tuple(path) == best
        assert abs(score - best_p) < 1e-9

    def test_posteriors_match_enumeration(self):
        post = np.asarray(hmm.posterior_class_probabilities(
            jnp.asarray(self.site_ll), self.dm, jnp.asarray(self.T),
            jnp.asarray(self.init)))
        assert post.shape == (self.S, self.C)
        assert np.allclose(post.sum(1), 1.0, atol=1e-9)
        # brute-force marginal at site 2
        num = np.zeros(self.C)
        for cand in itertools.product(range(self.C), repeat=self.S):
            p = self.init[cand[0]] * np.exp(self.site_ll[cand[0], 0])
            for i in range(1, self.S):
                p *= self.T[cand[i - 1], cand[i]] * np.exp(self.site_ll[cand[i], i])
            num[cand[2]] += p
        assert np.allclose(post[2], num / num.sum(), atol=1e-9)


class TestLinalg:
    def test_eigensystem_symmetric(self):
        a = np.array([[2.0, 1.0], [1.0, 2.0]])
        w, v = linalg.eigensystem(a)
        assert np.allclose(sorted(np.asarray(w)), [1.0, 3.0])
        assert np.allclose(np.asarray(v) @ np.diag(np.asarray(w)) @ np.asarray(v).T, a)

    def test_inverse_and_lu(self):
        rng = np.random.default_rng(0)
        a = rng.normal(size=(5, 5)) + 5 * np.eye(5)
        assert np.allclose(np.asarray(linalg.inverse(a)) @ a, np.eye(5), atol=1e-9)
        lu = linalg.lu_decompose(a)
        b = rng.normal(size=5)
        x = np.asarray(linalg.lu_solve(lu, b))
        assert np.allclose(a @ x, b, atol=1e-9)

    def test_simplex_solve(self):
        # max x + y s.t. x + 2y <= 4, 3x + y <= 6 -> optimum at (1.6, 1.2)
        val, x = linalg.simplex_solve(
            [1.0, 1.0],
            a_ub=[[1.0, 2.0], [3.0, 1.0]], b_ub=[4.0, 6.0],
            maximize=True,
        )
        assert abs(val - 2.8) < 1e-9
        assert np.allclose(x, [1.6, 1.2], atol=1e-9)

    def test_simplex_infeasible(self):
        assert linalg.simplex_solve(
            [1.0], a_ub=[[1.0], [-1.0]], b_ub=[1.0, -2.0]
        ) is None

    def test_fisher_exact(self):
        p = linalg.fisher_exact(np.array([[1, 9], [11, 3]]))
        assert abs(p - 0.0027594561852200836) < 1e-12


class TestRandom:
    def test_lhs_stratification(self):
        s = hrandom.latin_hypercube(10, np.zeros(3), np.ones(3), seed=1)
        assert s.shape == (10, 3)
        # each dimension has exactly one sample per decile
        for d in range(3):
            assert sorted(np.floor(s[:, d] * 10).astype(int)) == list(range(10))

    def test_dirichlet_and_multinomial(self):
        d = hrandom.dirichlet(np.ones(4), seed=2)
        assert abs(d.sum() - 1.0) < 1e-12
        m = hrandom.multinomial(100, np.ones(4) / 4, seed=2)
        assert m.sum() == 100

    def test_wishart_mean(self):
        scale = np.array([[1.0, 0.3], [0.3, 2.0]])
        draws = np.mean(
            [hrandom.wishart(50, scale, seed=s) for s in range(300)], axis=0
        )
        assert np.allclose(draws / 50, scale, rtol=0.1)

    def test_gaussian_shape(self):
        g = hrandom.gaussian(np.zeros(3), np.eye(3), size=7, seed=4)
        assert g.shape == (7, 3)


class TestSharedTaylorPropagators:
    """fp32 tolerance of the TPU expm path vs the fp64 spectral path on a
    reversible codon generator (the bench's accuracy contract; reference
    fp32 analogue: ExponentiateSingle, matrix.cpp:9974)."""

    @pytest.fixture(scope="class")
    def generator(self):
        import jax.numpy as jnp

        from hyphy_tpu.data.genetic_code import GeneticCode
        from hyphy_tpu.models import frequencies as freq_mod
        from hyphy_tpu.models.base import fill_diagonal_from_rows
        from hyphy_tpu.models.codon import MG94xREVPartitionedOmega
        from hyphy_tpu.data.filter import DataFilter
        from hyphy_tpu.utils.synth import random_tree_newick, synthetic_codon_alignment

        gc = GeneticCode("Universal")
        aln = synthetic_codon_alignment(8, 40, seed=2)
        filt = DataFilter.from_alignment(aln, "codon", genetic_code=gc)
        corners, codon_freqs = freq_mod.f3x4(filt, gc)
        model = MG94xREVPartitionedOmega(
            gc, corners, codon_freqs, nuc_lengths=np.ones(13) * 0.1,
            branch_groups=np.zeros(13, dtype=np.int32), n_groups=1,
        )
        import jax.numpy as jnp
        params = {k: s.initial() for k, s in model.parameter_specs(13).items()}
        qs, qn = model.basis_matrices(params)
        q = np.asarray(fill_diagonal_from_rows(qs + 0.3 * qn))
        pi = np.asarray(model.frequencies)
        return q, pi

    def test_fp32_vs_fp64_spectral(self, generator):
        import jax.numpy as jnp

        from hyphy_tpu.ops import expm as expm_ops

        q, pi = generator
        rng = np.random.default_rng(0)
        t = np.concatenate([[1e-5, 1e-3], rng.random(24) * 2.0, [5.0, 20.0]])
        p32 = np.asarray(expm_ops.shared_taylor_propagators(
            jnp.asarray(q, jnp.float32), jnp.asarray(t, jnp.float32)
        ), dtype=np.float64)
        left, lam, right = expm_ops.reversible_spectral(
            jnp.asarray(q, jnp.float64), jnp.asarray(pi, jnp.float64)
        )
        p64 = np.asarray(expm_ops.spectral_propagators(
            left, lam, right, jnp.asarray(t, jnp.float64)
        ))
        err = np.abs(p32 - p64).max()
        assert err < 5e-5, f"fp32 propagator error {err:.2e}"
        assert np.abs(p32.sum(-1) - 1.0).max() < 1e-5

    def test_fp64_matches_scipy(self, generator):
        import jax.numpy as jnp
        import scipy.linalg as sla

        from hyphy_tpu.ops import expm as expm_ops

        q, _ = generator
        t = np.array([0.01, 0.7, 3.0, 30.0])
        p = np.asarray(expm_ops.shared_taylor_propagators(
            jnp.asarray(q, jnp.float64), jnp.asarray(t, jnp.float64)
        ))
        ref = np.stack([sla.expm(q * tt) for tt in t])
        assert np.abs(p - ref).max() < 1e-12
