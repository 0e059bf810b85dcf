"""Engine: tree parsing, expm, pruning, likelihood, optimizer."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyphy_tpu.data.alignment import Alignment, read_alignment
from hyphy_tpu.data.filter import DataFilter
from hyphy_tpu.likelihood import LikelihoodFunction, Partition
from hyphy_tpu.models.dna import GTR, HKY85, JC69
from hyphy_tpu.ops import expm as expm_ops
from hyphy_tpu.ops import pruning
from hyphy_tpu.tree.topology import Tree


class TestTree:
    def test_parse_names_and_levels(self, cd2_path):
        aln = read_alignment(cd2_path)
        tree = Tree.from_newick(aln.trees["tree"])
        assert tree.n_leaves == 10
        # reference numbering: unnamed internal node k = preorder index over
        # all nodes incl. leaves (verified vs reference JSON on CD2)
        assert set(tree.names[tree.n_leaves :]) == {
            "Node0", "Node1", "Node2", "Node3", "Node8", "Node9", "Node12"
        }
        levels = tree.levels()
        assert sum(len(l) for l in levels) == tree.n_internal
        # children of a level-L node are all in levels < L
        seen = set(range(tree.n_leaves))
        for lv in levels:
            for nd in lv:
                assert all(c in seen for c in tree.children[nd])
            seen.update(int(x) for x in lv)

    def test_labels(self, cd2_path):
        aln = read_alignment(cd2_path)
        tree = Tree.from_newick(aln.trees["tree"])
        mask = tree.select_branches("Group1")
        names = {tree.names[i] for i in np.nonzero(mask)[0]}
        assert names == {"RhMonkey", "Human", "Chimp", "Node12"}

    def test_branch_lengths_roundtrip(self):
        tree = Tree.from_newick("((a:0.1,b:0.2)n:0.3,c:0.4)")
        assert tree.input_lengths[0] == pytest.approx(0.1)
        out = tree.to_newick(tree.input_lengths)
        tree2 = Tree.from_newick(out)
        np.testing.assert_allclose(
            tree2.input_lengths[:-1], tree.input_lengths[:-1]
        )


class TestExpm:
    def test_matches_scipy(self):
        import scipy.linalg

        rng = np.random.default_rng(0)
        for scale in (0.01, 1.0, 40.0):
            a = rng.normal(size=(4, 4)) * scale
            got = np.asarray(expm_ops.expm(jnp.asarray(a)))
            want = scipy.linalg.expm(a)
            np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)

    def test_batched(self):
        import scipy.linalg

        rng = np.random.default_rng(1)
        a = rng.normal(size=(5, 6, 6))
        got = np.asarray(expm_ops.expm(jnp.asarray(a)))
        for i in range(5):
            np.testing.assert_allclose(
                got[i], scipy.linalg.expm(a[i]), rtol=1e-9, atol=1e-11
            )

    def test_reversible_spectral_matches_expm(self):
        rng = np.random.default_rng(2)
        pi = rng.dirichlet(np.ones(4))
        r = np.abs(rng.normal(size=(4, 4)))
        r = (r + r.T) / 2
        q = r * pi[None, :]
        np.fill_diagonal(q, 0)
        np.fill_diagonal(q, -q.sum(axis=1))
        left, lam, right = expm_ops.reversible_spectral(jnp.asarray(q), jnp.asarray(pi))
        t = jnp.asarray([0.05, 0.5, 2.0])
        p_spec = np.asarray(expm_ops.spectral_propagators(left, lam, right, t))
        p_tay = np.asarray(expm_ops.transition_matrix(jnp.asarray(q)[None], t))
        np.testing.assert_allclose(p_spec, p_tay, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(p_spec.sum(-1), 1.0, atol=1e-13)


class TestPruning:
    def test_jc_two_leaves_analytic(self):
        aln = Alignment(["A", "B"], ["ACGTAC", "ACGTAA"])
        filt = DataFilter.from_alignment(aln, "nucleotide")
        tree = Tree.from_newick("(A:0.1,B:0.2)", leaf_order=filt.names)
        lf = LikelihoodFunction([Partition(filt, tree, JC69())])
        t = np.zeros(tree.n_branches)
        t[0], t[1] = 0.1, 0.2
        ll = float(lf.loglik({"t": jnp.asarray(t)}))
        p_same = 0.25 + 0.75 * math.exp(-0.3)
        p_diff = 0.25 - 0.25 * math.exp(-0.3)
        expected = 5 * math.log(0.25 * p_same) + math.log(0.25 * p_diff)
        assert ll == pytest.approx(expected, abs=1e-10)

    def test_scaling_long_tree(self):
        """Deep caterpillar tree: per-level rescaling must prevent
        underflow (reference: 2^64 scalers, tree.cpp:126)."""
        n = 60
        names = [f"t{i}" for i in range(n)]
        nwk = names[0]
        for nm in names[1:]:
            nwk = f"({nwk}:0.02,{nm}:0.02)"
        aln = Alignment(names, ["ACGT" * 3] * n)
        filt = DataFilter.from_alignment(aln, "nucleotide")
        tree = Tree.from_newick(nwk, leaf_order=filt.names)
        lf = LikelihoodFunction([Partition(filt, tree, JC69())])
        t = np.full(tree.n_branches, 0.02)
        ll = float(lf.loglik({"t": jnp.asarray(t)}))
        assert np.isfinite(ll)

    def test_mixture_reduces_to_single_class(self):
        aln = Alignment(["A", "B", "C"], ["ACGTT", "ACGTA", "AAGTA"])
        filt = DataFilter.from_alignment(aln, "nucleotide")
        tree = Tree.from_newick("((A:0.1,B:0.2):0.05,C:0.3)", leaf_order=filt.names)
        data = pruning.build_pruning_data(tree)
        model = JC69()
        t = jnp.asarray([0.1, 0.2, 0.3, 0.05])
        out = model.build({"t": t}, tree.n_branches)
        lp = jnp.asarray(filt.leaf_partials())
        single = pruning.site_log_likelihoods(
            out.p_matrices, lp, out.root_freqs, data
        )
        mixed = pruning.mixture_site_log_likelihoods(
            jnp.stack([out.p_matrices, out.p_matrices]),
            jnp.asarray([0.4, 0.6]),
            lp,
            out.root_freqs,
            data,
        )
        np.testing.assert_allclose(np.asarray(mixed), np.asarray(single), rtol=1e-12)


class TestUncertainty:
    """covariance_matrix / profile_ci (reference CovarianceMatrix,
    likefunc.cpp:6535: Hessian mode and profile-likelihood mode)."""

    @pytest.fixture(scope="class")
    def small_fit(self):
        aln = Alignment(
            ["A", "B", "C"], ["ACGTTACGGT" * 4, "ACGTAACGGT" * 4, "AAGTAACGCT" * 4]
        )
        filt = DataFilter.from_alignment(aln, "nucleotide")
        tree = Tree.from_newick("((A:0.1,B:0.2):0.05,C:0.3)", leaf_order=filt.names)
        lf = LikelihoodFunction([Partition(filt, tree, JC69())])
        return lf, lf.fit()

    def test_covariance_matrix(self, small_fit):
        lf, res = small_fit
        cov, labels = lf.covariance_matrix(res.params)
        n = len(labels)
        assert cov.shape == (n, n)
        assert n == lf.partitions[0].tree.n_branches
        # symmetric PSD-ish; interior-MLE branch variances are positive
        np.testing.assert_allclose(cov, cov.T, atol=1e-10)
        t_hat = np.asarray(res.params["t"])
        for j in range(n):
            if t_hat[j] > 1e-4:  # interior of the bound
                assert cov[j, j] > 0

    def test_profile_ci_brackets_mle(self, small_fit):
        lf, res = small_fit
        # profile the first branch length (an interior MLE)
        t_hat = float(np.asarray(res.params["t"])[0])
        params = dict(res.params)
        # scalarize: profile_ci works on scalar keys, so expose t[0] as one
        lo, hi = lf.profile_ci(params, "t", res.loglik) if np.ndim(
            params["t"]
        ) == 0 else _vector_profile_ci(lf, params, "t", 0, res.loglik)
        assert lo <= t_hat <= hi
        assert hi > lo


def _vector_profile_ci(lf, params, key, index, lnl_mle, level=0.95):
    """Profile CI for one component of a vector parameter by wrapping the
    LF objective (same bisection scheme as LikelihoodFunction.profile_ci)."""
    from scipy.stats import chi2 as _c2

    spec = lf.specs[key]
    drop = float(_c2.ppf(level, 1)) / 2.0
    target = lnl_mle - drop
    mle = float(np.asarray(params[key])[index])

    def lnl_at(v):
        p = dict(params)
        p[key] = jnp.asarray(np.asarray(params[key]).copy()).at[index].set(v)
        return float(lf.loglik(p))

    def search(side):
        bound = spec.upper if side > 0 else spec.lower
        far = mle
        for _ in range(40):
            far = float(np.clip(far + side * max(abs(far), 1e-3), spec.lower, spec.upper))
            if lnl_at(far) < target or far == bound:
                break
        if lnl_at(far) > target:
            return far
        near = mle
        for _ in range(60):
            mid = 0.5 * (near + far)
            if lnl_at(mid) > target:
                near = mid
            else:
                far = mid
        return 0.5 * (near + far)

    return search(-1), search(+1)


class TestFit:
    def test_gtr_fit_cd2_improves(self, cd2_path):
        aln = read_alignment(cd2_path)
        filt = DataFilter.from_alignment(aln, "nucleotide")
        tree = Tree.from_newick(aln.trees["tree"], leaf_order=filt.names)
        freqs = filt.harvest_frequencies(1, 1, False)[:, 0]
        lf = LikelihoodFunction([Partition(filt, tree, GTR(freqs))])
        res = lf.fit()
        assert res.loglik > -3540.0  # converged GTR fit is ~ -3532.3
        assert res.n_free_parameters == 5 + tree.n_branches
