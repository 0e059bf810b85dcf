"""SCFG tests: inside vs brute-force enumeration, outside consistency,
CYK, EM monotonicity (reference: src/new/scfg.cpp semantics)."""

import itertools

import numpy as np
import pytest

from hyphy_tpu.scfg import SCFG


def brute_force_prob(g: SCFG, tokens):
    """Total probability of all parses by recursive enumeration."""
    n = g.n_nonterminals

    memo = {}

    def prob(a, i, j):
        if (a, i, j) in memo:
            return memo[(a, i, j)]
        if j - i == 1:
            p = g.emission[a, tokens[i]]
        else:
            p = 0.0
            for k in range(i + 1, j):
                for b in range(n):
                    for c in range(n):
                        r = g.binary[a, b, c]
                        if r > 0:
                            p += r * prob(b, i, k) * prob(c, k, j)
        memo[(a, i, j)] = p
        return p

    return prob(0, 0, len(tokens))


def toy_grammar():
    """S -> S S | a | b with given probabilities (2 terminals)."""
    binary = np.zeros((2, 2, 2))
    emission = np.zeros((2, 2))
    binary[0, 0, 0] = 0.3
    binary[0, 1, 1] = 0.1
    emission[0] = [0.4, 0.2]
    binary[1, 1, 1] = 0.2
    emission[1] = [0.3, 0.5]
    return SCFG(binary, emission)


class TestInside:
    def test_matches_enumeration(self):
        g = toy_grammar()
        for tokens in [(0,), (0, 1), (1, 0, 0), (0, 1, 1, 0)]:
            want = np.log(brute_force_prob(g, tokens))
            got = g.log_likelihood(tokens)
            assert abs(got - want) < 1e-10, tokens

    def test_total_probability_sums_to_one(self):
        # over all strings of length <= 3 plus continuation mass, inside
        # probs of a proper grammar are a distribution; check length-2 slice
        g = toy_grammar()
        total = sum(
            np.exp(g.log_likelihood(s))
            for L in (1, 2, 3, 4)
            for s in itertools.product(range(2), repeat=L)
        )
        assert total < 1.0 + 1e-9


class TestOutside:
    def test_inside_outside_identity(self):
        # sum_a alpha(a,i,1) * beta(a,i,1) == P(string) for every position
        g = toy_grammar()
        tokens = (0, 1, 0)
        beta = g.inside(tokens)
        alpha = g.outside(tokens, beta)
        ll = beta[len(tokens) - 1, 0, 0]
        for i in range(len(tokens)):
            s = np.logaddexp.reduce(alpha[0, i, :] + beta[0, i, :])
            assert abs(s - ll) < 1e-9, i


class TestCYK:
    def test_best_parse(self):
        g = toy_grammar()
        score, tree = g.cyk((0, 1))
        assert np.isfinite(score)
        a, i, l, kids = tree
        assert (a, i, l) == (0, 0, 2)
        assert len(kids) == 2
        # best parse log-prob <= total log-prob
        assert score <= g.log_likelihood((0, 1)) + 1e-12


class TestEM:
    def test_em_increases_likelihood(self):
        g = toy_grammar()
        corpus = [(0, 1), (0, 0, 1), (1, 0), (0, 1, 1, 0)]
        fitted, trace = g.fit_em(corpus, max_iterations=25)
        assert all(b >= a - 1e-9 for a, b in zip(trace, trace[1:])), trace
        assert trace[-1] > trace[0]

    def test_structural_zeros_preserved(self):
        g = toy_grammar()
        fitted, _ = g.fit_em([(0, 1), (1, 0)], max_iterations=5)
        assert fitted.binary[0, 1, 0] == 0.0
        assert fitted.binary[1, 0, 0] == 0.0
