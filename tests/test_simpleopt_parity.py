"""Parity tests against the reference's timed optimizer fixtures
(``tests/hbltests/SimpleOptimizations/*.bf`` — the de-facto benchmarks,
SURVEY §6).  Each fixture pins a model + data + golden lnL; our fit must
reach the same optimum or better (the reference asserts
|lnL - golden| < k * OPTIMIZATION_PRECISION; bands here are two-sided
so a model mis-specification inflating lnL cannot pass as "better than
golden" — with a wider upside on IntermediateNuc, where this optimizer
genuinely exceeds the reference's optimum).

Data/trees are read from the reference checkout's fixture files; frequency
vectors pinned inside the fixtures are pinned here too.
"""

import re

import numpy as np
import pytest

import hyphy_tpu as ht
from hyphy_tpu.data.genetic_code import GeneticCode
from hyphy_tpu.likelihood import LikelihoodFunction, Partition
from hyphy_tpu.models import frequencies as fq
from hyphy_tpu.models.codon import MG94xREVPartitionedOmega
from hyphy_tpu.models.dna import HKY85
from hyphy_tpu.models.protein import EmpiricalProtein

from conftest import REFERENCE_DATA

SIMPLE = REFERENCE_DATA / "SimpleOptimizations"


def _require(path):
    if not path.exists():
        pytest.skip(f"reference fixture {path} not mounted")
    return str(path)


class TestSmallCodon:
    """MG94x012232 on HIV-1 RT, 8 seq x 440 codons
    (SmallCodon.bf:37 golden lnL -3189.516375)."""

    def test_lnl(self):
        path = _require(SIMPLE / "SmallCodon.bf")
        gc = GeneticCode("Universal")
        aln = ht.read_alignment(path)
        filt = ht.DataFilter.from_alignment(aln, "codon", genetic_code=gc)
        tree = ht.Tree.from_newick(aln.trees["tree"], leaf_order=filt.names)
        corners, cf = fq.f3x4(filt, gc)
        # fixture's embedded vectorOfFrequencies[0] — checks F3x4 parity
        assert abs(cf[0] - 0.0684634387476) < 1e-10
        nb = tree.n_branches
        model = MG94xREVPartitionedOmega(
            gc, corners, cf, nuc_lengths=np.full(nb, 0.1),
            branch_groups=np.zeros(nb, dtype=np.int32), n_groups=1,
            free_lengths=True, theta_classes="012232",
        )
        lf = LikelihoodFunction([Partition(filt, tree, model)])
        res = lf.fit(precision=1e-5)
        assert abs(res.loglik - -3189.516375) < 0.02, res.loglik


class TestIntermediateNuc:
    """HKY85 on Influenza A HA, 349 seq x 967 nt
    (IntermediateNuc.bf:4 golden lnL -11389.4543728884).  This optimizer
    finds a *better* optimum than the reference's (-11388.94)."""

    def test_lnl(self):
        _require(SIMPLE / "IntermediateNuc.bf")
        aln = ht.read_alignment(str(REFERENCE_DATA / "data" / "fluHA.nex"))
        filt = ht.DataFilter.from_alignment(aln, "nucleotide")
        tree = ht.Tree.from_newick(
            list(aln.trees.values())[0], leaf_order=filt.names
        )
        # fixture-pinned frequencies (IntermediateNuc.bf:28-33)
        freqs = np.array(
            [0.321488786102, 0.221264478507, 0.225765445963, 0.231481289428]
        )
        lf = LikelihoodFunction([Partition(filt, tree, HKY85(freqs))])
        res = lf.fit(precision=1e-3)
        # our optimizer finds a genuinely better optimum (~+0.5 lnL); the upper
        # band stays bounded at ~1e-4 relative so an inflated-likelihood bug
        # cannot hide behind 'better than golden'
        assert -11389.4543728884 - 0.01 < res.loglik < -11389.4543728884 + 1.5, res.loglik


class TestIntermediateProtein:
    """JTT on Influenza A, 349 seq x 329 aa
    (IntermediateProtein.bf:378 golden lnL -6989.162651149, tolerance
    5 x precision)."""

    def test_lnl(self):
        path = _require(SIMPLE / "IntermediateProtein.bf")
        src = open(path).read()
        tree_str = re.search(r"Tree IntermediateCodon_tree=([^;]+);", src).group(1)
        fm = re.search(
            r"IntermediateCodon_AA_part_Freqs=\{(.*?)\}\s*;", src, re.S
        ).group(1)
        freqs = np.array(
            [float(x) for x in re.findall(r"\{\s*([0-9.eE+-]+)\s*\}", fm)]
        )
        aln = ht.read_alignment(path)
        filt = ht.DataFilter.from_alignment(aln, "protein")
        tree = ht.Tree.from_newick(tree_str, leaf_order=filt.names)
        lf = LikelihoodFunction(
            [Partition(filt, tree, EmpiricalProtein("JTT", frequencies=freqs))]
        )
        res = lf.fit(precision=1e-3)
        assert abs(res.loglik - -6989.162651149) < 0.05, res.loglik


@pytest.mark.slow
class TestIntermediateCodon:
    """MG94xREV on Influenza A HA codons, 349 seq, with the fixture's
    embedded frequency multipliers.

    The .bf pins ``_expectedLL = -11402.19``, but that constant is STALE:
    the current reference binary built from this checkout converges to
    -9705.862143 on its own fixture (and fails its own assertion) — the
    data handling changed since the golden was recorded (stop-containing
    columns are now omitted, _DataSetFilter::FilterDeletions).  We assert
    parity with the *measured* reference optimum, which this optimizer
    beats by ~0.04 nats."""

    REFERENCE_MEASURED_LNL = -9705.862143

    def test_lnl(self):
        path = _require(SIMPLE / "IntermediateCodon.bf")
        src = open(path).read()
        gc = GeneticCode("Universal")
        # reconstruct the fixture's (stale, HIV-derived) corner frequencies
        # from its Q-entry multipliers, and its codon frequency vector
        tbl = gc.one_step_table
        corners = np.full((4, 3), np.nan)
        for m in re.finditer(
            r"LargeNuc_part_MG94xREV_3x4\[(\d+)\]\[(\d+)\]:="
            r"[^;]*synRate\*([0-9.]+);", src
        ):
            i, j, mult = int(m.group(1)), int(m.group(2)), float(m.group(3))
            pr = np.nonzero((tbl["pairs"][:, 0] == i) & (tbl["pairs"][:, 1] == j))[0]
            if len(pr):
                k = pr[0]
                corners[tbl["to_nuc"][k], tbl["position"][k]] = mult
        assert not np.isnan(corners).any()
        fm = re.search(r"LargeNuc_part_Freqs=\{(.*?)\}\s*;", src, re.S).group(1)
        freqs = np.array(
            [float(x) for x in re.findall(r"\{\s*([0-9.eE+-]+)\s*\}", fm)]
        )
        aln = ht.read_alignment(str(REFERENCE_DATA / "data" / "fluHA.nex"))
        filt = ht.DataFilter.from_alignment(aln, "codon", genetic_code=gc)
        tree = ht.Tree.from_newick(
            list(aln.trees.values())[0], leaf_order=filt.names
        )
        nb = tree.n_branches
        model = MG94xREVPartitionedOmega(
            gc, corners, freqs, nuc_lengths=np.full(nb, 0.05),
            branch_groups=np.zeros(nb, dtype=np.int32), n_groups=1,
            free_lengths=True,
        )
        lf = LikelihoodFunction([Partition(filt, tree, model)])
        res = lf.fit(precision=1e-3)
        assert abs(res.loglik - self.REFERENCE_MEASURED_LNL) < 0.5, res.loglik


@pytest.mark.slow
class TestLargeNuc:
    """GTR on HIV RT, 3112 seq x 873 nt with fixture-pinned frequencies
    (LargeNuc.bf:3142 golden lnL -238640.66 +- 0.01)."""

    def test_lnl(self):
        path = _require(SIMPLE / "LargeNuc.bf")
        src = open(path).read()
        m = re.search(r"Tree givenTree=([^;]+);", src)
        tree_str = m.group(1)
        fm = re.search(r"overallFrequencies=\{(.*?)\}\s*;", src, re.S).group(1)
        freqs = np.array(
            [float(x) for x in re.findall(r"\{\s*([0-9.eE+-]+)\s*\}", fm)]
        )
        aln = ht.read_alignment(path)
        filt = ht.DataFilter.from_alignment(aln, "nucleotide")
        tree = ht.Tree.from_newick(tree_str, leaf_order=filt.names)
        from hyphy_tpu.models.dna import GTR

        lf = LikelihoodFunction([Partition(filt, tree, GTR(freqs))])
        res = lf.fit(precision=1e-3)
        # ours exceeds the reference optimum by ~5.7 lnL on this 3112-taxon
        # fixture (2.4e-5 relative); band is two-sided at 1e-4 relative
        assert -238640.66 - 0.5 < res.loglik < -238640.66 + 24.0, res.loglik
