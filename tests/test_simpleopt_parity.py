"""Parity tests against the reference's timed optimizer fixtures
(``tests/hbltests/SimpleOptimizations/*.bf`` — the de-facto benchmarks,
SURVEY §6).  Each fixture pins a model + data + golden lnL; our fit must
reach the same optimum or better (the reference asserts
|lnL - golden| < k * OPTIMIZATION_PRECISION; we additionally allow
*exceeding* the golden, which this optimizer does on IntermediateNuc).

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
        assert res.loglik > -3189.516375 - 0.002, res.loglik


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
        assert res.loglik > -11389.4543728884 - 0.01, res.loglik


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
        assert res.loglik > -6989.162651149 - 0.005, res.loglik


@pytest.mark.slow
class TestIntermediateCodon:
    """MG94xREV (F3x4) on Influenza A HA codons, 349 seq
    (IntermediateCodon.bf:4 golden lnL -11402.1903626064)."""

    def test_lnl(self):
        _require(SIMPLE / "IntermediateCodon.bf")
        gc = GeneticCode("Universal")
        aln = ht.read_alignment(str(REFERENCE_DATA / "data" / "fluHA.nex"))
        filt = ht.DataFilter.from_alignment(aln, "codon", genetic_code=gc)
        tree = ht.Tree.from_newick(
            list(aln.trees.values())[0], leaf_order=filt.names
        )
        corners, cf = fq.f3x4(filt, gc)
        nb = tree.n_branches
        model = MG94xREVPartitionedOmega(
            gc, corners, cf, nuc_lengths=np.full(nb, 0.05),
            branch_groups=np.zeros(nb, dtype=np.int32), n_groups=1,
            free_lengths=True,
        )
        lf = LikelihoodFunction([Partition(filt, tree, model)])
        res = lf.fit(precision=1e-3)
        assert res.loglik > -11402.1903626064 - 0.05, res.loglik
