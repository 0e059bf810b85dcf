"""General constraint surface (ReplicateConstraint / MolecularClock
analogues) + the simulate user surface (SimulateDataSet)."""

import numpy as np
import pytest

N_TAXA, N_CODONS, SEED = 6, 24, 5


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    from hyphy_tpu.utils.synth import random_tree_newick, synthetic_codon_alignment

    aln = synthetic_codon_alignment(N_TAXA, N_CODONS, seed=SEED)
    d = tmp_path_factory.mktemp("constr")
    fa = d / "tiny.fasta"
    fa.write_text("".join(f">{n}\n{s}\n" for n, s in zip(aln.names, aln.sequences)))
    return {"fasta": str(fa), "tree": random_tree_newick(N_TAXA, seed=SEED),
            "dir": d}


def _gtr_lf(tiny):
    import hyphy_tpu as ht
    from hyphy_tpu.likelihood import LikelihoodFunction, Partition
    from hyphy_tpu.models.dna import GTR

    aln = ht.read_alignment(tiny["fasta"])
    filt = ht.DataFilter.from_alignment(aln, "nucleotide")
    tree = ht.Tree.from_newick(tiny["tree"], leaf_order=filt.names)
    model = GTR(filt.harvest_frequencies(1, 1, False)[:, 0])
    return LikelihoodFunction([Partition(filt, tree, model)]), tree


def test_proportional_constraint(tiny):
    from hyphy_tpu.models.constraints import Proportional

    lf, _ = _gtr_lf(tiny)
    free = lf.fit(precision=1e-4)
    con = Proportional("theta_AC", "theta_AT", ratio_key="R")
    res = lf.fit(precision=1e-4, constraints=[con])
    # the dependent parameter is exactly ratio * source
    assert np.isclose(
        float(res.params["theta_AC"]),
        float(res.params["R"]) * float(res.params["theta_AT"]),
    )
    # nested: same free-parameter count (R replaces theta_AC), so the
    # optimum can only match the unconstrained one up to optimizer noise
    assert res.n_free_parameters == free.n_free_parameters
    assert res.loglik <= free.loglik + 1e-3


def test_proportional_fixed_ratio(tiny):
    from hyphy_tpu.models.constraints import Proportional

    lf, _ = _gtr_lf(tiny)
    free = lf.fit(precision=1e-4)
    con = Proportional("theta_AC", "theta_AT", ratio=1.0)
    res = lf.fit(precision=1e-4, constraints=[con])
    assert res.n_free_parameters == free.n_free_parameters - 1
    assert float(res.params["theta_AC"]) == pytest.approx(
        float(res.params["theta_AT"])
    )
    assert res.loglik <= free.loglik + 1e-3


def test_molecular_clock(tiny):
    from hyphy_tpu.models.constraints import MolecularClock

    lf, tree = _gtr_lf(tiny)
    free = lf.fit(precision=1e-4)
    clock = MolecularClock(tree, target="t")
    res = lf.fit(precision=1e-4, constraints=[clock])
    t = np.asarray(res.params["t"])
    assert (t >= 0).all()
    # every root-to-tip path sums to the root height
    parent = np.asarray(tree.parent)
    for leaf in range(tree.n_leaves):
        total, nd = 0.0, leaf
        while nd != tree.root:
            total += t[nd]
            nd = parent[nd]
        assert total == pytest.approx(float(res.params["t_clock_height"]),
                                      rel=1e-6)
    # clock is nested in the free model
    assert res.loglik <= free.loglik + 1e-3
    assert res.n_free_parameters < free.n_free_parameters


def test_simulate_roundtrip(tiny):
    from hyphy_tpu.methods import simulate

    out = str(tiny["dir"] / "sim_out")
    r = simulate.run(tiny["fasta"], tree=tiny["tree"], replicates=2,
                     sites=30, seed=1, output=out)
    assert len(r.files) == 2
    import hyphy_tpu as ht

    for f in r.files:
        sim = ht.read_alignment(f)
        assert len(sim.names) == N_TAXA
        assert len(sim.sequences[0]) == 30 * 3
    assert r.json["settings"]["replicates"] == 2
