"""BUSTED-PH + error-filter on small synthetic fixtures, plus a
consistency check of the branch-flux machinery they depend on."""

import json
import os
import tempfile

import numpy as np
import pytest

import jax.numpy as jnp


def _fixture(seed=5, taxa=6, codons=40):
    from hyphy_tpu.utils.synth import random_tree_newick, synthetic_codon_alignment

    aln = synthetic_codon_alignment(taxa, codons, seed=seed)
    d = tempfile.mkdtemp()
    fa = os.path.join(d, "a.fasta")
    with open(fa, "w") as fh:
        for n, s in zip(aln.names, aln.sequences):
            fh.write(f">{n}\n{s}\n")
    tr = random_tree_newick(taxa, seed=seed)
    tr = tr.replace("t0:", "t0{Foreground}:").replace("t1:", "t1{Foreground}:")
    return d, fa, tr


def test_branch_flux_consistency():
    """Pinning a branch per class and re-mixing with the fitted weights
    must reproduce the standard site log-likelihoods exactly."""
    from hyphy_tpu.data.filter import DataFilter
    from hyphy_tpu.data.genetic_code import GeneticCode
    from hyphy_tpu.data.alignment import read_alignment
    from hyphy_tpu.models import frequencies as freq_mod
    from hyphy_tpu.models.bsrel import BSRELEngine
    from hyphy_tpu.models.codon import MG94Base
    from hyphy_tpu.ops import pruning
    from hyphy_tpu.tree.topology import Tree

    d, fa, tr = _fixture()
    aln = read_alignment(fa)
    gc = GeneticCode("Universal")
    filt = DataFilter.from_alignment(aln, "codon", genetic_code=gc)
    tree = Tree.from_newick(tr, leaf_order=filt.names)
    corners, codon_freqs = freq_mod.f3x4(filt, gc)
    mg94 = MG94Base(gc, corners, codon_freqs)
    pdata = pruning.build_pruning_data(tree)
    group = np.zeros(tree.n_branches, dtype=np.int32)
    engine = BSRELEngine(
        mg94, pdata, jnp.asarray(filt.leaf_partials()),
        filt.pattern_weights, group, srv_classes=2,
    )
    params = {f"theta_{p}": jnp.asarray(0.5) for p in ("AC", "AT", "CG", "CT", "GT")}
    omegas = jnp.asarray([[0.2, 1.0, 3.0]])
    weights = jnp.asarray([[0.6, 0.3, 0.1]])
    t_b = jnp.full((tree.n_branches,), 0.08)
    srv_rates = jnp.asarray([0.5, 1.5])
    srv_w = jnp.asarray([0.4, 0.6])

    sll_ref = np.asarray(engine.site_log_likelihoods(
        params, omegas, weights, t_b, srv_rates, srv_w
    ))
    branch_ids = np.asarray([0, 3, tree.n_leaves])  # two leaves + an internal
    sll_bk = engine.branch_class_site_logliks(
        params, omegas, weights, t_b, srv_rates, srv_w,
        tree.children, branch_ids,
    )
    # mixture over classes with the fitted weights == full model
    logw = jnp.log(weights[0])
    remixed = np.asarray(
        jnp.asarray([
            jnp.logaddexp.reduce(sll_bk[i] + logw[:, None], axis=0)
            for i in range(len(branch_ids))
        ])
    )
    for i in range(len(branch_ids)):
        np.testing.assert_allclose(remixed[i], sll_ref, rtol=0, atol=1e-8)


@pytest.mark.slow
def test_bustedph_and_error_filter():
    from hyphy_tpu.methods import busted, bustedph, error_filter

    d, fa, tr = _fixture()
    res = busted.run(fa, tree=tr, branches="Foreground", srv=False,
                     starting_points=2, error_sink=True, precision=1e-3)
    assert "branch attributes" in res.json
    assert "substitutions" in res.json
    jp = os.path.join(d, "busted_e.json")
    with open(jp, "w") as fh:
        json.dump(res.json, fh)
    ef = error_filter.run(jp, output=os.path.join(d, "masked.fasta"),
                          output_json=os.path.join(d, "ef.json"),
                          threshold=2.0, ratio=1.0)
    # masked sequences keep full length; masked cells recorded consistently
    n_sites = res.json["input"]["number of sites"]
    for s, seq in ef.sequences.items():
        assert len(seq) == 3 * n_sites
    assert ef.total_masked == sum(len(v) for v in ef.masked_sites.values())

    r2 = bustedph.run(fa, tree=tr, branches="Foreground", srv=False,
                      starting_points=2, precision=1e-3)
    ph = r2.json["BUSTED-PH"]
    pv = ph["uncorrected P-values for each test"]
    for key in ("FG", "BG", "Comparative"):
        assert 0.0 <= pv[key] <= 1.0
    assert "Summary" in ph


@pytest.mark.slow
def test_clade_support_from_bustedph():
    from hyphy_tpu.methods import bustedph, clade_support

    d, fa, tr = _fixture()
    r = bustedph.run(fa, tree=tr, branches="Foreground", srv=False,
                     starting_points=2, precision=1e-3)
    jp = os.path.join(d, "ph.json")
    with open(jp, "w") as fh:
        json.dump(r.json, fh)
    cs = clade_support.run(jp, output_json=os.path.join(d, "ecb.json"))
    assert "0" in cs.perplexity
    part = cs.json["0"]
    assert part["perplexity"] >= 1.0 - 1e-9
    w = sum(part["weights"].values())
    assert abs(w - 1.0) < 1e-9 or len(part["weights"]) == 0
