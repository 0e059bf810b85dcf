"""RELAX group mode and aBSREL synonymous-rate variation on small
synthetic fixtures."""

import os
import tempfile

import numpy as np
import pytest


def _fixture(seed=7, taxa=6, codons=30):
    from hyphy_tpu.utils.synth import random_tree_newick, synthetic_codon_alignment

    aln = synthetic_codon_alignment(taxa, codons, seed=seed)
    d = tempfile.mkdtemp()
    fa = os.path.join(d, "a.fasta")
    with open(fa, "w") as fh:
        for n, s in zip(aln.names, aln.sequences):
            fh.write(f">{n}\n{s}\n")
    return fa, random_tree_newick(taxa, seed=seed)


def test_unlabeled_selector():
    from hyphy_tpu.tree.topology import Tree

    _, tr = _fixture()
    tr = tr.replace("t0:", "t0{G1}:")
    t = Tree.from_newick(tr)
    un = t.select_branches("Unlabeled")
    g1 = t.select_branches("G1")
    assert g1.sum() == 1
    assert un.sum() == t.n_branches - 1
    assert not (un & g1).any()


@pytest.mark.slow
def test_relax_group_mode():
    from hyphy_tpu.methods import relax

    fa, tr = _fixture()
    tr3 = (tr.replace("t0:", "t0{G1}:").replace("t1:", "t1{G1}:")
             .replace("t2:", "t2{G2}:").replace("t3:", "t3{G2}:"))
    r = relax.run(fa, tree=tr3, reference="Unlabeled",
                  groups=["G1", "G2", "Unlabeled"], rate_classes=2,
                  precision=1e-3)
    res = r.json["test results"]
    assert res["degrees of freedom"] == 2
    assert 0.0 <= res["p-value"] <= 1.0
    ks = res["relaxation or intensification parameter"]
    assert set(ks) == {"G1", "G2"}
    # alternative must dominate the all-K=1 null
    assert r.fits["RELAX alternative"] >= r.fits["RELAX null"] - 1e-6


@pytest.mark.slow
def test_absrel_srv():
    from hyphy_tpu.methods import absrel

    fa, tr = _fixture()
    r = absrel.run(fa, tree=tr, srv=True, srv_classes=2, precision=1e-3)
    rates = r.json["Synonymous site-to-site rates"]
    assert len(rates) == 2
    w = sum(x[1] for x in rates)
    assert abs(w - 1.0) < 1e-6
    # unit-mean constraint on the GDD rates
    mean = sum(x[0] * x[1] for x in rates)
    assert abs(mean - 1.0) < 1e-6
    post = np.asarray(r.json["Synonymous site-posteriors"])
    assert post.shape[0] == 2
    np.testing.assert_allclose(post.sum(axis=0), 1.0, atol=1e-8)
