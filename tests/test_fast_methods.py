"""Fast tier: every analysis method smoke-run on a tiny synthetic fixture
(6 taxa x 20 codons).  Asserts structural invariants — finite likelihoods,
p-values in range, JSON schema keys — not golden values; the full CD2
golden tier lives in the per-method modules behind HYPHY_TPU_RUN_SLOW=1
(reference test-strategy split, SURVEY.md section 4)."""

import numpy as np
import pytest

N_TAXA, N_CODONS, SEED = 6, 20, 11


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    from hyphy_tpu.utils.synth import random_tree_newick, synthetic_codon_alignment

    aln = synthetic_codon_alignment(N_TAXA, N_CODONS, seed=SEED)
    d = tmp_path_factory.mktemp("tiny")
    fa = d / "tiny.fasta"
    fa.write_text("".join(f">{n}\n{s}\n" for n, s in zip(aln.names, aln.sequences)))
    tree = random_tree_newick(N_TAXA, seed=SEED)
    labeled = tree.replace("t1:", "t1{T1}:").replace("t2:", "t2{T1}:")
    return {"fasta": str(fa), "tree": tree, "labeled_tree": labeled, "dir": d}


def _pcol(result, name):
    names = [h[0] for h in result.json["MLE"]["headers"]]
    tab = np.asarray(result.json["MLE"]["content"]["0"])
    return tab[:, names.index(name)]


class TestSiteMethodsFast:
    def test_fel(self, tiny):
        from hyphy_tpu.methods import fel

        r = fel.run(tiny["fasta"], tree=tiny["tree"])
        assert np.isfinite(r.site_table).all()
        p = _pcol(r, "p-value")
        assert ((p >= 0) & (p <= 1)).all()

    def test_fel_multihit_global(self, tiny):
        from hyphy_tpu.methods import fel

        r = fel.run(tiny["fasta"], tree=tiny["tree"], srv=False,
                    multiple_hits="Double", site_multihit="Global")
        assert "2H rate" in [h[0] for h in r.headers]
        assert np.isfinite(r.site_table).all()

    def test_slac(self, tiny):
        from hyphy_tpu.methods import slac

        r = slac.run(tiny["fasta"], tree=tiny["tree"])
        assert "0" in r.json["MLE"]["content"]
        av = np.asarray(r.json["MLE"]["content"]["0"]["by-site"]["AVERAGED"])
        assert av.shape[0] == N_CODONS

    def test_meme_three_classes(self, tiny):
        from hyphy_tpu.methods import meme

        r = meme.run(tiny["fasta"], tree=tiny["tree"], rate_classes=3)
        assert r.site_table.shape == (N_CODONS, 16)   # 10 + 2K columns
        p = _pcol(r, "p-value")
        assert ((p >= 0) & (p <= 1.0001)).all()

    def test_fubar(self, tiny):
        from hyphy_tpu.methods import fubar

        r = fubar.run(tiny["fasta"], tree=tiny["tree"], grid_points=5)
        assert np.isfinite(np.asarray(r.json["MLE"]["content"]["0"])).all()

    def test_bstill(self, tiny):
        from hyphy_tpu.methods import bstill

        r = bstill.run(tiny["fasta"], tree=tiny["tree"], grid_points=5)
        st = r.site_table
        assert st.shape == (N_CODONS, 14)
        assert np.isfinite(st).all()
        # grid is denser near zero than FUBAR's and contains exact 0
        g = r.grid
        assert ((g[:, 0] == 0) & (g[:, 1] == 0)).sum() == 1
        one_d = np.unique(g[:, 0])
        assert one_d[1] < 0.2  # quadratic spacing: second point near 0
        # posterior masses are probabilities; mixing the 4 stencil masses
        # stays within [0, 1]
        for c in (2, 3, 4, 5, 6):
            assert ((st[:, c] >= -1e-9) & (st[:, c] <= 1 + 1e-9)).all()
        # P[inv] <= P[a0] and <= P[b0] (inv stencil is their intersection)
        assert (st[:, 2] <= st[:, 3] + 1e-12).all()
        assert (st[:, 2] <= st[:, 4] + 1e-12).all()
        # EBF columns are consistent with their posterior columns
        assert (st[st[:, 12] >= 10.0, 5] > 0.1).all()
        names = [h[0] for h in r.json["MLE"]["headers"]]
        assert names[12] == "EBF[alpha,beta~0]"

    def test_bstill_non_zero_grid(self, tiny):
        from hyphy_tpu.methods.bstill import bstill_grid

        g = bstill_grid(5, non_zero=True)
        assert g[:, 0].min() >= 1e-3
        g0 = bstill_grid(20, non_zero=False)
        # reference grid shape: 70% of 1-D points quadratic in [0,1]
        one_d = np.unique(g0[:, 0])
        assert len(one_d) == 20 and one_d[0] == 0.0
        neg = 14
        assert np.allclose(one_d[:neg], (np.arange(neg) / (neg - 1)) ** 2)
        assert one_d[-1] > 49.0

    def test_contrast_fel(self, tiny):
        from hyphy_tpu.methods import contrast_fel

        r = contrast_fel.run(tiny["fasta"], tree=tiny["labeled_tree"])
        assert "background" in r.group_names
        assert np.isfinite(r.site_table).all()

    def test_contrast_meme(self, tiny):
        from hyphy_tpu.methods import contrast_meme

        r = contrast_meme.run(tiny["fasta"], tree=tiny["labeled_tree"])
        names = [h[0] for h in r.headers]
        assert "P-value (overall)" in names and "Permutation p-value" in names
        p = _pcol(r, "P-value (overall)")
        assert ((p >= 0) & (p <= 1)).all()


class TestGeneMethodsFast:
    def test_busted(self, tiny):
        from hyphy_tpu.methods import busted

        r = busted.run(tiny["fasta"], tree=tiny["tree"], srv=False,
                       rate_classes=2, starting_points=1, precision=1e-3)
        assert np.isfinite(r.unconstrained_lnl)
        assert 0.0 <= r.p_value <= 1.0

    def test_absrel(self, tiny):
        from hyphy_tpu.methods import absrel

        # coarse precision: this tier asserts structure, not optima —
        # the aBSREL step-up at default precision was the default tier's
        # single largest cost (VERDICT r3)
        r = absrel.run(tiny["fasta"], tree=tiny["tree"], precision=1e-2)
        assert np.isfinite(r.full_lnl)
        assert r.json["test results"]["tested"] >= 1

    def test_relax_minimal(self, tiny):
        from hyphy_tpu.methods import relax

        r = relax.run(tiny["fasta"], tree=tiny["labeled_tree"], test="T1",
                      reference=None, rate_classes=2, models="Minimal",
                      precision=1e-3)
        assert np.isfinite(r.json["test results"]["LRT"])
        assert 0.0 <= r.json["test results"]["p-value"] <= 1.0

    def test_fmm(self, tiny):
        from hyphy_tpu.methods import fmm

        r = fmm.run(tiny["fasta"], tree=tiny["tree"], precision=1e-2)
        fits = r.json["fits"]
        assert any("riple" in k or "ouble" in k for k in fits)


class TestOtherDataTypesFast:
    def test_leisr(self, tiny):
        from hyphy_tpu.methods import leisr

        r = leisr.run(tiny["fasta"], datatype="nucleotide", model="GTR",
                      tree=tiny["tree"])
        tab = np.asarray(r.json["MLE"]["content"]["0"])
        assert np.isfinite(tab).all()

    def test_prime(self, tiny):
        from hyphy_tpu.methods import prime

        r = prime.run(tiny["fasta"], tree=tiny["tree"], precision=1e-2)
        assert np.isfinite(r.site_table).all()
