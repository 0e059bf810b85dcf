"""PRIME tests: property machinery units + a small pipeline smoke
(reference: SelectionAnalyses/PRIME.bf, MG_REV_PROPERTIES.bf)."""

import numpy as np
import pytest

from hyphy_tpu.data.genetic_code import AMINO_ACIDS, GeneticCode
from hyphy_tpu.methods import prime


class TestProperties:
    def test_atchley_complete(self):
        assert len(prime.ATCHLEY) == 5
        for name, vals in prime.ATCHLEY.items():
            assert sorted(vals) == sorted(AMINO_ACIDS), name

    def test_distance_tensors(self):
        gc = GeneticCode("Universal")
        d = prime.property_distance_tensors(gc)
        assert len(d) == 5
        s = gc.n_states
        for t in d:
            assert t.shape == (s, s)
            assert np.allclose(t, t.T)
            assert np.allclose(np.diag(t), 0.0)
        # synonymous pairs have zero property distance
        aa = gc.sense_amino_acids
        same = aa[:, None] == aa[None, :]
        for t in d:
            assert np.allclose(t[same], 0.0)

    def test_factor_v_charge_separates_d_and_k(self):
        gc = GeneticCode("Universal")
        d5 = prime.property_distance_tensors(gc)[4]
        aa = gc.sense_amino_acids
        i = int(np.nonzero(aa == AMINO_ACIDS.index("D"))[0][0])
        j = int(np.nonzero(aa == AMINO_ACIDS.index("K"))[0][0])
        assert abs(d5[i, j] - abs(-3.242 - 1.648)) < 1e-12


@pytest.mark.slow
class TestPipeline:
    def test_smoke(self, tmp_path):
        from hyphy_tpu.utils.synth import random_tree_newick, synthetic_codon_alignment

        aln = synthetic_codon_alignment(6, 25, seed=5)
        fa = tmp_path / "prime.fasta"
        fa.write_text(
            "".join(f">{n}\n{s}\n" for n, s in zip(aln.names, aln.sequences))
        )
        res = prime.run(str(fa), tree=random_tree_newick(6, seed=5))
        assert res.site_table.shape[1] == 3 + 3 * 5
        pv = res.site_table[:, [5 + 3 * k for k in range(5)]]
        assert ((pv >= 0) & (pv <= 1)).all()
