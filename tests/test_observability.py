"""Fast tier: optimizer trace/verbosity and branch-selector extensions."""

import json
import os

import numpy as np
import pytest


class TestBranchSelectors:
    @pytest.fixture(scope="class")
    def tree(self):
        from hyphy_tpu.tree.topology import Tree

        return Tree.from_newick("((a:0.1,b:0.2)N1:0.1,(c:0.1,d:0.1)N2:0.2,e:0.3)")

    def test_regex_selector(self, tree):
        mask = tree.select_branches("^N[0-9]$")
        assert [tree.names[b] for b in np.nonzero(mask)[0]] == ["N1", "N2"]

    def test_name_list_selector(self, tree):
        mask = tree.select_branches("a, c")
        assert sorted(tree.names[b] for b in np.nonzero(mask)[0]) == ["a", "c"]

    def test_regex_leaf_subset(self, tree):
        mask = tree.select_branches("^[ab]$")
        assert mask.sum() == 2

    def test_bad_selector_raises(self, tree):
        with pytest.raises(ValueError):
            tree.select_branches("no_such_label_xyz([")


class TestOptimizerTrace:
    def test_trace_file_written(self, tmp_path, monkeypatch):
        """HYPHY_TPU_OPT_LOG captures per-fit lnL trajectories
        (reference: PRODUCE_OPTIMIZATION_LOG, likefunc.cpp:4711)."""
        import jax.numpy as jnp

        from hyphy_tpu.models.parameters import ParamSpec
        from hyphy_tpu.optimize.core import maximize

        log = tmp_path / "opt.jsonl"
        monkeypatch.setenv("HYPHY_TPU_OPT_LOG", str(log))
        specs = {"x": ParamSpec(init=0.3, lower=0.0, upper=10.0)}
        p, v, it = maximize(
            lambda p: -((p["x"] - 2.0) ** 2), specs, {"x": jnp.asarray(0.3)}
        )
        assert float(p["x"]) == pytest.approx(2.0, abs=1e-4)
        lines = [json.loads(ln) for ln in log.read_text().splitlines()]
        assert len(lines) == 1
        entry = lines[0]
        assert entry["evaluations"] >= 2
        assert entry["parameters"]["x"] == pytest.approx(2.0, abs=1e-4)
        # trajectory is (lnL, max|grad|) pairs and improves
        assert entry["trajectory"][-1][0] >= entry["trajectory"][0][0]
