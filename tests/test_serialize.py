"""LF snapshot (SerializeLF-equivalent) tests — save/restore of fitted
state with data fingerprinting (reference: likefunc.cpp:11786 SerializeLF;
BUSTED --save-fit semantics, BUSTED.bf:680-733)."""

import numpy as np

from hyphy_tpu.io import serialize


class TestSnapshot:
    def test_roundtrip(self, tmp_path):
        path = str(tmp_path / "fit.json")
        params = {"theta_AC": np.asarray(0.5), "t": np.arange(4.0)}
        fp = serialize.data_fingerprint(["a", "b"], ["ACGT", "ACGA"])
        serialize.save_snapshot(
            path, params, -1234.5, model="BUSTED",
            model_config={"rate_classes": 3}, tree="(a,b);", fingerprint=fp,
        )
        snap = serialize.load_snapshot(path, expect_fingerprint=fp,
                                       expect_model="BUSTED")
        assert snap is not None
        assert snap["log_likelihood"] == -1234.5
        assert np.allclose(snap["parameters"]["t"], np.arange(4.0))
        assert float(snap["parameters"]["theta_AC"]) == 0.5
        assert snap["model_config"]["rate_classes"] == 3

    def test_stale_data_rejected(self, tmp_path):
        path = str(tmp_path / "fit.json")
        fp1 = serialize.data_fingerprint(["a"], ["ACGT"])
        fp2 = serialize.data_fingerprint(["a"], ["ACGA"])
        assert fp1 != fp2
        serialize.save_snapshot(path, {}, -1.0, model="BUSTED", fingerprint=fp1)
        assert serialize.load_snapshot(path, expect_fingerprint=fp2) is None
        assert serialize.load_snapshot(path, expect_fingerprint=fp1) is not None

    def test_wrong_model_rejected(self, tmp_path):
        path = str(tmp_path / "fit.json")
        serialize.save_snapshot(path, {}, -1.0, model="BUSTED")
        assert serialize.load_snapshot(path, expect_model="RELAX") is None

    def test_missing_and_corrupt(self, tmp_path):
        assert serialize.load_snapshot(str(tmp_path / "nope.json")) is None
        bad = tmp_path / "bad.json"
        bad.write_text("{not json")
        assert serialize.load_snapshot(str(bad)) is None
