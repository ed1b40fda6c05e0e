"""Auto-router calibration persistence (VERDICT round-4 item 5).

``runtime._auto_calibration`` layers, per key: env var > measured
calibration file > built-in v5e default. bench.py / tools/calibrate.py
write the file so on a fresh host the router's constants come from a
measured artifact without any env setup.
"""

import json

from lzma_rs_tpu.parallel import runtime


class TestCalibration:
    def test_defaults_without_file(self, monkeypatch, tmp_path):
        monkeypatch.setenv(
            "LZMA_RS_TPU_CAL_FILE", str(tmp_path / "missing.json")
        )
        for _, env, _ in runtime._CAL_KEYS:
            monkeypatch.delenv(env, raising=False)
        cal = runtime._auto_calibration()
        assert cal["native_mbs"] == 120.0
        assert cal["step_b"] == 0.000191

    def test_file_beats_default(self, monkeypatch, tmp_path):
        path = tmp_path / "cal.json"
        path.write_text(json.dumps({"native_mbs": 333.0, "link_mbs": 9.0}))
        monkeypatch.setenv("LZMA_RS_TPU_CAL_FILE", str(path))
        for _, env, _ in runtime._CAL_KEYS:
            monkeypatch.delenv(env, raising=False)
        cal = runtime._auto_calibration()
        assert cal["native_mbs"] == 333.0
        assert cal["link_mbs"] == 9.0
        assert cal["step_a"] == 5.4  # unmeasured key falls to default

    def test_env_beats_file(self, monkeypatch, tmp_path):
        path = tmp_path / "cal.json"
        path.write_text(json.dumps({"native_mbs": 333.0}))
        monkeypatch.setenv("LZMA_RS_TPU_CAL_FILE", str(path))
        monkeypatch.setenv("LZMA_RS_TPU_CAL_NATIVE_MBS", "77")
        cal = runtime._auto_calibration()
        assert cal["native_mbs"] == 77.0

    def test_write_calibration_merges(self, monkeypatch, tmp_path):
        path = tmp_path / "cal.json"
        monkeypatch.setenv("LZMA_RS_TPU_CAL_FILE", str(path))
        runtime.write_calibration(native_mbs=100.0)
        runtime.write_calibration(link_mbs=20.0)
        vals = json.loads(path.read_text())
        assert vals == {"native_mbs": 100.0, "link_mbs": 20.0}

    def test_router_uses_written_calibration(self, monkeypatch, tmp_path):
        # a measured file claiming an absurdly fast native engine must
        # push the model toward the host path
        path = tmp_path / "cal.json"
        monkeypatch.setenv("LZMA_RS_TPU_CAL_FILE", str(path))
        for _, env, _ in runtime._CAL_KEYS:
            monkeypatch.delenv(env, raising=False)
        runtime.write_calibration(native_mbs=1e9)
        cal = runtime._auto_calibration()
        assert cal["native_mbs"] == 1e9
