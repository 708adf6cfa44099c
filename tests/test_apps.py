"""Surface smoke tests for the demo apps (reference: app.py:1-31,
example.py) — gradio is not installed in this image, so these pin the
import-safety and the callback signature/contract, not the web UI."""

import sys
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).parent.parent
sys.path.insert(0, str(ROOT))


class TestGradioApp:
    def test_import_without_gradio(self):
        """app.py must import cleanly when gradio is absent (reference
        crashes at import without it, app.py:1-5)."""
        import app
        # gradio absent in this image -> graceful None fallback
        assert hasattr(app, "gr")
        assert hasattr(app, "generate")

    def test_generate_callback_contract(self, rng):
        """The gradio callback takes (sr, int16-or-float wave) and returns
        (48000, int16) like the reference's handler (app.py:8-19) — pinned
        against a stub model so signature drift fails here, not in prod."""
        import app

        class Stub:
            def generate(self, wav, sr, target_sr=48000, timestep=1):
                assert wav.dtype == np.float32
                n_out = int(len(wav) * target_sr // sr)
                return np.full((1, n_out), 1.7, np.float32)  # tests clipping

        old = app.model
        app.model = Stub()
        try:
            wav = (rng.standard_normal(1600) * 10000).astype(np.int16)
            out_sr, out = app.generate((16000, wav), 48000, 1)
        finally:
            app.model = old
        assert out_sr == 48000
        assert out.dtype == np.int16
        assert out.shape == (4800,)
        assert out.max() == 32767  # clipped, int16-scaled

    def test_main_exits_without_gradio(self):
        """`python app.py` must exit with the CLI hint, not a traceback."""
        import subprocess
        r = subprocess.run([sys.executable, str(ROOT / "app.py")],
                           capture_output=True, text=True, timeout=120)
        if r.returncode == 0:
            pytest.skip("gradio installed in this environment")
        assert "gradio is not installed" in (r.stderr + r.stdout)


class TestFromPretrained:
    def test_hub_glue_with_mocked_hub(self, monkeypatch, tmp_path):
        """from_pretrained's hub glue (reference: flowhighsr.py:139-149) is
        unverifiable end-to-end offline (no egress), so pin the contract with
        a fake huggingface_hub: the published repo id, all four artifact
        filenames, and the from_local handoff on the download directory.
        The from_local/compat path itself is covered at full scale by
        tests/test_fullscale_parity.py and tests/test_lsd_battery.py."""
        import types

        from flowhigh_tpu import FlowHighSR

        requested = []

        def fake_download(repo_id, filename):
            assert repo_id == "ResembleAI/FlowHigh"
            requested.append(filename)
            p = tmp_path / filename
            p.write_bytes(b"")
            return str(p)

        fake = types.ModuleType("huggingface_hub")
        fake.hf_hub_download = fake_download
        monkeypatch.setitem(sys.modules, "huggingface_hub", fake)

        loaded = {}
        monkeypatch.setattr(
            FlowHighSR, "from_local",
            classmethod(lambda cls, d, *a, **k: loaded.setdefault("dir", Path(d))))

        FlowHighSR.from_pretrained()
        assert set(requested) == {
            "FLowHigh_basic_400k.json", "bigvgan_48khz_256band.json",
            "FLowHigh_basic_400k.pt", "bigvgan_48khz_256band.pt",
        }
        assert loaded["dir"] == tmp_path

    def test_helpful_error_without_hub(self, monkeypatch):
        """Offline images get an actionable message, not an ImportError.
        (None in sys.modules makes `import huggingface_hub` raise
        ImportError, per the import-system contract.)"""
        from flowhigh_tpu import FlowHighSR

        monkeypatch.setitem(sys.modules, "huggingface_hub", None)
        with pytest.raises(RuntimeError, match="from_local"):
            FlowHighSR.from_pretrained()


class TestExample:
    def test_example_parses_and_uses_current_api(self):
        """example.py is a top-level script like the reference's (it calls
        from_pretrained immediately, so it can't be imported offline);
        syntax-check it and pin the API surface it depends on."""
        src = (ROOT / "example.py").read_text()
        compile(src, "example.py", "exec")  # syntax
        from flowhigh_tpu import FlowHighSR
        for name in ("from_local", "from_pretrained", "generate"):
            assert name in src and hasattr(FlowHighSR, name)
