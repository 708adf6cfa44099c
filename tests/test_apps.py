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
