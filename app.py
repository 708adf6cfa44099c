"""Gradio web demo (reference: app.py:1-31). Degrades gracefully when gradio
is not installed (it is not baked into this image)."""

import numpy as np

from flowhigh_tpu import FlowHighSR

try:
    import gradio as gr
except ImportError:
    gr = None

model = None


def generate(audio, target_sr: int = 48000, timestep: int = 1):
    global model
    if model is None:
        model = FlowHighSR.from_pretrained(device=None)
    sr, wav = audio
    wav = np.asarray(wav, dtype=np.float32)
    out = model.generate(wav, sr, target_sr, timestep)
    return 48000, (np.clip(out[0], -1, 1) * 32767).astype(np.int16)


if __name__ == "__main__":
    if gr is None:
        raise SystemExit(
            "gradio is not installed; use `python -m flowhigh_tpu.cli infer` "
            "for file-to-file inference instead")
    demo = gr.Interface(
        fn=generate,
        inputs=[
            gr.Audio(label="Low-resolution audio"),
            gr.Radio([16000, 24000, 32000, 44100, 48000], value=48000,
                     label="Target sampling rate"),
            gr.Slider(1, 50, value=1, step=1, label="ODE timesteps"),
        ],
        outputs=gr.Audio(label="48 kHz output"),
        title="FLowHigh-TPU: audio super-resolution",
    )
    demo.launch()
